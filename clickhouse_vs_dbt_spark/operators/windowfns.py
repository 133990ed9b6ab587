"""Window-function breadth: value offsets, distribution functions,
rolling frames, time-range frames, and correlated LATERAL top-n.

The reference's SQL surface has no window functions at all (SURVEY.md
§2.2); ClickHouse gained the full ANSI window family and a drop-in
engine needs it.  Each query here exercises a family over a UNIQUE
``ORDER BY`` spec (date + key tiebreak) so every offset / distribution
value is deterministic under any partitioning — the precondition for
both cross-engine parity and cluster-size-independent results.

Scale shape: one keyed shuffle on the PARTITION BY column, then a
per-partition sort — Spark's ``Window`` never globally sorts.  The
LATERAL top-n decorrelates to exactly the same rank-filter plan, so
none of these break down when a customer's order history is large; no
frame here is unbounded-following over an unsorted input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table, register_views
from clickhouse_vs_dbt_spark.operators.common import DEC


def q_window_frame_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / nth_value / percent_rank / cume_dist
    plus a 3-row rolling sum, all over one per-customer sort.  A single
    window spec → a single exchange + sort feeds every function."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w.rowsBetween(-2, 0)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.first("o_totalprice").over(w).alias("first_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.sum(F.col("o_totalprice").cast(DEC)).over(w3).cast("double").alias("roll3_sum"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


O_WINDOW_FRAME_SUITE = """
SELECT o_custkey, o_orderkey,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_totalprice) OVER w AS first_price,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll3_sum
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


TRAIL_DAYS = 30


def q_window_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer, trailing-30-day spend at each order — a RANGE
    frame over the order date (ClickHouse ``RANGE BETWEEN 30
    PRECEDING``; the moving-aggregate shape behind every 'spend in the
    last N days' feature).  The frame is value-based, so tied dates
    contribute symmetrically in both engines regardless of sort order;
    the DECIMAL-cast sum keeps the answer order-free."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-TRAIL_DAYS, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("trail30_spend"),
            F.count(F.lit(1)).over(w).cast("long").alias("trail30_orders"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


O_WINDOW_TRAILING_30D = f"""
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS trail30_spend,
       CAST(COUNT(*) OVER w AS BIGINT) AS trail30_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN {TRAIL_DAYS} PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


LATERAL_TOP_K = 2


def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each AUTOMOBILE customer's top-2
    orders by price.  Catalyst decorrelates the per-row LIMIT into a
    rank-over-partition + filter — the plan a hand-written window query
    would produce, but expressed in the classic LATERAL form a
    ClickHouse/Postgres user would write."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(f"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT {LATERAL_TOP_K}) t
        WHERE c.c_mktsegment = 'AUTOMOBILE'
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """)


O_LATERAL_TOP_ORDERS = f"""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT {LATERAL_TOP_K}) t
WHERE c.c_mktsegment = 'AUTOMOBILE'
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


def q_ratio_to_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total reporting (``sum(x) OVER ()`` — ClickHouse's
    proportion-of-report idiom): revenue share of each nation within
    its region, and of the grand total.  The unpartitioned window runs
    over the *aggregated* relation (≤ |nation| rows), so the
    single-task global frame is over dozens of rows at any input scale
    — aggregate first, window the summary."""
    from clickhouse_vs_dbt_spark.operators.common import dsum

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    per_nation = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias("revenue"))
    )
    w_all = Window.partitionBy()
    w_reg = Window.partitionBy("r_name")
    return (
        per_nation.select(
            "r_name",
            "n_name",
            "revenue",
            F.round(
                F.col("revenue") / F.sum(F.col("revenue").cast(DEC)).over(w_reg).cast("double"),
                9,
            ).alias("share_of_region"),
            F.round(
                F.col("revenue") / F.sum(F.col("revenue").cast(DEC)).over(w_all).cast("double"),
                9,
            ).alias("share_of_total"),
        )
        .orderBy("r_name", "n_name")
    )


O_RATIO_TO_TOTAL = """
WITH per_nation AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
              AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name)
SELECT r_name, n_name, revenue,
       round(revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,6)))
             OVER (PARTITION BY r_name) AS DOUBLE), 9) AS share_of_region,
       round(revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,6)))
             OVER () AS DOUBLE), 9) AS share_of_total
FROM per_nation ORDER BY r_name, n_name
"""


QUERIES = {
    "window_frame_suite": q_window_frame_suite,
    "window_trailing_30d": q_window_trailing_30d,
    "lateral_top_orders": q_lateral_top_orders,
    "ratio_to_total": q_ratio_to_total,
}

ORACLES = {
    "window_frame_suite": O_WINDOW_FRAME_SUITE,
    "window_trailing_30d": O_WINDOW_TRAILING_30D,
    "lateral_top_orders": O_LATERAL_TOP_ORDERS,
    "ratio_to_total": O_RATIO_TO_TOTAL,
}
