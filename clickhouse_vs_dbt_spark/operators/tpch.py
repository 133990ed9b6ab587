"""Adapted TPC-H query flight over the driver's TPC-H-ish tables.

The reference's benchmark surface is SSB — itself a denormalized
derivative of TPC-H (SURVEY.md §2.2) — so the natural widening of the
query inventory is the classic TPC-H flight re-expressed over the
driver fixtures' normalized schema (TESTDATA.md).  The fixture tables
omit a few classic columns (no ``l_commitdate``/``l_receiptdate``, no
``o_shippriority``, no ``l_shipmode``/``p_container``, no partsupp), so
each query keeps its canonical *shape* (the join graph, the aggregate
pattern, the predicate structure) with predicates adapted to the
available columns; the docstrings note each adaptation.

Scale notes (recurring; see SCALING.md):

* Every money aggregate is decimal-exact (operators/common.py) — the
  answer is independent of partitioning, so it survives re-planning at
  any cluster size, and the DuckDB oracle matches bit-for-bit.
* ``nation``/``region`` are broadcast explicitly (they are O(25) rows at
  any scale factor); ``customer``/``supplier``/``part`` are left to AQE,
  which broadcasts them while they fit and shuffle-joins beyond —
  hand-pinning those would be wrong at 100 TB.
* Top-k results (Q3/Q10/Q18) execute as TakeOrderedAndProject —
  per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.common import dsum, sql_dsum

def _net() -> F.Column:
    # module-level F.col() would crash without an active session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


SQL_NET = "l_extendedprice * (1 - l_discount)"


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): revenue of BUILDING-segment orders
    placed before / shipped after a date cut, top 10 by revenue.
    Adaptation: fixture orders has no ``o_shippriority``; the group key
    is (l_orderkey, o_orderdate).  Shape: fact ⋈ two filtered dims →
    grouped agg → top-k heap."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_date"))
        .agg(dsum(_net()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


O_TPCH_Q3 = f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
       {sql_dsum(SQL_NET)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders per priority having at
    least one "late" line.  Adaptation: no commit/receipt dates in the
    fixture, so "late" = shipped > 60 days after the order date.  Shape:
    EXISTS → left-semi join (no row duplication, the fact side never
    leaves the probe) → tiny grouped count."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


O_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation where the
    customer and supplier share a nation, restricted to one region and
    a two-year window.  The canonical 6-way star join; nation/region
    broadcast, the c⋈o⋈l spine shuffles on its keys, and the
    ``c_nationkey = s_nationkey`` locality predicate rides the supplier
    join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_net()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


O_TPCH_Q5 = f"""
SELECT n_name, {sql_dsum(SQL_NET)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): single filtered scalar
    aggregate — the purest pushdown test.  All three predicates reach
    the parquet scan (``PushedFilters``); the plan is scan → partial
    agg → one-row exchange → final agg."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


O_TPCH_Q6 = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top 20 customers by revenue
    lost to returns in one quarter, with their nation.  Shape: filtered
    fact ⋈ orders ⋈ customer ⋈ broadcast(nation) → grouped agg →
    top-k heap."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_net()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


O_TPCH_Q10 = f"""
SELECT c_custkey, c_name, n_name, {sql_dsum(SQL_NET)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): % of one month's revenue from
    promo parts.  Conditional aggregation over one join; ``part`` left
    to AQE (broadcast while it fits).  Adaptation: fixture ``p_type``
    is a plain category, so the promo predicate is equality, not
    LIKE 'PROMO%'."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", _net()).otherwise(F.lit(0.0)))
                / dsum(_net()),
                6,
            ).alias("promo_pct")
        )
    )


O_TPCH_Q14 = f"""
SELECT round(
  100.0 * {sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {SQL_NET} ELSE 0.0 END")}
        / {sql_dsum(SQL_NET)}, 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customers): orders whose total quantity
    exceeds a threshold, with customer context.  The HAVING runs on the
    grouped fact BEFORE the dimension joins — the surviving set is tiny,
    so the joins after it are broadcast-cheap at any scale."""
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("l_orderkey").asc())
    )


O_TPCH_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity')} > 250)
SELECT c_custkey, c_name, l_orderkey,
       CAST(o_orderdate AS DATE) AS o_date, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, l_orderkey ASC
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of three
    brand/size/quantity brackets — the classic OR-of-ANDs join predicate
    that tests predicate normalization.  Catalyst extracts the common
    ``l_partkey = p_partkey`` conjunct so the join stays a hash join
    with the brackets as a post-join filter (adaptation: brackets use
    brand/size/quantity; the fixture has no container or shipmode)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(dsum(_net()).alias("revenue"))
    )


O_TPCH_Q19 = f"""
SELECT {sql_dsum(SQL_NET)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
       AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""


QUERIES = {
    "tpch_q3_shipping_priority": q_tpch_q3,
    "tpch_q4_late_orders": q_tpch_q4,
    "tpch_q5_local_supplier_volume": q_tpch_q5,
    "tpch_q6_forecast_revenue": q_tpch_q6,
    "tpch_q10_returned_items": q_tpch_q10,
    "tpch_q14_promo_effect": q_tpch_q14,
    "tpch_q18_large_orders": q_tpch_q18,
    "tpch_q19_bracketed_revenue": q_tpch_q19,
}

ORACLES = {
    "tpch_q3_shipping_priority": O_TPCH_Q3,
    "tpch_q4_late_orders": O_TPCH_Q4,
    "tpch_q5_local_supplier_volume": O_TPCH_Q5,
    "tpch_q6_forecast_revenue": O_TPCH_Q6,
    "tpch_q10_returned_items": O_TPCH_Q10,
    "tpch_q14_promo_effect": O_TPCH_Q14,
    "tpch_q18_large_orders": O_TPCH_Q18,
    "tpch_q19_bracketed_revenue": O_TPCH_Q19,
}
