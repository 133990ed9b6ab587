"""Adapted TPC-H query flight over the driver's TPC-H-ish tables.

The reference's benchmark surface is SSB — itself a denormalized
derivative of TPC-H (SURVEY.md §2.2) — so the natural widening of the
query inventory is the classic TPC-H flight re-expressed over the
driver fixtures' normalized schema (TESTDATA.md).  The fixture tables
omit a few classic columns (no ``l_commitdate``/``l_receiptdate``, no
``o_shippriority``, no ``l_shipmode``/``p_container``, no partsupp —
the five partsupp queries live in operators/tpch_ps.py over a derived
partsupp analog), so
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
from clickhouse_vs_dbt_spark.operators.common import davg, dsum, sql_davg, sql_dsum

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


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by ship year — the two-nation-pair disjunction over a
    5-way join.  Both nation joins are broadcast; the OR-of-pairs
    predicate rides the joined row, and Catalyst prunes nation rows to
    the two named nations before broadcasting."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    nations = ("NATION_1", "NATION_2")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("n1_key"))
        .join(n2, c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_net()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


O_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {sql_dsum(SQL_NET)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one supplier nation's share of
    STANDARD-part revenue sold into ASIA customers, per order year — a
    7-way join feeding a conditional-aggregate ratio.  Share numerator
    and denominator are both decimal-exact sums, so the double division
    is bit-stable across partitionings."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    ns = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
        )
    )
    nc = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, c.c_nationkey == nc.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(ns, s.s_nationkey == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                dsum(
                    F.when(F.col("supp_nation") == "NATION_5", _net()).otherwise(
                        F.lit(0.0)
                    )
                )
                / dsum(_net()),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


O_TPCH_Q8 = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round({sql_dsum(f"CASE WHEN ns.n_name = 'NATION_5' THEN {SQL_NET} ELSE 0.0 END")}
             / {sql_dsum(SQL_NET)}, 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region   ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY o_year
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping priority vs late lines): for late-shipped
    lines (adaptation: shipped > 60 days after order date; the fixture
    has no commit/receipt dates or shipmode, so the group key is
    ``l_returnflag``), count critical- vs non-critical-priority orders.
    The CASE-sum pair is one pass over the joined rows."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


O_TPCH_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): two-level
    aggregation — orders per customer (left join keeps zero-order
    customers), then the distribution of those counts.  Adaptation: the
    order exclusion predicate is on ``o_orderpriority`` (no comment
    column).  The second aggregate's input is one row per customer, so
    it is trivially small at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


O_TPCH_Q13 = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from lines
    whose quantity is below 50% of the part's average quantity, for one
    brand.  The correlated scalar subquery decorrelates into a
    per-partkey aggregate joined back to the fact — in Spark that is an
    explicit groupBy + join (what Catalyst's RewriteCorrelatedScalarQuery
    produces anyway), with the brand-filtered side broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(dsum(F.col("l_extendedprice")) / 7.0, 6).alias("avg_yearly")
        )
    )


O_TPCH_Q17 = f"""
SELECT round({sql_dsum('l_extendedprice')} / 7.0, 6) AS avg_yearly
FROM lineitem l JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.5 * {sql_davg('l2.l_quantity')}
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): customers with
    above-average positive balance and no orders since 1999, counted per
    market segment (adaptations: no phone column, so the group key is
    ``c_mktsegment``; "no orders at all" is empty on the fixtures, so
    the dormancy cut is date-bounded).  NOT EXISTS → left-anti join; the
    scalar average is a one-row broadcast cross join, never a collect."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


O_TPCH_Q22 = f"""
SELECT c_mktsegment, COUNT(*) AS numcust, {sql_dsum('c_acctbal')} AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT {sql_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly per-supplier revenue view,
    then the supplier(s) achieving the global maximum.  The scalar max
    is a one-row broadcast cross join against the (small) revenue
    relation — never a collect; the equality is safe because both
    engines compute the identical decimal-exact double."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_net()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


O_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum(SQL_NET)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): for finished
    orders, suppliers from one nation whose line shipped late while
    every other supplier on the order shipped on time — the EXISTS +
    NOT EXISTS double-correlation (adaptation: "late" = shipped > 90
    days after order date; no commit/receipt dates).  Shape: left-semi
    join for the EXISTS, left-anti for the NOT EXISTS — both on the
    order key, neither duplicating the probe side."""
    late_days = "90"
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        n, F.col("s_nationkey") == n.n_nationkey
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = load_table(spark, sf_dir, "lineitem")
    base = (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr(f"o_orderdate + INTERVAL {late_days} DAY"))
        .join(s, l1.l_suppkey == s.s_suppkey)
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    o3 = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l3 = (
        load_table(spark, sf_dir, "lineitem")
        .join(o3, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.expr(f"o_orderdate + INTERVAL {late_days} DAY"))
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    return (
        base.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


O_TPCH_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
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
    "tpch_q7_volume_shipping": q_tpch_q7,
    "tpch_q8_market_share": q_tpch_q8,
    "tpch_q12_priority_shipping": q_tpch_q12,
    "tpch_q13_order_distribution": q_tpch_q13,
    "tpch_q15_top_supplier": q_tpch_q15,
    "tpch_q17_small_qty_revenue": q_tpch_q17,
    "tpch_q21_waiting_suppliers": q_tpch_q21,
    "tpch_q22_dormant_customers": q_tpch_q22,
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
    "tpch_q7_volume_shipping": O_TPCH_Q7,
    "tpch_q8_market_share": O_TPCH_Q8,
    "tpch_q12_priority_shipping": O_TPCH_Q12,
    "tpch_q13_order_distribution": O_TPCH_Q13,
    "tpch_q15_top_supplier": O_TPCH_Q15,
    "tpch_q17_small_qty_revenue": O_TPCH_Q17,
    "tpch_q21_waiting_suppliers": O_TPCH_Q21,
    "tpch_q22_dormant_customers": O_TPCH_Q22,
}
