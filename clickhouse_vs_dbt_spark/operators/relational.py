"""Extended relational operator flight.

The reference stops at global aggregation (SURVEY.md §2.2 lists what it
does NOT exercise: grouping, sorts, limits, windows, set ops, DISTINCT,
rollup, subqueries, outer/semi/anti joins).  A user of a star-schema
engine needs those on day one — the full SSB/TPC-H suites its data model
targets use them — so this module adds each as a first-class operator
with a DuckDB oracle.  Everything is built-in DataFrame/SQL (JVM-side,
whole-stage codegen); no UDFs.

Scale notes per operator are in the docstrings: the recurring themes are
(a) partial aggregation before shuffle (automatic), (b) broadcast for
dimension sides, (c) windows partitioned by a key — never a global
Window.orderBy, which would single-task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table, register_views
from clickhouse_vs_dbt_spark.operators.common import davg, dsum, sql_davg, sql_dsum

NET = "l_extendedprice * (1 - l_discount)"


# --- multi-aggregate GROUP BY (TPC-H Q1 shape) ---

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: 2 group keys × 8 aggregates over the
    fact table.  Map-side partial aggregation means the shuffle carries
    |groups|×partitions rows, not the fact table — the shape that keeps
    this a single fact-scan at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


O_PRICING = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- ORDER BY + LIMIT (top-k) ---

def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by net revenue; deterministic tie-break on key.
    Spark executes global top-k as TakeOrderedAndProject — per-partition
    heaps then a k-row merge, no global sort — exactly what you want on
    a 1000-executor cluster."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(F.expr(NET)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


O_TOP_CUSTOMERS = f"""
SELECT o_custkey, {sql_dsum(NET)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
ORDER BY revenue DESC, o_custkey ASC
LIMIT 10
"""


# --- window functions (top-k per group) ---

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by revenue via row_number over a
    partitioned window.  The window is keyed (partitionBy brand) so work
    distributes; a global ORDER BY window would serialize at scale."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    per_part = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(dsum(F.expr(NET)).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        per_part.withColumn("rank_in_brand", F.row_number().over(w))
        .filter(F.col("rank_in_brand") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rank_in_brand")
        .orderBy("p_brand", "rank_in_brand")
    )


O_WINDOW_RANK = f"""
WITH per_part AS (
  SELECT p_brand, p_partkey, {sql_dsum(NET)} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, p_partkey, revenue, rank_in_brand FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
            ORDER BY revenue DESC, p_partkey ASC) AS rank_in_brand
  FROM per_part
) WHERE rank_in_brand <= 3
ORDER BY p_brand, rank_in_brand
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order dates (frame-bounded
    window aggregate: rowsBetween unboundedPreceding..current)."""
    o = load_table(spark, sf_dir, "orders")
    per_day = (
        o.groupBy("o_custkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(dsum(F.col("o_totalprice")).alias("day_total"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_day.withColumn(
            "running_total",
            F.sum(F.col("day_total").cast("decimal(18,6)")).over(w).cast("double"),
        )
        .filter(F.col("o_custkey") < 50)
        .orderBy("o_custkey", "order_date")
    )


O_RUNNING_TOTAL = f"""
WITH per_day AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
         {sql_dsum('o_totalprice')} AS day_total
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, order_date, day_total,
       CAST(SUM(CAST(day_total AS DECIMAL(18,6))) OVER (
         PARTITION BY o_custkey ORDER BY order_date
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM per_day
WHERE o_custkey < 50
ORDER BY o_custkey, order_date
"""


# --- DISTINCT / set operations ---

def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


O_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer"


def q_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation-key sets drawn from the
    customer and supplier dimensions, tagged by which set op produced
    the row (one result so all three ops get oracle coverage)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    union = c.union(s).distinct().withColumn("set_op", F.lit("union"))
    intersect = c.intersect(s).withColumn("set_op", F.lit("intersect"))
    except_ = c.subtract(s).withColumn("set_op", F.lit("except"))  # EXCEPT DISTINCT
    return union.union(intersect).union(except_)


O_SET_OPS_NATIONS = """
SELECT nationkey, 'union' AS set_op FROM
  (SELECT c_nationkey AS nationkey FROM customer
   UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'intersect' AS set_op FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'except' AS set_op FROM
  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
   EXCEPT SELECT s_nationkey FROM supplier)
"""


# --- outer / semi / anti joins ---

def q_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers LEFT JOIN orders: customers with zero orders survive
    with count 0 (outer-join null semantics)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


O_LEFT_JOIN = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey
"""


def q_semi_join_bulk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having at least one bulk line item (EXISTS → left-semi
    join: probe side streams, no fan-out, no duplicate rows)."""
    o = load_table(spark, sf_dir, "orders")
    bulk = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        o.join(bulk, o.o_orderkey == bulk.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


O_SEMI_JOIN = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order (NOT EXISTS → left-anti join).

    The correlated subquery carries a filter so the expected result is
    non-empty at every fixture scale (203 rows at sf0.01, 18 at
    sf0.001) — the original no-orders-at-all predicate matched zero
    customers on the driver fixtures, making the gate vacuous: a 0=0
    row-count match proves the plan runs, not that the anti-join
    semantics are right (VERDICT r9 item 3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


O_ANTI_JOIN = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# --- grouping sets / rollup / cube ---

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year → status → grand total); null group keys mark the
    subtotal levels in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup(F.year("o_orderdate").alias("order_year"), F.col("o_orderstatus"))
        .agg(dsum(F.col("o_totalprice")).alias("total"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


O_ROLLUP = f"""
SELECT year(o_orderdate) AS order_year, o_orderstatus,
       {sql_dsum('o_totalprice')} AS total, COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form under rollup/cube:
    (year, status), (year), (status) but NOT the grand total, which
    neither rollup nor cube can express alone.  Spark SQL text form
    (the DataFrame API has no grouping-sets builder)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        f"""
        SELECT year(o_orderdate) AS order_year, o_orderstatus,
               {sql_dsum('o_totalprice')} AS total, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus),
                                (year(o_orderdate)), (o_orderstatus))
        ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
        """
    )


O_GROUPING_SETS = f"""
SELECT year(o_orderdate) AS order_year, o_orderstatus,
       {sql_dsum('o_totalprice')} AS total, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus),
                        (year(o_orderdate)), (o_orderstatus))
ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def _adq_sql(dialect: str) -> str:
    """Portable approximate aggregates per order status (ClickHouse
    ``uniq``/``quantile`` analog), built from ENGINE-PORTABLE sketch
    primitives so the whole thing value-checks (r6: converted from the
    rows-only ``approx_count_distinct``/``percentile_approx`` builtins
    — their internal sketches are engine-specific):

    * distinct parts — the operators/hll.py HLL(p=8) formulation
      (md5-hash registers, MAX-merged, linear-counting correction),
      keyed by o_orderstatus;
    * quantiles — a value-binned histogram sketch over l_quantity
      (integral 1..50 domain: per-(status, value) counts — the
      mergeable fixed-memory state — and the quantile is the smallest
      value whose cumulative count reaches the rank).  Identical SQL
      semantics in both engines, so the gate hash checks the sketch
      itself, not a tolerance band.

    At 100 TB both states are tiny and partial-aggregate-friendly:
    256 registers and ≤50 bins per status, merged map-side."""
    from clickhouse_vs_dbt_spark.operators.dedup import md5p_sql
    from clickhouse_vs_dbt_spark.operators.hll import M, _NUM, _SCALE

    h = md5p_sql(
        "CAST(l_partkey AS STRING)"
        if dialect == "spark"
        else "CAST(l_partkey AS VARCHAR)",
        dialect,
    )
    idiv = "div" if dialect == "spark" else "//"
    shift = (
        "shiftleft(CAST(1 AS BIGINT), 53 - rank)"
        if dialect == "spark"
        else "(CAST(1 AS BIGINT) << (53 - rank))"
    )
    est = (
        f"CASE WHEN {_NUM} / (s + ({M} - seen) * {_SCALE}) <= 2.5 * {M} "
        f"          AND seen < {M} "
        f"     THEN {M} * ln(CAST({M} AS DOUBLE) / ({M} - seen)) "
        f"     ELSE {_NUM} / (s + ({M} - seen) * {_SCALE}) END"
    )
    return f"""
WITH j AS (
  SELECT o_orderstatus, l_partkey, CAST(l_quantity AS DOUBLE) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
dp AS (SELECT DISTINCT o_orderstatus, l_partkey FROM j),
hh AS (SELECT o_orderstatus, {h} AS hv FROM dp),
reg AS (
  SELECT o_orderstatus, hv % {M} AS bucket,
         MAX(CASE WHEN hv {idiv} {M} = 0 THEN 53
                  ELSE 53 - length(bin(hv {idiv} {M})) END) AS rank
  FROM hh GROUP BY o_orderstatus, hv % {M}),
den AS (
  SELECT o_orderstatus, COUNT(*) AS seen,
         CAST(SUM({shift}) AS BIGINT) AS s
  FROM reg GROUP BY o_orderstatus),
apx AS (
  SELECT o_orderstatus,
         CAST(round(CAST({est} AS DECIMAL(18,3)), 0) AS BIGINT)
           AS approx_parts
  FROM den),
hist AS (
  SELECT o_orderstatus, qty, COUNT(*) AS c FROM j GROUP BY 1, 2),
cum AS (
  SELECT o_orderstatus, qty, c,
         SUM(c) OVER (PARTITION BY o_orderstatus ORDER BY qty
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cu,
         SUM(c) OVER (PARTITION BY o_orderstatus) AS tot
  FROM hist),
qq AS (
  SELECT o_orderstatus,
         round(MIN(CASE WHEN cu >= 0.5 * tot THEN qty END), 2) AS qty_p50,
         round(MIN(CASE WHEN cu >= 0.9 * tot THEN qty END), 2) AS qty_p90,
         round(MIN(CASE WHEN cu >= 0.99 * tot THEN qty END), 2)
           AS qty_p99
  FROM cum GROUP BY o_orderstatus)
SELECT a.o_orderstatus, a.approx_parts,
       q.qty_p50, q.qty_p90, q.qty_p99
FROM apx a JOIN qq q ON a.o_orderstatus = q.o_orderstatus
ORDER BY a.o_orderstatus
"""


def q_approx_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-sketch approximate aggregates (see :func:`_adq_sql`);
    tests/test_relational.py additionally bounds the HLL estimate's
    relative error against the exact distinct count."""
    from clickhouse_vs_dbt_spark.catalog import register_views

    register_views(spark, sf_dir, ("lineitem", "orders"))
    return spark.sql(_adq_sql("spark"))


def q_cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
    )


O_CUBE = f"""
SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- pivot (conditional aggregation) ---

def q_pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns — relational equivalent of
    ClickHouse sumIf / conditional aggregation."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.expr(NET)))
        .withColumnRenamed("O", "rev_open")
        .withColumnRenamed("F", "rev_finished")
        .orderBy("l_returnflag")
    )


O_PIVOT = f"""
SELECT l_returnflag,
       {sql_dsum(f"CASE WHEN l_linestatus = 'O' THEN {NET} END")} AS rev_open,
       {sql_dsum(f"CASE WHEN l_linestatus = 'F' THEN {NET} END")} AS rev_finished
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- CTE + subquery through the SQL entry point ---

def q_top_supplier_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape through ``spark.sql``: CTE + scalar subquery
    (max over the CTE).  Demonstrates the SQL entry point produces the
    same Catalyst plans as the DataFrame API."""
    register_views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql(f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no, {sql_dsum(NET)} AS total_revenue
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """)


O_TOP_SUPPLIER = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum(NET)} AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- exact median (sort-based aggregate) ---

def q_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per return flag (ClickHouse
    quantileExact analog; Spark ``percentile``)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, 0.5)").alias("median_qty"))
        .orderBy("l_returnflag")
    )


O_MEDIAN = """
SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- fixed-width histogram ---

HIST_WIDTH = 5


def q_histogram_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of lineitem quantity with per-bucket
    revenue: bucketing is a pure map expression (integer division), the
    aggregate is one keyed shuffle over ≤ range/width groups — the
    constant-memory histogram shape at any scale (vs. sort-based
    percentile scans)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.withColumn(
            "bucket",
            F.floor(F.col("l_quantity") / HIST_WIDTH).cast("int") * HIST_WIDTH,
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("bucket")
    )


O_HISTOGRAM = f"""
SELECT CAST(floor(l_quantity / {HIST_WIDTH}) AS INT) * {HIST_WIDTH} AS bucket,
       COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
GROUP BY 1 ORDER BY bucket
"""


# --- unpivot (melt) ---

def q_unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of the part measures — the inverse of pivot,
    needed whenever a metrics-as-columns table feeds a generic
    per-metric pipeline.  ``unpivot`` is a zero-shuffle map-side
    expansion (each row emits |measures| rows)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            F.col("p_retailprice").alias("p_retailprice"),
        )
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "value")
        .orderBy("p_partkey", "measure")
    )


O_UNPIVOT = """
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
ORDER BY p_partkey, measure
"""


# --- per-group exact quantiles ---

def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95 of the event value per event type (linear-
    interpolation definition, identical in Spark ``percentile`` and
    DuckDB ``quantile_cont``).  Exact per-group percentiles sort within
    groups only; for the sketch-based global form see
    approx_distinct_quantiles."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


O_GROUP_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- ClickHouse LIMIT n BY analog ---

LIMIT_BY_N = 3


def q_limit_by_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT n BY key`` (first n rows per key after ORDER
    BY) as the standard-SQL rank-filter: earliest 3 orders per status.
    The window partitions by the LIMIT BY key, so per-partition heaps
    do the work — no global sort at any scale (same decorrelated plan
    Catalyst produces for the LATERAL form, lateral_top_orders)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= LIMIT_BY_N)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("o_orderstatus", "rn")
    )


O_LIMIT_BY = f"""
SELECT o_orderstatus, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date, CAST(rn AS INT) AS rn
FROM (
  SELECT o_orderstatus, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders)
WHERE rn <= {LIMIT_BY_N}
ORDER BY o_orderstatus, rn
"""


# --- full outer join ---

def q_full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two independent per-nation aggregates
    (customer vs supplier account balances).  Both sides pre-aggregate
    to ≤ |nation| rows before the join, so the outer join itself is
    between two tiny relations no matter how large the inputs — the
    100 TB shape for reconciliation-style full outers (aggregate first,
    join the summaries; never full-outer raw fact tables)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cb = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"), dsum(F.col("c_acctbal")).alias("cust_bal")
    )
    sb = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp"), dsum(F.col("s_acctbal")).alias("supp_bal")
    )
    return (
        cb.join(sb, cb.c_nationkey == sb.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
        )
        .orderBy("nationkey")
    )


O_FULL_OUTER = f"""
WITH cb AS (
  SELECT c_nationkey, COUNT(*) AS n_cust, {sql_dsum('c_acctbal')} AS cust_bal
  FROM customer GROUP BY c_nationkey),
sb AS (
  SELECT s_nationkey, COUNT(*) AS n_supp, {sql_dsum('s_acctbal')} AS supp_bal
  FROM supplier GROUP BY s_nationkey)
SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(cust_bal, 0.0) AS cust_bal,
       coalesce(n_supp, 0) AS n_supp,
       coalesce(supp_bal, 0.0) AS supp_bal
FROM cb FULL OUTER JOIN sb ON c_nationkey = s_nationkey
ORDER BY nationkey
"""


# --- cross join (dimension grid densification) ---

def q_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (region × order-status) grid via CROSS JOIN of two tiny
    distinct sets, left-joined against observed counts — the standard
    densification pattern (report every cell, zero-filled).  Both grid
    sides are dimension-scale, so the cross join is a broadcast nested
    loop over a handful of rows; the fact table contributes through one
    keyed pre-aggregate."""
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    statuses = o.select("o_orderstatus").distinct()
    observed = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        r.crossJoin(statuses)
        .join(
            observed,
            (F.col("r_regionkey") == F.col("n_regionkey"))
            & (statuses.o_orderstatus == observed.o_orderstatus),
            "left",
        )
        .select(
            "r_name",
            statuses.o_orderstatus.alias("status"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        .orderBy("r_name", "status")
    )


O_CROSS_JOIN_GRID = """
WITH grid AS (
  SELECT r_regionkey, r_name, o_orderstatus
  FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)),
observed AS (
  SELECT n_regionkey, o_orderstatus, COUNT(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT g.r_name, g.o_orderstatus AS status,
       coalesce(o.n_orders, 0) AS n_orders
FROM grid g LEFT JOIN observed o
  ON g.r_regionkey = o.n_regionkey AND g.o_orderstatus = o.o_orderstatus
ORDER BY r_name, status
"""


def q_any_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ANY LEFT JOIN``: each left row matches at most ONE
    right row (ClickHouse picks an arbitrary one; here the
    lexicographic-first line so the result is deterministic and
    oracle-checkable).  Spark shape: the right side collapses to one
    row per key via a keyed ``min_by`` aggregate BEFORE the join — a
    shuffle of the right relation only, then a plain equi-join whose
    right side is guaranteed unique (no fan-out, so at 100 TB the join
    output is exactly |orders| rows, never |orders|·|lines|).  This is
    strictly cheaper than joining raw and deduping after, which would
    shuffle the fanned-out product."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # the fixture's (l_orderkey, l_linenumber) is NOT unique, so the
    # "first" row is the lexicographic minimum over every projected
    # column — a total order (full duplicates pick identical values),
    # hence deterministic in both engines.  min(struct(...)) keeps the
    # collapse a keyed aggregate: no window, no fan-out.
    first_line = li.groupBy("l_orderkey").agg(
        F.min(
            F.struct("l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        ).alias("s")
    ).select(
        "l_orderkey",
        F.col("s.l_quantity").alias("any_qty"),
        F.col("s.l_extendedprice").alias("any_price"),
        F.col("s.l_returnflag").alias("any_flag"),
    )
    return (
        o.join(first_line, o.o_orderkey == first_line.l_orderkey, "left")
        .groupBy("o_orderstatus", "any_flag")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.coalesce(F.col("any_price"), F.lit(0.0))).alias(
                "first_line_price_sum"
            ),
            dsum(F.coalesce(F.col("any_qty"), F.lit(0.0))).alias(
                "first_line_qty_sum"
            ),
        )
    )


O_ANY_LEFT_JOIN = f"""
WITH first_line AS (
  SELECT l_orderkey,
         l_quantity AS any_qty,
         l_extendedprice AS any_price,
         l_returnflag AS any_flag
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber, l_quantity, l_extendedprice, l_returnflag
    ) AS rn
    FROM lineitem)
  WHERE rn = 1)
SELECT o_orderstatus, any_flag,
       COUNT(*) AS n_orders,
       {sql_dsum("coalesce(any_price, 0.0)")} AS first_line_price_sum,
       {sql_dsum("coalesce(any_qty, 0.0)")} AS first_line_qty_sum
FROM orders LEFT JOIN first_line ON o_orderkey = l_orderkey
GROUP BY o_orderstatus, any_flag
"""


QUERIES = {
    "tpch_q1_pricing_summary": q_pricing_summary,
    "any_left_join": q_any_left_join,
    "full_outer_nation_balance": q_full_outer_nation_balance,
    "cross_join_grid": q_cross_join_grid,
    "limit_by_analog": q_limit_by_analog,
    "histogram_quantity": q_histogram_quantity,
    "unpivot_part_measures": q_unpivot_part_measures,
    "group_quantiles": q_group_quantiles,
    "top_customers": q_top_customers,
    "window_rank_parts": q_window_rank,
    "window_running_total": q_running_total,
    "distinct_segments": q_distinct_segments,
    "set_ops_nations": q_set_ops_nations,
    "left_join_order_counts": q_left_join_order_counts,
    "semi_join_bulk_orders": q_semi_join_bulk_orders,
    "anti_join_quiet_customers": q_anti_join_quiet_customers,
    "rollup_revenue": q_rollup_revenue,
    "cube_qty": q_cube_qty,
    "grouping_sets_revenue": q_grouping_sets_revenue,
    "approx_distinct_quantiles": q_approx_distinct_quantiles,
    "pivot_status_revenue": q_pivot_status_revenue,
    "top_supplier_cte": q_top_supplier_cte,
    "median_quantity": q_median_quantity,
}

ORACLES = {
    "tpch_q1_pricing_summary": O_PRICING,
    "any_left_join": O_ANY_LEFT_JOIN,
    "full_outer_nation_balance": O_FULL_OUTER,
    "cross_join_grid": O_CROSS_JOIN_GRID,
    "limit_by_analog": O_LIMIT_BY,
    "histogram_quantity": O_HISTOGRAM,
    "unpivot_part_measures": O_UNPIVOT,
    "group_quantiles": O_GROUP_QUANTILES,
    "top_customers": O_TOP_CUSTOMERS,
    "window_rank_parts": O_WINDOW_RANK,
    "window_running_total": O_RUNNING_TOTAL,
    "distinct_segments": O_DISTINCT_SEGMENTS,
    "set_ops_nations": O_SET_OPS_NATIONS,
    "left_join_order_counts": O_LEFT_JOIN,
    "semi_join_bulk_orders": O_SEMI_JOIN,
    "anti_join_quiet_customers": O_ANTI_JOIN,
    "rollup_revenue": O_ROLLUP,
    "cube_qty": O_CUBE,
    "grouping_sets_revenue": O_GROUPING_SETS,
    "approx_distinct_quantiles": _adq_sql("duckdb"),
    "pivot_status_revenue": O_PIVOT,
    "top_supplier_cte": O_TOP_SUPPLIER,
    "median_quantity": O_MEDIAN,
}
