"""Scalar-function and window-function breadth suite.

The reference's scalar surface is three date functions and one multiply
(SURVEY.md §2.1 D1-D3, E1); a drop-in engine needs the whole everyday
function vocabulary.  Each query here exercises a family — string
functions, math functions, window frames (ntile), date arithmetic —
through the same oracle gate as every other operator, restricted to
functions with engine-exact semantics (no libm-dependent log/exp/pow:
their last-ulp behavior differs across engines; sqrt is IEEE-exact and
included).

Everything is a built-in Catalyst expression (whole-stage codegen) over
a single scan — the function families add zero shuffles beyond their
final aggregate, so these shapes are scan-bound at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.common import davg, dsum, sql_davg, sql_dsum


# --- string function suite ---

def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The everyday string vocabulary — case, substring, pad, replace,
    reverse, search, split_part, edit distance — as one map-only
    projection over ``customer``.  All ASCII-exact and identical across
    engines (Levenshtein is the classic DP, same value everywhere)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("up"),
            F.length("c_name").cast("long").alias("name_len"),
            F.substring("c_name", 1, 8).alias("prefix8"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
            F.regexp_replace(F.col("c_name"), "0+", "0").alias("squeezed"),
            F.reverse(F.col("c_name")).alias("rev"),
            F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
            F.expr("split_part(c_name, '#', 2)").alias("num_part"),
            F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING"))
            .cast("long")
            .alias("seg_dist"),
            F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        )
        .orderBy("c_custkey")
    )


O_STRING_FUNCTIONS = """
SELECT c_custkey,
       upper(c_name) AS up,
       CAST(length(c_name) AS BIGINT) AS name_len,
       substr(c_name, 1, 8) AS prefix8,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
       reverse(c_name) AS rev,
       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
       split_part(c_name, '#', 2) AS num_part,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS seg_dist,
       concat_ws('|', c_mktsegment, c_name) AS joined
FROM customer ORDER BY c_custkey
"""


# --- math function suite ---

def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-exact math vocabulary (sqrt / abs / ceil / floor / sign /
    greatest / least / mod) aggregated per return flag.  Aggregates go
    through the decimal-exact path so results are partition-count
    independent (operators/common.py)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            dsum(F.sqrt(F.col("l_quantity"))).alias("sum_sqrt_qty"),
            dsum(F.abs(F.col("l_discount") - 0.05)).alias("sum_abs_disc_dev"),
            F.max(F.ceil("l_extendedprice")).cast("long").alias("max_ceil_price"),
            F.min(F.floor("l_extendedprice")).cast("long").alias("min_floor_price"),
            F.sum(F.signum(F.col("l_tax") - 0.04).cast("long")).cast("long").alias(
                "net_tax_sign"
            ),
            dsum(F.greatest(F.col("l_quantity"), F.col("l_tax") * 100)).alias(
                "sum_greatest"
            ),
            dsum(F.least(F.col("l_quantity"), F.lit(10.0))).alias("sum_least"),
            F.sum(F.col("l_linenumber") % 3).cast("long").alias("sum_mod3"),
        )
        .orderBy("l_returnflag")
    )


O_MATH_FUNCTIONS = f"""
SELECT l_returnflag,
       {sql_dsum('sqrt(l_quantity)')} AS sum_sqrt_qty,
       {sql_dsum('abs(l_discount - 0.05)')} AS sum_abs_disc_dev,
       CAST(MAX(ceil(l_extendedprice)) AS BIGINT) AS max_ceil_price,
       CAST(MIN(floor(l_extendedprice)) AS BIGINT) AS min_floor_price,
       CAST(SUM(CAST(sign(l_tax - 0.04) AS BIGINT)) AS BIGINT) AS net_tax_sign,
       {sql_dsum('greatest(l_quantity, l_tax * 100)')} AS sum_greatest,
       {sql_dsum('least(l_quantity, 10.0)')} AS sum_least,
       CAST(SUM(l_linenumber % 3) AS BIGINT) AS sum_mod3
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- ntile window ---

def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance quartiles per market segment via ``ntile(4)``
    (keyed window — distributes by segment), then per-quartile stats.
    ntile's remainder rule (earlier buckets get the extra rows) is
    identical in Spark and DuckDB."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            davg(F.col("c_acctbal")).alias("avg_bal"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


O_NTILE = f"""
WITH q AS (
  SELECT c_mktsegment, c_acctbal,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
  FROM customer)
SELECT c_mktsegment, quartile, COUNT(*) AS n,
       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
       {sql_davg('c_acctbal')} AS avg_bal
FROM q GROUP BY 1, 2 ORDER BY c_mktsegment, quartile
"""


# --- date arithmetic: shipping latency histogram ---

def q_ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency in whole weeks: ``datediff`` → integer
    division → one keyed aggregate.  The join is the star spine
    (co-partitionable / bucketable at scale, see SCALING.md §1); the
    histogram adds one narrow shuffle of ≤ latency-range/7 groups."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "lat_weeks",
            F.floor(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) / 7
            ).cast("int"),
        )
        .groupBy("lat_weeks")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            davg(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("double")
            ).alias("avg_days"),
        )
        .orderBy("lat_weeks")
    )


O_SHIP_LATENCY = f"""
SELECT CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 7.0) AS INT)
         AS lat_weeks,
       COUNT(*) AS n_lines,
       {sql_davg("CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE)")}
         AS avg_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY lat_weeks
"""


# --- array function suite ---

def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array vocabulary over the embedding column — element access,
    min/max, size, and a left-to-right fold (higher-order ``aggregate``)
    — aggregated per label.  The fold order is the same sequential
    left-fold in both engines, so even the order-sensitive double sum is
    bit-identical; cross-row aggregation still goes through the decimal
    path.  All array work is per-row Catalyst codegen: zero extra
    shuffles beyond the final keyed aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    fold = (
        "aggregate(embedding, CAST(0.0 AS DOUBLE), "
        "(a, x) -> a + CAST(x AS DOUBLE))"
    )
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.expr("CAST(element_at(embedding, 1) AS DOUBLE)")).alias(
                "sum_first"
            ),
            F.max(F.expr("CAST(array_max(embedding) AS DOUBLE)")).alias("max_comp"),
            F.min(F.expr("CAST(array_min(embedding) AS DOUBLE)")).alias("min_comp"),
            F.sum(F.size("embedding")).cast("long").alias("total_dims"),
            dsum(F.expr(fold)).alias("sum_components"),
        )
        .orderBy("label")
    )


O_ARRAY_FUNCTIONS = f"""
SELECT label, COUNT(*) AS n,
       {sql_dsum('CAST(embedding[1] AS DOUBLE)')} AS sum_first,
       MAX(CAST(list_max(embedding) AS DOUBLE)) AS max_comp,
       MIN(CAST(list_min(embedding) AS DOUBLE)) AS min_comp,
       CAST(SUM(len(embedding)) AS BIGINT) AS total_dims,
       {sql_dsum("coalesce(list_sum(list_transform(embedding, "
                 "x -> CAST(x AS DOUBLE))), 0.0)")} AS sum_components
FROM embeddings GROUP BY label ORDER BY label
"""


# --- array higher-order functions, round 2 ---

def q_array_hof_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining array HOF vocabulary (ClickHouse arrayFilter /
    arrayExists / arrayAll / arraySort / arraySlice / arrayMap-zip
    analogs): ``filter``, ``exists``, ``forall``, ``array_sort``,
    ``slice``, ``zip_with`` — all Catalyst lambda expressions over the
    embedding column, aggregated per label.  The zip_with self-product
    is the dot-product building block of the similarity module, gated
    here in isolation."""
    e = load_table(spark, sf_dir, "embeddings")
    n_pos = "size(filter(embedding, x -> x > 0))"
    any_big = "exists(embedding, x -> x > CAST(2.0 AS FLOAT))"
    all_small = "forall(embedding, x -> abs(x) < CAST(10.0 AS FLOAT))"
    mid = "CAST(element_at(array_sort(embedding), 8) AS DOUBLE)"
    head_sum = (
        "aggregate(slice(embedding, 1, 4), CAST(0.0 AS DOUBLE), "
        "(a, x) -> a + CAST(x AS DOUBLE))"
    )
    sq_sum = (
        "aggregate(zip_with(embedding, embedding, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    return (
        e.groupBy("label")
        .agg(
            F.sum(F.expr(n_pos)).cast("long").alias("total_pos"),
            F.sum(F.expr(any_big).cast("long")).cast("long").alias("n_any_big"),
            F.sum(F.expr(all_small).cast("long")).cast("long").alias("n_all_small"),
            dsum(F.expr(mid)).alias("sum_mid_sorted"),
            dsum(F.expr(head_sum)).alias("sum_head4"),
            dsum(F.expr(sq_sum)).alias("sum_sq"),
        )
        .orderBy("label")
    )


O_ARRAY_HOF = f"""
SELECT label,
       CAST(SUM(len(list_filter(embedding, x -> x > 0))) AS BIGINT) AS total_pos,
       CAST(SUM(CASE WHEN len(list_filter(embedding, x -> x > CAST(2.0 AS FLOAT))) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_any_big,
       CAST(SUM(CASE WHEN len(list_filter(embedding,
                              x -> NOT abs(x) < CAST(10.0 AS FLOAT))) = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_all_small,
       {sql_dsum('CAST(list_sort(embedding)[8] AS DOUBLE)')} AS sum_mid_sorted,
       {sql_dsum("coalesce(list_sum(list_transform(embedding[1:4], "
                 "x -> CAST(x AS DOUBLE))), 0.0)")} AS sum_head4,
       {sql_dsum("coalesce(list_sum(list_transform(embedding, "
                 "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0)")}
         AS sum_sq
FROM embeddings GROUP BY label ORDER BY label
"""


QUERIES = {
    "string_functions_suite": q_string_functions,
    "array_hof_suite": q_array_hof_functions,
    "array_functions_suite": q_array_functions,
    "math_functions_suite": q_math_functions,
    "ntile_quartiles": q_ntile_quartiles,
    "ship_latency_histogram": q_ship_latency_histogram,
}

ORACLES = {
    "string_functions_suite": O_STRING_FUNCTIONS,
    "array_hof_suite": O_ARRAY_HOF,
    "array_functions_suite": O_ARRAY_FUNCTIONS,
    "math_functions_suite": O_MATH_FUNCTIONS,
    "ntile_quartiles": O_NTILE,
    "ship_latency_histogram": O_SHIP_LATENCY,
}
