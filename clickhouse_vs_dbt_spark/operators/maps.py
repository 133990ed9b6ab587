"""MapType column operations and dictionary lookup (ClickHouse
``Map(K,V)`` / ``dictGet`` parity).

The reference's type surface is flat scalars (README.md:158-221); this
module covers the associative-column vocabulary a ClickHouse user has
(``map()``, ``mapFilter``, ``mapApply``, ``mapKeys``/``mapValues``,
``dictGet`` against an external dictionary).

Spark-first shapes: maps are built with ``map_from_entries`` over
``collect_list(struct(...))`` (one shuffle, map-side combined), and
manipulated with the lambda higher-order functions (``map_filter``,
``map_concat``, ``aggregate`` — all Catalyst expressions, codegen'd, no
UDF).  ClickHouse dictionaries become either a literal ``create_map``
(small, driver-side, serialized into the plan — fine to ~10k entries)
or a broadcast-hash join against the dimension table (the 100 TB path:
every executor gets the dict once; no shuffle of the fact side).

Gate note: gated outputs may not contain map columns (the driver's
hasher can't canonicalize them), so the suite explodes its final map
back to rows — the oracle expresses the same semantics relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

SEG_PRIORITY = {
    "AUTOMOBILE": 1,
    "BUILDING": 2,
    "FURNITURE": 3,
    "MACHINERY": 4,
    "HOUSEHOLD": 5,
}


def q_map_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-customer ``status -> order count`` map, then exercise
    the map vocabulary: ``aggregate`` (fold) over ``map_values`` for the
    total, ``map_filter`` to keep statuses with >= 2 orders,
    ``map_concat`` to append an 'ALL' total entry, ``size`` for
    cardinality — and explode back to rows for the gate."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "cnt"))
        ).alias("status_map")
    )
    total = F.aggregate(
        F.map_values("status_map"), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    kept = F.map_concat(
        F.map_filter("status_map", lambda k, v: v >= F.lit(2)),
        F.create_map(F.lit("ALL"), total),
    )
    return (
        m.select(
            "o_custkey",
            F.size("status_map").cast("bigint").alias("n_statuses"),
            F.explode(kept).alias("status", "n"),
        )
        .select("o_custkey", "status", "n", "n_statuses")
    )


O_MAP_FUNCTIONS_SUITE = """
WITH per AS (
  SELECT o_custkey, o_orderstatus AS status, COUNT(*) AS n
  FROM orders GROUP BY o_custkey, o_orderstatus),
tot AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_statuses,
         CAST(SUM(n) AS BIGINT) AS total
  FROM per GROUP BY o_custkey)
SELECT per.o_custkey, per.status, per.n, tot.n_statuses
FROM per JOIN tot ON per.o_custkey = tot.o_custkey WHERE per.n >= 2
UNION ALL
SELECT o_custkey, 'ALL' AS status, total AS n, n_statuses FROM tot
"""


def q_dict_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``dictGet`` parity, both physical shapes: a literal
    ``create_map`` lookup for the 5-entry segment-priority dict
    (constant-folded into the projection) and a broadcast-hash join for
    the nation/region dimension dict (each executor holds the dict
    once; the customer side is never shuffled)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    seg_dict = F.create_map(
        *[F.lit(x) for kv in SEG_PRIORITY.items() for x in kv]
    )
    dims = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    return (
        c.join(dims, c.c_nationkey == F.col("n_nationkey"))
        .select(
            "n_name",
            "r_name",
            F.col("c_mktsegment").alias("segment"),
            F.element_at(seg_dict, F.col("c_mktsegment"))
            .cast("bigint")
            .alias("seg_priority"),
        )
        .groupBy("n_name", "r_name", "segment", "seg_priority")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_SEG_CASE = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in SEG_PRIORITY.items()
)

O_DICT_LOOKUP = f"""
SELECT n_name, r_name, c_mktsegment AS segment,
       CAST(CASE c_mktsegment {_SEG_CASE} END AS BIGINT) AS seg_priority,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name, c_mktsegment
"""


QUERIES = {
    "map_functions_suite": q_map_functions_suite,
    "dict_lookup": q_dict_lookup,
}

ORACLES = {
    "map_functions_suite": O_MAP_FUNCTIONS_SUITE,
    "dict_lookup": O_DICT_LOOKUP,
}
