"""MergeTree-family table-engine semantics (ClickHouse's mutable-data
idioms) as declarative Spark reads.

The reference's tables are ClickHouse engines (``ENGINE = S3`` sources,
MergeTree-backed dbt models); the wider family gives ClickHouse its
standard answers to updates without updates-in-place.  Each variant's
READ semantics — the part users consume — is one Catalyst plan here:

* **ReplacingMergeTree + FINAL** (``mergetree_replacing_final``):
  a versioned changelog collapses to the max-version row per key.
  Spark shape: keyed ``max_by`` aggregate with map-side partials
  (``partial_max_by`` before the exchange), no window, no join —
  Spark picks SortAggregate because the string column sits in the
  aggregation buffer, but the cost profile is the partial+final merge,
  not a global sort.  (The write side of this idiom is ModelRunner's
  merge-by-unique-key incremental materialization,
  operators/incremental.py.)
* **CollapsingMergeTree** (``mergetree_collapsing``): sign-column
  cancel-and-restate (a row is deleted by re-inserting it with
  sign=−1, updated by a −1/+1 pair).  The read is a keyed SUM over
  ``sign`` and ``sign·measure`` with a ``HAVING net > 0`` gate —
  exactly ClickHouse's collapse-at-merge, expressed at read time.
  This is also the classic CDC-changelog aggregation shape (retract
  streams), decimal-exact so both engines agree bit-for-bit.

Both queries derive their changelogs deterministically from ``orders``
(every 3rd order gets a v2 restatement; every 5th gets a cancel+restate
pair; restated amounts are exact IEEE additions, not multiply-rounds —
round(x*1.1, 2) diverges between engines on half-way doubles), so the
full pipeline value-checks.  At 100 TB both reads are
single keyed hash aggregates — partial-merge friendly, no shuffle
beyond the one keyed exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_vs_dbt_spark.catalog import register_views
from clickhouse_vs_dbt_spark.operators.common import sql_dsum


def _replacing_sql(dialect: str) -> str:
    # max_by/arg_max keeps the read a hash aggregate (ObjectHashAggregate
    # with partial merge); a lexicographic struct MAX would plan as
    # SortAggregate — correct but sorting where no sort is needed
    amax = "max_by" if dialect == "spark" else "arg_max"
    return f"""
WITH changelog AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 1 AS version
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice + 10.0, 'U', 2
  FROM orders WHERE o_orderkey % 3 = 0)
SELECT o_orderkey,
       MAX(o_custkey) AS o_custkey,
       CAST(MAX(version) AS INT) AS version,
       {amax}(o_totalprice, version) AS o_totalprice,
       {amax}(o_orderstatus, version) AS o_orderstatus
FROM changelog GROUP BY o_orderkey ORDER BY o_orderkey
"""


def q_mergetree_replacing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree FINAL read (see module doc)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_replacing_sql("spark"))


def _collapsing_sql(dialect: str) -> str:
    return f"""
WITH changelog AS (
  SELECT o_custkey, o_totalprice AS amount, 1 AS sign FROM orders
  UNION ALL
  SELECT o_custkey, o_totalprice, -1 FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_custkey, o_totalprice - 10.0, 1
  FROM orders WHERE o_orderkey % 5 = 0)
SELECT o_custkey,
       CAST(SUM(sign) AS BIGINT) AS net_rows,
       {sql_dsum("amount * sign")} AS net_amount
FROM changelog
GROUP BY o_custkey
HAVING SUM(sign) > 0
ORDER BY o_custkey
"""


def q_mergetree_collapsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree sign-column read (see module doc)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_collapsing_sql("spark"))


QUERIES = {
    "mergetree_replacing_final": q_mergetree_replacing_final,
    "mergetree_collapsing": q_mergetree_collapsing,
}

ORACLES = {
    "mergetree_replacing_final": _replacing_sql("duckdb"),
    "mergetree_collapsing": _collapsing_sql("duckdb"),
}
