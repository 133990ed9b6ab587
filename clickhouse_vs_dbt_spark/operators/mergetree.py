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

* **SummingMergeTree** (``mergetree_summing``): rows sharing the sort
  key merge by SUMMING the numeric columns — ClickHouse's
  insert-increments counter-table idiom.  The read is one keyed
  decimal-exact SUM; non-key, non-numeric columns (which ClickHouse
  keeps "any of") are deliberately excluded so the result is
  deterministic and oracle-checkable.
* **VersionedCollapsingMergeTree** (``mergetree_versioned_collapsing``):
  (sign, version) pairs — unlike plain Collapsing, cancels arrive in
  any order because a −1 cancels only its own version.  The read
  composes the two idioms above: per (key, version) sign-cancel (net
  > 0 keeps the version's state row), then max-version FINAL per key.
  Two stacked keyed hash aggregates — still no window, no join.
* **AggregatingMergeTree** (``mergetree_aggregating``): the table
  stores partial aggregate states (``-State`` combinators) merged at
  read with ``-Merge``.  Spark's partial/final aggregation IS this
  idiom; the read builds one state row per (key, part) and merges —
  two stacked keyed hash aggregates, no raw-row reshuffle on read.
* **TTL GROUP BY rollup** (``mergetree_ttl_rollup``): rows past the
  TTL horizon collapse to one aggregated row per TTL group (ClickHouse
  ``TTL d + INTERVAL ... GROUP BY k SET v = sum(v)``); fresh rows
  survive raw.  The read unions a date-pruned aggregate with a
  date-pruned passthrough — only the expired slice ever shuffles.

All queries derive their changelogs deterministically from ``orders``
(every 3rd order gets a v2 restatement; every 5th gets a cancel+restate
pair; every 15th a v3 re-restatement; restated amounts are exact IEEE
additions, not multiply-rounds — round(x*1.1, 2) diverges between
engines on half-way doubles), so the full pipeline value-checks.  At
100 TB every read is a stack of keyed hash aggregates — partial-merge
friendly, no shuffle beyond the keyed exchanges, and no presentation
ORDER BY (the gate hash is order-insensitive; a data-scale result
never pays a range sort just to look sorted).

Scan shape: the Spark side derives each changelog with a SINGLE scan —
per-row conditional entry arrays exploded map-side
(``explode(concat(array(...), CASE WHEN ... END))``) — where the
naive spelling is a 2-5 branch UNION ALL re-scanning the table per
branch.  The DuckDB oracle keeps the UNION ALL spelling as the
executable spec, so the fusion itself is differentially tested.
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
FROM changelog GROUP BY o_orderkey
"""


# Spark-side single-scan changelog: one generator over one scan
# replaces the UNION ALL's repeated scans (module doc).
_REPLACING_SPARK = """
WITH changelog AS (
  SELECT o_orderkey, o_custkey,
         e.o_totalprice, e.o_orderstatus, e.version
  FROM orders
  LATERAL VIEW explode(concat(
    array(struct(o_totalprice AS o_totalprice,
                 o_orderstatus AS o_orderstatus, 1 AS version)),
    CASE WHEN o_orderkey % 3 = 0
         THEN array(struct(o_totalprice + 10.0 AS o_totalprice,
                           'U' AS o_orderstatus, 2 AS version))
         ELSE array() END)) _g AS e)
SELECT o_orderkey,
       MAX(o_custkey) AS o_custkey,
       CAST(MAX(version) AS INT) AS version,
       max_by(o_totalprice, version) AS o_totalprice,
       max_by(o_orderstatus, version) AS o_orderstatus
FROM changelog GROUP BY o_orderkey
"""


def q_mergetree_replacing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree FINAL read (see module doc)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_REPLACING_SPARK)


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
"""


_COLLAPSING_SPARK = f"""
WITH changelog AS (
  SELECT o_custkey, e.amount, e.sign
  FROM orders
  LATERAL VIEW explode(concat(
    array(struct(o_totalprice AS amount, 1 AS sign)),
    CASE WHEN o_orderkey % 5 = 0
         THEN array(struct(o_totalprice AS amount, -1 AS sign),
                    struct(o_totalprice - 10.0 AS amount, 1 AS sign))
         ELSE array() END)) _g AS e)
SELECT o_custkey,
       CAST(SUM(sign) AS BIGINT) AS net_rows,
       {sql_dsum("amount * sign")} AS net_amount
FROM changelog
GROUP BY o_custkey
HAVING SUM(sign) > 0
"""


def q_mergetree_collapsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree sign-column read (see module doc)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_COLLAPSING_SPARK)


def _summing_sql(dialect: str) -> str:
    # CAST the delta literal: a bare 5.0 types as DECIMAL(2,1) in Spark
    # and DOUBLE in DuckDB — the recurring literal-typing drift class
    return f"""
WITH changelog AS (
  SELECT o_custkey, o_orderstatus, o_totalprice AS amount, 1 AS cnt
  FROM orders
  UNION ALL
  SELECT o_custkey, o_orderstatus, CAST(5.0 AS DOUBLE), 1
  FROM orders WHERE o_orderkey % 7 = 0)
SELECT o_custkey, o_orderstatus,
       {sql_dsum("amount")} AS amount_sum,
       CAST(SUM(cnt) AS BIGINT) AS rows_merged
FROM changelog
GROUP BY o_custkey, o_orderstatus
"""


_SUMMING_SPARK = f"""
WITH changelog AS (
  SELECT o_custkey, o_orderstatus, e.amount, e.cnt
  FROM orders
  LATERAL VIEW explode(concat(
    array(struct(o_totalprice AS amount, 1 AS cnt)),
    CASE WHEN o_orderkey % 7 = 0
         THEN array(struct(CAST(5.0 AS DOUBLE) AS amount, 1 AS cnt))
         ELSE array() END)) _g AS e)
SELECT o_custkey, o_orderstatus,
       {sql_dsum("amount")} AS amount_sum,
       CAST(SUM(cnt) AS BIGINT) AS rows_merged
FROM changelog
GROUP BY o_custkey, o_orderstatus
"""


def q_mergetree_summing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree merged read (see module doc)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SUMMING_SPARK)


def _versioned_collapsing_sql(dialect: str) -> str:
    # state row per (key, version) = the sign=+1 row's values (all +1
    # rows of one version are identical by the engine's contract)
    amax = "max_by" if dialect == "spark" else "arg_max"
    return f"""
WITH changelog AS (
  SELECT o_orderkey, o_totalprice AS amount, o_orderstatus AS status,
         1 AS version, 1 AS sign
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderstatus, 1, -1
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 10.0, 'U', 2, 1
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 10.0, 'U', 2, -1
  FROM orders WHERE o_orderkey % 15 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 25.0, 'X', 3, 1
  FROM orders WHERE o_orderkey % 15 = 0),
collapsed AS (
  SELECT o_orderkey, version,
         SUM(sign) AS net,
         {amax}(amount, sign) AS amount,
         {amax}(status, sign) AS status
  FROM changelog GROUP BY o_orderkey, version)
SELECT o_orderkey,
       CAST(MAX(version) AS INT) AS version,
       {amax}(amount, version) AS o_totalprice,
       {amax}(status, version) AS o_orderstatus
FROM collapsed WHERE net > 0
GROUP BY o_orderkey
"""


_VERSIONED_SPARK = """
WITH changelog AS (
  SELECT o_orderkey, e.amount, e.status, e.version, e.sign
  FROM orders
  LATERAL VIEW explode(concat(
    array(struct(o_totalprice AS amount, o_orderstatus AS status,
                 1 AS version, 1 AS sign)),
    CASE WHEN o_orderkey % 3 = 0
         THEN array(struct(o_totalprice AS amount, o_orderstatus AS status,
                           1 AS version, -1 AS sign),
                    struct(o_totalprice + 10.0 AS amount, 'U' AS status,
                           2 AS version, 1 AS sign))
         ELSE array() END,
    CASE WHEN o_orderkey % 15 = 0
         THEN array(struct(o_totalprice + 10.0 AS amount, 'U' AS status,
                           2 AS version, -1 AS sign),
                    struct(o_totalprice + 25.0 AS amount, 'X' AS status,
                           3 AS version, 1 AS sign))
         ELSE array() END)) _g AS e),
collapsed AS (
  SELECT o_orderkey, version,
         SUM(sign) AS net,
         max_by(amount, sign) AS amount,
         max_by(status, sign) AS status
  FROM changelog GROUP BY o_orderkey, version)
SELECT o_orderkey,
       CAST(MAX(version) AS INT) AS version,
       max_by(amount, version) AS o_totalprice,
       max_by(status, version) AS o_orderstatus
FROM collapsed WHERE net > 0
GROUP BY o_orderkey
"""


def q_mergetree_versioned_collapsing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL read (see module doc)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_VERSIONED_SPARK)


def _aggregating_sql(dialect: str) -> str:
    # AggregatingMergeTree: the table stores partial aggregate STATES
    # (ClickHouse -State combinators), one row per (key, part); a read
    # merges states (-Merge) and finalizes.  The Spark shape IS this
    # idiom natively — partial aggregation per part, final merge per
    # key — expressed as two stacked keyed hash aggregates.  "Parts"
    # are order months (what an insert-per-month ingest would produce).
    # States kept: count, decimal-exact sum, min, max — enough to
    # finalize count/sum/avg/min/max, the standard -SimpleState set.
    return """
WITH states AS (
  SELECT o_custkey,
         year(o_orderdate) * 100 + month(o_orderdate) AS part_id,
         COUNT(*) AS cnt_state,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS sum_state,
         MIN(o_totalprice) AS min_state,
         MAX(o_totalprice) AS max_state
  FROM orders
  GROUP BY o_custkey, part_id)
SELECT o_custkey,
       CAST(SUM(cnt_state) AS BIGINT) AS n_orders,
       CAST(SUM(sum_state) AS DOUBLE) AS total_price,
       CAST(CAST(SUM(sum_state) AS DOUBLE) / SUM(cnt_state) AS DOUBLE)
         AS avg_price,
       MIN(min_state) AS min_price,
       MAX(max_state) AS max_price
FROM states
GROUP BY o_custkey
"""


def q_mergetree_aggregating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree state-merge read (see _aggregating_sql)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_aggregating_sql("spark"))


def _ttl_rollup_sql(dialect: str) -> str:
    # TTL GROUP BY rollup (ClickHouse `TTL date + INTERVAL ... GROUP BY
    # k SET v = sum(v)`): rows past the TTL horizon collapse to one
    # aggregated row per TTL group at merge time; fresh rows stay raw.
    # The read is a UNION of a filtered aggregate (expired slice) and a
    # filtered passthrough (fresh slice) — both branches prune on the
    # same date predicate, so at 100 TB each side scans only its
    # partition range; no shuffle touches the fresh rows at all.  The
    # horizon is a fixed literal (orders span 1992-1998) so the result
    # is deterministic and oracle-checkable.
    return f"""
SELECT o_custkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket_month,
       CAST(NULL AS BIGINT) AS o_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_dsum("o_totalprice")} AS total_price
FROM orders
WHERE o_orderdate < DATE '1996-01-01'
GROUP BY o_custkey, bucket_month
UNION ALL
SELECT o_custkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket_month,
       o_orderkey,
       CAST(1 AS BIGINT) AS n_rows,
       CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
"""


# single-scan spelling: fresh rows keep their o_orderkey as a group
# key (singleton groups = raw passthrough); expired rows group under
# NULL — one scan + one keyed aggregate instead of UNION ALL's two
# scans, same result by construction.
_TTL_SPARK = f"""
SELECT o_custkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket_month,
       CASE WHEN o_orderdate >= DATE '1996-01-01'
            THEN o_orderkey END AS o_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_dsum("o_totalprice")} AS total_price
FROM orders
GROUP BY o_custkey, bucket_month, 3
"""


def q_mergetree_ttl_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL GROUP BY rollup read (see _ttl_rollup_sql)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_TTL_SPARK)


QUERIES = {
    "mergetree_replacing_final": q_mergetree_replacing_final,
    "mergetree_collapsing": q_mergetree_collapsing,
    "mergetree_summing": q_mergetree_summing,
    "mergetree_versioned_collapsing": q_mergetree_versioned_collapsing,
    "mergetree_aggregating": q_mergetree_aggregating,
    "mergetree_ttl_rollup": q_mergetree_ttl_rollup,
}

ORACLES = {
    "mergetree_replacing_final": _replacing_sql("duckdb"),
    "mergetree_collapsing": _collapsing_sql("duckdb"),
    "mergetree_summing": _summing_sql("duckdb"),
    "mergetree_versioned_collapsing": _versioned_collapsing_sql("duckdb"),
    "mergetree_aggregating": _aggregating_sql("duckdb"),
    "mergetree_ttl_rollup": _ttl_rollup_sql("duckdb"),
}
