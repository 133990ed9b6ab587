"""Engine-portable HyperLogLog — a *value-checked* approximate
distinct count (ClickHouse ``uniqCombined`` / Spark
``approx_count_distinct`` analog).

Built-in sketches can only be rows-only-checked (each engine's hash and
register layout differ), so this module builds the sketch from scratch
on the engine-portable 60-bit md5 hash (``dedup.md5p_sql``): p=8 →
256 registers, bucket = low 8 bits, rank = leading-zero count of the
remaining 52 bits via ``length(bin(w))`` (identical in Spark and
DuckDB).  The harmonic denominator is accumulated as an exact integer
scaled by 2^53 (``SUM(1 << (53 - rank))``) — order-free, overflow-safe
(≤ 2^61), and the final estimate is one double division by a Python-
inlined literal.  The small-range regime applies the standard
linear-counting correction ``m·ln(m/V)`` — the only libm call in the
query, applied once per group to an exactly-identical input and
rounded to 3 decimals, so a last-ulp ``ln`` difference between
runtimes is absorbed (the raw harmonic path floors at ~0.7·m and
would be useless below ~m distinct values).

This is the mergeable-state pattern that matters at 100 TB: registers
are a 256-way MAX — partial-aggregated map-side, mergeable across any
partitioning (the ClickHouse ``AggregateFunction(uniq, ...)`` state
analog), and the exact COUNT(DISTINCT) computed alongside for the
error column is the thing you *can't* afford at scale (full shuffle of
every key) — the query demonstrates both and reports the relative
error between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_vs_dbt_spark.catalog import register_views
from clickhouse_vs_dbt_spark.operators.dedup import md5p_sql

P = 8
M = 1 << P  # 256 registers
_ALPHA = 0.7213 / (1.0 + 1.079 / M)
_SCALE = 1 << 53
# numerator literal, computed once in Python and inlined in both texts
_NUM = repr(_ALPHA * M * M * float(_SCALE))


def _sql(dialect: str) -> str:
    h = md5p_sql(
        "CAST(user_id AS STRING)" if dialect == "spark" else "CAST(user_id AS VARCHAR)",
        dialect,
    )
    idiv = "div" if dialect == "spark" else "//"
    shift = (
        "shiftleft(CAST(1 AS BIGINT), 53 - rank)"
        if dialect == "spark"
        else "(CAST(1 AS BIGINT) << (53 - rank))"
    )
    # Registers are MAX-merged, so hashing the deduped (type, user)
    # pairs gives identical registers while hashing far fewer rows —
    # and the same deduped relation feeds the exact count.
    return f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type, {h} AS hv FROM du),
reg AS (
  SELECT event_type, hv % {M} AS bucket,
         MAX(CASE WHEN hv {idiv} {M} = 0 THEN 53
                  ELSE 53 - length(bin(hv {idiv} {M})) END) AS rank
  FROM h GROUP BY event_type, hv % {M}),
den AS (
  SELECT event_type, COUNT(*) AS seen,
         CAST(SUM({shift}) AS BIGINT) AS s
  FROM reg GROUP BY event_type),
ex AS (
  SELECT event_type, COUNT(*) AS n_exact FROM du GROUP BY event_type),
est AS (
  SELECT event_type,
         CASE WHEN {_NUM} / (s + ({M} - seen) * {_SCALE}) <= 2.5 * {M}
                   AND seen < {M}
              THEN {M} * ln(CAST({M} AS DOUBLE) / ({M} - seen))
              ELSE {_NUM} / (s + ({M} - seen) * {_SCALE}) END AS e
  FROM den)
SELECT ex.event_type, ex.n_exact,
       CAST(CAST(est.e AS DECIMAL(18,3)) AS DOUBLE) AS hll_estimate,
       CAST(CAST((est.e - ex.n_exact) / ex.n_exact AS DECIMAL(18,6)) AS DOUBLE)
         AS rel_err
FROM ex JOIN est ON ex.event_type = est.event_type
ORDER BY ex.event_type
"""


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL(p=8) estimate of distinct users per event type, with the
    exact count and relative error alongside (see module doc)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_sql("spark"))


def _merge_sql(dialect: str) -> str:
    """uniqMerge analog: per-type register states MAX-merged into one
    global register set, estimated, and compared against the direct
    global estimate — the equality column proves sketch mergeability
    (the AggregateFunction-state algebra that makes pre-aggregated
    rollups exact at 100 TB: combining per-partition/per-day states
    never re-reads raw data)."""
    h = md5p_sql(
        "CAST(user_id AS STRING)" if dialect == "spark" else "CAST(user_id AS VARCHAR)",
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
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type, {h} AS hv FROM du),
typed_reg AS (
  SELECT event_type, hv % {M} AS bucket,
         MAX(CASE WHEN hv {idiv} {M} = 0 THEN 53
                  ELSE 53 - length(bin(hv {idiv} {M})) END) AS rank
  FROM h GROUP BY event_type, hv % {M}),
merged_reg AS (
  SELECT bucket, MAX(rank) AS rank FROM typed_reg GROUP BY bucket),
global_reg AS (
  SELECT hv % {M} AS bucket,
         MAX(CASE WHEN hv {idiv} {M} = 0 THEN 53
                  ELSE 53 - length(bin(hv {idiv} {M})) END) AS rank
  FROM h GROUP BY hv % {M}),
m_est AS (
  SELECT CAST(CAST({est} AS DECIMAL(18,3)) AS DOUBLE) AS e
  FROM (SELECT COUNT(*) AS seen, CAST(SUM({shift}) AS BIGINT) AS s
        FROM merged_reg)),
g_est AS (
  SELECT CAST(CAST({est} AS DECIMAL(18,3)) AS DOUBLE) AS e
  FROM (SELECT COUNT(*) AS seen, CAST(SUM({shift}) AS BIGINT) AS s
        FROM global_reg)),
ex AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events)
SELECT ex.n_exact, m_est.e AS merged_estimate, g_est.e AS direct_estimate,
       m_est.e = g_est.e AS merge_is_lossless
FROM ex CROSS JOIN m_est CROSS JOIN g_est
"""


def q_hll_merge_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge per-event-type HLL register states into the global
    distinct-user estimate (see :func:`_merge_sql`)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_merge_sql("spark"))


QUERIES = {
    "hll_distinct_users": q_hll_distinct_users,
    "hll_merge_global": q_hll_merge_global,
}
ORACLES = {
    "hll_distinct_users": _sql("duckdb"),
    "hll_merge_global": _merge_sql("duckdb"),
}
