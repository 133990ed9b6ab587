"""ClickHouse aggregate-function analogs, part 2 (SURVEY.md §2.2
breadth): map-valued aggregates, combinator-style scalar aggregates,
ordered-delta sums, interval-union length, and rank correlation.

ClickHouse surface covered here (all absent from the reference's own
640 declarative lines, present in its engine's vocabulary):

* ``sumMap``/``minMap``/``maxMap``  → ``events_sum_map``: per-row
  ``MAP(event_type → value)`` columns merged key-wise across rows.
  Spark shape: ``create_map`` + ``explode`` (map machinery in the row
  path), keyed decimal-exact aggregate, deterministic sorted re-render.
  The merged maps are emitted as sorted ``k:v`` strings with DECIMAL
  rendering — both engines print fixed-scale decimals identically, so
  the whole map value-checks (doubles would not: their shortest-repr
  formatting is engine-specific).
* ``avgWeighted``, ``uniqUpTo(K)``, ``sumCount`` → ``events_agg_combinators``.
* ``deltaSum`` → ``events_delta_sum``: sum of positive steps in
  time-order, per event type (monotone-progress metric).
* ``intervalLengthSum`` → ``events_interval_length_sum``: length of the
  UNION of per-user activity intervals (overlaps counted once) via the
  classic prev-max-end sweep — all integer micros, exact.
* ``rankCorr`` → ``events_rank_corr``: Spearman ρ with average-tie
  ranks, computed from exact integer rank sums (2·avg-rank = min-rank +
  max-rank keeps ties integral), one IEEE division at the end.

Scale notes: sum_map shuffles (user, key) partial aggregates —
map-side combine collapses duplicates first; delta_sum / interval sweep
windows partition by their natural key (event_type, user) and are
O(1)/row.  rank_corr's rank windows partition by event_type — with few
heavy types the per-group sort concentrates; at 100 TB assign ranks
with the two-pass range-partitioned scheme (repartitionByRange on the
rank key, local sort + rank, carry per-partition counts — the
operators/pipeline.py prefix-sum pattern) and feed the same integer
sums.  BIGINT bounds: rank products stay exact for groups up to ~1.5e9
rows (documented, the decimal-38 casts in the final expression never
overflow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_vs_dbt_spark.catalog import register_views

DEC = "DECIMAL(18,6)"


def _sum_map_sql(dialect: str) -> str:
    if dialect == "spark":
        # exercise real MapType machinery in the row path: a per-row
        # single-entry map, exploded back to (k, v) for the merge
        kv = """
  SELECT user_id, k, v
  FROM (SELECT user_id, map(event_type, value) AS mp FROM events)
  LATERAL VIEW explode(mp) t AS k, v"""
        return f"""
WITH kv AS ({kv}),
per AS (
  SELECT user_id, k,
         SUM(CAST(v AS {DEC})) AS s,
         MIN(CAST(v AS {DEC})) AS mn,
         MAX(CAST(v AS {DEC})) AS mx
  FROM kv GROUP BY user_id, k),
arr AS (
  SELECT user_id,
         COUNT(*) AS n_keys,
         array_sort(collect_list(struct(k, s, mn, mx))) AS es
  FROM per GROUP BY user_id)
SELECT user_id, n_keys,
       concat_ws(',', transform(es, e -> concat(e.k, ':', CAST(e.s AS STRING)))) AS sum_map,
       concat_ws(',', transform(es, e -> concat(e.k, ':', CAST(e.mn AS STRING)))) AS min_map,
       concat_ws(',', transform(es, e -> concat(e.k, ':', CAST(e.mx AS STRING)))) AS max_map
FROM arr ORDER BY user_id
"""
    return f"""
WITH per AS (
  SELECT user_id, event_type AS k,
         SUM(CAST(value AS {DEC})) AS s,
         MIN(CAST(value AS {DEC})) AS mn,
         MAX(CAST(value AS {DEC})) AS mx
  FROM events GROUP BY 1, 2)
SELECT user_id, COUNT(*) AS n_keys,
       string_agg(k || ':' || CAST(s AS VARCHAR), ',' ORDER BY k) AS sum_map,
       string_agg(k || ':' || CAST(mn AS VARCHAR), ',' ORDER BY k) AS min_map,
       string_agg(k || ':' || CAST(mx AS VARCHAR), ',' ORDER BY k) AS max_map
FROM per GROUP BY user_id ORDER BY user_id
"""


def q_events_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sumMap/minMap/maxMap analog (see module doc)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_sum_map_sql("spark"))


def _combinators_sql(dialect: str) -> str:
    """avgWeighted (decimal-exact), uniqUpTo(3), sumCount — the
    combinator-style scalar aggregates, one pass, partial+final."""
    return f"""
SELECT event_type,
       CAST(CAST(SUM(CAST(value * (user_id % 5 + 1) AS {DEC})) AS DOUBLE)
            / SUM(user_id % 5 + 1) AS DOUBLE) AS avg_weighted,
       CAST(LEAST(COUNT(DISTINCT user_id), 4) AS BIGINT) AS uniq_up_to_3,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_v,
       COUNT(value) AS n_v
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_events_agg_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_combinators_sql("spark"))


def _delta_sum_sql(dialect: str) -> str:
    """deltaSum: positive time-ordered steps.  Each step is one IEEE
    subtraction of adjacent doubles (deterministic), the steps sum in
    decimal (order-free)."""
    return f"""
WITH o AS (
  SELECT event_type, value,
         lag(value) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id) AS pv
  FROM events)
SELECT event_type,
       CAST(SUM(CASE WHEN pv IS NOT NULL AND value > pv
                     THEN CAST(value - pv AS {DEC})
                     ELSE CAST(0 AS {DEC}) END) AS DOUBLE) AS delta_sum,
       COUNT(*) AS n
FROM o GROUP BY event_type ORDER BY event_type
"""


def q_events_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_delta_sum_sql("spark"))


INTERVAL_US = 300_000_000  # each event opens a 5-minute activity window


def _interval_length_sql(dialect: str) -> str:
    """intervalLengthSum: union length of per-user [ts, ts+5min)
    intervals.  prev-max-end sweep: contribution = the part of each
    interval past both its own start and everything seen before.
    Integer micros end-to-end — exact in both engines; windows
    partition by user (parallel across users, O(1)/row)."""
    eus = "unix_micros" if dialect == "spark" else "epoch_us"
    return f"""
WITH iv AS (
  SELECT user_id, {eus}(ts) AS st, {eus}(ts) + {INTERVAL_US} AS en
  FROM events),
w AS (
  SELECT user_id, st, en,
         MAX(en) OVER (PARTITION BY user_id ORDER BY st, en
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM iv)
SELECT user_id,
       CAST(SUM(GREATEST(CAST(0 AS BIGINT),
                en - GREATEST(st, COALESCE(pmax, st)))) AS BIGINT)
         AS covered_us,
       COUNT(*) AS n_intervals
FROM w GROUP BY user_id ORDER BY user_id
"""


def q_events_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_interval_length_sql("spark"))


def _rank_corr_sql(dialect: str) -> str:
    """rankCorr (Spearman ρ) per event type.  Average-tie ranks stay
    integral as 2·avg = RANK() min-rank × 2 + (tie-count − 1); all five
    power sums are exact BIGINTs, the classic corr formula is evaluated
    once in DECIMAL(38,0) (exact) and divided as doubles."""
    eus = "unix_micros" if dialect == "spark" else "epoch_us"
    d38 = "DECIMAL(38,0)"
    return f"""
WITH base AS (
  SELECT event_type, value AS x, {eus}(ts) AS y FROM events),
r AS (
  SELECT event_type,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
           + COUNT(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY y)
           + COUNT(*) OVER (PARTITION BY event_type, y) - 1 AS ry
  FROM base),
s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(rx) AS sx, SUM(ry) AS sy,
         SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
  FROM r GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(
         CAST(CAST(n AS {d38}) * CAST(sxy AS {d38})
              - CAST(sx AS {d38}) * CAST(sy AS {d38}) AS DOUBLE)
         / sqrt(CAST(CAST(n AS {d38}) * CAST(sxx AS {d38})
                     - CAST(sx AS {d38}) * CAST(sx AS {d38}) AS DOUBLE)
                * CAST(CAST(n AS {d38}) * CAST(syy AS {d38})
                       - CAST(sy AS {d38}) * CAST(sy AS {d38}) AS DOUBLE)),
         6) AS spearman_rho
FROM s ORDER BY event_type
"""


def q_events_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_rank_corr_sql("spark"))


TOPK_WEIGHTED = 5


def _topk_weighted_sql(dialect: str) -> str:
    """topKWeighted analog: the K heaviest users by exact decimal total
    value (the weight), deterministic tie-break on user id.  ClickHouse
    answers this with a space-saving sketch; at the exact tier the
    engine-portable form is a keyed aggregate + TakeOrderedAndProject
    heap — one shuffle on user_id, never a global sort (the sketch tier
    of the same idea is events_topk_sketch)."""
    return f"""
WITH w AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS weight,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id)
SELECT user_id, weight, n_events
FROM w ORDER BY weight DESC, user_id ASC LIMIT {TOPK_WEIGHTED}
"""


def q_events_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_topk_weighted_sql("spark"))


QUERIES = {
    "events_sum_map": q_events_sum_map,
    "events_topk_weighted": q_events_topk_weighted,
    "events_agg_combinators": q_events_agg_combinators,
    "events_delta_sum": q_events_delta_sum,
    "events_interval_length_sum": q_events_interval_length_sum,
    "events_rank_corr": q_events_rank_corr,
}

ORACLES = {
    "events_sum_map": _sum_map_sql("duckdb"),
    "events_topk_weighted": _topk_weighted_sql("duckdb"),
    "events_agg_combinators": _combinators_sql("duckdb"),
    "events_delta_sum": _delta_sum_sql("duckdb"),
    "events_interval_length_sum": _interval_length_sql("duckdb"),
    "events_rank_corr": _rank_corr_sql("duckdb"),
}
