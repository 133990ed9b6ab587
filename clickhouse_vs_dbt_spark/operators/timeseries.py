"""Event-time window operators over ``events`` (SURVEY.md §2.3):
tumbling, sliding, and session windows, batch-first via
``F.window``/``F.session_window`` (the Structured Streaming variants in
``streaming/`` share these semantics).

Window starts are emitted as epoch seconds / micros (long) so outputs
are engine-portable; value sums go through the DECIMAL(18,6) pattern
(operators/common.py).

Scale: groupBy(window, key) is a single keyed shuffle; with a watermark
in the streaming variant, state is bounded by (windows in flight ×
keys).  Session windows shuffle by user — the natural partitioning —
and merge per-user sorted runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.common import davg, dsum, sql_davg, sql_dsum

TUMBLE_SEC = 600
SLIDE_SEC = 300
SESSION_GAP_MIN = 30


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows × event_type: count + value sum."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", f"{TUMBLE_SEC} seconds").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


O_TUMBLING = f"""
SELECT CAST(floor(epoch(ts) / {TUMBLE_SEC}) * {TUMBLE_SEC} AS BIGINT) AS window_start,
       event_type, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in
    exactly size/slide = 2 windows)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", f"{TUMBLE_SEC} seconds", f"{SLIDE_SEC} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


O_SLIDING = f"""
SELECT CAST((floor(epoch(ts) / {SLIDE_SEC}) - i) * {SLIDE_SEC} AS BIGINT) AS window_start,
       COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
GROUP BY 1 ORDER BY 1
"""


def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (``F.session_window`` in batch mode).  The oracle reproduces the
    semantics relationally: lag() gap detection → cumulative session
    ids → group (SNIPPETS/guide 'sessionization' pattern)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("total_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start_us")
    )


O_SESSION = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   >= {SESSION_GAP_MIN * 60} OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start_us
"""


def q_events_gap_to_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gaps (lag over event time) — the building
    block under sessionization, exposed as its own operator."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return (
        e.withColumn("prev_us", F.unix_micros(F.lag("ts").over(w)))
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            (F.unix_micros("ts") - F.col("prev_us")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


O_GAP = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap_us
FROM events ORDER BY event_id
"""


def q_events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the deduplicate-to-current-state operator
    (ClickHouse's ReplacingMergeTree / "argMax" read pattern, here as a
    keyed window heap).  row_number over (ts DESC, event_id DESC) keeps
    exactly one deterministic winner per key; at 100 TB this is one
    hash-partitioned shuffle on user_id with per-partition heaps — the
    canonical compaction shape for CDC/state snapshots."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
        )
        .orderBy("user_id")
    )


O_LATEST_PER_USER = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1 ORDER BY user_id
"""


def q_events_argmax_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-``argMax`` parity: per-user latest event attributes
    via ``max_by`` with a (ts, event_id) struct order — ONE hash
    aggregate with map-side partial ``max_by``, no window sort.  This is
    the cheaper sibling of events_latest_per_user (row_number window):
    at 100 TB the aggregate form moves one struct per (user, partition)
    through the shuffle instead of sorting every partition, so prefer it
    whenever only the winning attributes (not the full row) are needed."""
    e = load_table(spark, sf_dir, "events")
    ord_key = "struct(ts, event_id)"
    return (
        e.groupBy("user_id")
        .agg(
            F.expr(f"max_by(event_type, {ord_key})").alias("last_event_type"),
            F.expr(f"max_by(value, {ord_key})").alias("last_value"),
            F.unix_micros(F.max("ts")).alias("last_ts_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


O_ARGMAX_STATE = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events,
         MAX(ts) OVER (PARTITION BY user_id) AS max_ts
  FROM events)
SELECT user_id, event_type AS last_event_type, value AS last_value,
       epoch_us(max_ts) AS last_ts_us, n_events
FROM ranked WHERE rn = 1 ORDER BY user_id
"""


def q_events_time_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-part extraction vocabulary (hour, ISO day-of-week,
    day-of-month, month) driving a two-key activity profile — the
    time-of-day × weekday heatmap every event pipeline builds.  Pure
    scan-side projections into one small keyed aggregate.  Spark's
    ``weekday`` (0=Mon) +1 equals DuckDB's ``isodow`` (1=Mon) — pinned
    here so the engines agree on week semantics (SURVEY.md §2.1 D3)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.hour("ts").cast("int").alias("hod"),
            (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .orderBy("hod", "iso_dow")
    )


O_TIME_PARTS = f"""
SELECT CAST(hour(ts) AS INT) AS hod, CAST(isodow(ts) AS INT) AS iso_dow,
       COUNT(*) AS n, {sql_dsum('value')} AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hod, iso_dow
"""


# --- as-of join (driver-mandated custom operator Spark lacks natively) ---

def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent view
    at or before it.

    Spark has no ASOF JOIN operator; the scalable composition is a
    single keyed window — union the two sides (here they share one
    table), sort per user by event time, and carry the last view
    forward with ``last(..., ignorenulls=True)``.  One shuffle on
    user_id, no join at all — the classic log-enrichment shape that a
    naive range self-join would do in O(n·k).  Ties (view and purchase
    at the same timestamp) are broken by event_id, identically in the
    oracle, so the pairing is total and deterministic."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts_us"))
    return (
        e.withColumn("last_view_id", F.last(view_id, ignorenulls=True).over(w))
        .withColumn("last_view_ts_us", F.last(view_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            "last_view_id",
            "last_view_ts_us",
            (F.col("ts_us") - F.col("last_view_ts_us")).alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


O_ASOF = """
WITH enriched AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type='view' THEN event_id END IGNORE NULLS) OVER w AS last_view_id,
         last_value(CASE WHEN event_type='view' THEN epoch_us(ts) END IGNORE NULLS) OVER w AS last_view_ts_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us,
       last_view_id, last_view_ts_us, ts_us - last_view_ts_us AS gap_us
FROM enriched WHERE event_type = 'purchase' ORDER BY purchase_id
"""


# --- bucketed range join (second driver-mandated custom operator) ---

RANGE_JOIN_SEC = 300


def range_self_join(e: DataFrame, width_us: int) -> DataFrame:
    """All same-user event pairs within ``width_us`` of each other,
    without the O(n²) theta-join: each probe row fans out to its time
    bucket ±1 (|Δts| <= width ⇒ |Δbucket| <= 1), the join is a pure
    equi-join on (user_id, bucket) — one hash shuffle — and the exact
    range predicate filters the candidates.  Each qualifying pair
    matches exactly one probe bucket, so no dedup pass is needed.

    Input: (event_id, user_id, ts_us); output pairs with id_a < id_b.
    """
    bucket = F.floor(F.col("ts_us") / width_us).cast("long")
    probe = e.withColumn(
        "bucket", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    ).alias("a")
    build = e.withColumn("bucket", bucket).alias("b")
    return (
        probe.join(
            build,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter(
            F.abs(F.col("a.ts_us") - F.col("b.ts_us")) <= F.lit(width_us)
        )
        .select(
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
            F.col("a.user_id").alias("user_id"),
            F.col("a.ts_us").alias("ts_a_us"),
            F.col("b.ts_us").alias("ts_b_us"),
        )
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within 5 minutes (bucketed range join)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return range_self_join(e, RANGE_JOIN_SEC * 1_000_000).orderBy("id_a", "id_b")


O_RANGE_JOIN = f"""
SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id AS user_id,
       epoch_us(a.ts) AS ts_a_us, epoch_us(b.ts) AS ts_b_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {RANGE_JOIN_SEC * 1_000_000}
ORDER BY id_a, id_b
"""


# --- hierarchical rollups (continuous-aggregate re-aggregation) ---

HOUR_SEC = 3600


def q_events_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour rollup computed FROM the 10-minute rollup, not from raw
    events — the continuous-aggregate / hypertable pattern: coarser
    grains re-aggregate finer ones, so the raw table is scanned once
    no matter how many grains exist.

    Correctness requires every aggregate to be decomposable: count and
    decimal-sum re-aggregate exactly (sum of sums); avg is carried as
    sum+count and finalized at the coarse grain.  The oracle computes
    the hour grain directly from raw events, so any re-aggregation
    error (double counting, lost partials, float drift) breaks the
    hash."""
    e = load_table(spark, sf_dir, "events")
    m10 = (
        e.groupBy(F.window("ts", f"{TUMBLE_SEC} seconds").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w10"),
            "event_type",
            "n_events",
            "sum_dec",
        )
    )
    return (
        m10.groupBy(
            (F.floor(F.col("w10") / HOUR_SEC) * HOUR_SEC)
            .cast("long")
            .alias("hour_start"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("total_value"),
            (F.sum("sum_dec").cast("double") / F.sum("n_events")).alias(
                "avg_value"
            ),
        )
        .orderBy("hour_start", "event_type")
    )


O_ROLLUP_HIERARCHY = f"""
SELECT CAST(floor(epoch(ts) / {HOUR_SEC}) * {HOUR_SEC} AS BIGINT) AS hour_start,
       event_type, COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- gap filling / densification (hypertable-style rollup surface) ---

def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 10-minute rollup per event_type: every (window, type) cell
    exists even when no events landed in it — counts zero-filled, plus a
    forward-filled "last observed sum" column (the time_bucket_gapfill /
    locf surface of timeseries stores).

    Shape: the sparse rollup is the usual keyed shuffle; the dense grid
    is sequence()+explode over the global [min,max] window bounds (a
    1-row cross join — no driver collect), and the fill is one window
    function per type.  Grid size is (span/step × types), independent of
    event count, so at 100 TB the dense side stays tiny while the sparse
    side scales."""
    e = load_table(spark, sf_dir, "events")
    sparse = (
        e.groupBy(F.window("ts", f"{TUMBLE_SEC} seconds").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    bounds = e.agg(
        (F.floor(F.unix_timestamp(F.min("ts")) / TUMBLE_SEC) * TUMBLE_SEC)
        .cast("long")
        .alias("lo"),
        (F.floor(F.unix_timestamp(F.max("ts")) / TUMBLE_SEC) * TUMBLE_SEC)
        .cast("long")
        .alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(TUMBLE_SEC))).alias("window_start")
    ).crossJoin(e.select("event_type").distinct())

    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(sparse, ["window_start", "event_type"], "left")
        .withColumn("locf_value", F.last("total_value", ignorenulls=True).over(w))
        .select(
            "window_start",
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
            "locf_value",
        )
        .orderBy("window_start", "event_type")
    )


O_GAP_FILL = f"""
WITH sparse AS (
  SELECT CAST(floor(epoch(ts) / {TUMBLE_SEC}) * {TUMBLE_SEC} AS BIGINT) AS window_start,
         event_type, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT CAST(floor(epoch(min(ts)) / {TUMBLE_SEC}) * {TUMBLE_SEC} AS BIGINT) AS lo,
         CAST(floor(epoch(max(ts)) / {TUMBLE_SEC}) * {TUMBLE_SEC} AS BIGINT) AS hi
  FROM events),
grid AS (
  SELECT g.window_start, t.event_type
  FROM (SELECT unnest(generate_series(lo, hi, {TUMBLE_SEC})) AS window_start
        FROM bounds) g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
SELECT g.window_start, g.event_type,
       COALESCE(s.n_events, 0) AS n_events,
       COALESCE(s.total_value, 0.0) AS total_value,
       last_value(s.total_value IGNORE NULLS)
         OVER (PARTITION BY g.event_type ORDER BY g.window_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM grid g LEFT JOIN sparse s
  ON s.window_start = g.window_start AND s.event_type = g.event_type
ORDER BY 1, 2
"""


# --- max concurrent sessions (ClickHouse maxIntersections analog) ---

def _max_intersections_sql(dialect: str) -> str:
    """Sweep-line over per-user session intervals: +1 at each session
    start, −1 after its end; the peak of the running sum is the maximum
    number of concurrent sessions, with the earliest micros timestamp
    at which it is attained (ClickHouse ``maxIntersections`` /
    ``maxIntersectionsPosition``).

    Intervals are closed (single-event sessions still count), enforced
    by ordering +1 before −1 at equal timestamps.  The sweep is the
    two-pass distributed prefix sum (same pattern as
    operators/pipeline.py): boundary rows bucket by UTC day, the running
    sum windows WITHIN each day (parallel across days), and each day
    adds the carried sum of all prior days' deltas.  The only global
    window runs over the per-day totals — |days| rows, bounded metadata
    (a decade of data is ~3.7k rows) — so no task ever sees more than
    one day's boundaries, and the 2·|sessions| global-sort single task
    of the naive formulation never exists.

    The peak (max concurrency + earliest micros attaining it) reads off
    ONE aggregate pass over the sweep via a lexicographic struct argmax
    — MAX((concurrent, −t)) — instead of a peak-subquery self-join,
    which would recompute the whole sweep subtree twice; n_sessions is
    COUNT(sweep)/2 (every session contributes exactly one +1 and one
    −1 boundary)."""
    eus = "unix_micros" if dialect == "spark" else "epoch_us"
    idiv = "div" if dialect == "spark" else "//"
    day_us = 86_400_000_000
    peak_struct = (
        "named_struct('c', concurrent, 'negt', -t)"
        if dialect == "spark"
        else "{'c': concurrent, 'negt': -t}"
    )
    # Spark inlines WITH-CTEs per reference, and exchange reuse dedups
    # only the scan+shuffle — the UNION ALL's TWO references of
    # `intervals`, times the two consumers of `boundaries`, re-ran the
    # whole session-derivation subtree (sort + 2 windows + 2
    # aggregates) FOUR times (r17, executed-plan dump).  One explode
    # per interval row halves the references and the total compute;
    # WALL time at sf0.1 is unchanged (best-of-6 fresh-session pair:
    # 1.117 vs 1.104 s — the 32-core box absorbs the duplicate
    # branches in idle capacity), so this is a total-work/§1.2 win
    # that pays at full cluster utilization, claimed as nothing more.
    # (An eager localCheckpoint collapsing the remaining 2× measured
    # SLOWER — the materialization job costs more than the saved
    # subtree.)  DuckDB materializes CTEs referenced more than once,
    # so the oracle keeps the UNION ALL.
    if dialect == "spark":
        boundaries_body = f"""  SELECT b.t, b.delta, b.t {idiv} {day_us} AS day FROM (
    SELECT explode(array(named_struct('t', st, 'delta', 1),
                         named_struct('t', en, 'delta', -1))) AS b
    FROM intervals)"""
    else:
        boundaries_body = f"""  SELECT t, delta, t {idiv} {day_us} AS day FROM (
    SELECT st AS t, 1 AS delta FROM intervals
    UNION ALL
    SELECT en, -1 FROM intervals)"""
    return f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN {eus}(ts) - {eus}(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   >= {SESSION_GAP_MIN * 60} * 1000000 OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events),
sessions AS (
  SELECT user_id, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked),
intervals AS (
  SELECT user_id, sid, {eus}(MIN(ts)) AS st, {eus}(MAX(ts)) AS en
  FROM sessions GROUP BY user_id, sid),
boundaries AS (
{boundaries_body}),
day_totals AS (
  SELECT day, SUM(delta) AS day_sum FROM boundaries GROUP BY day),
day_offsets AS (
  SELECT day,
         COALESCE(SUM(day_sum) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS carry
  FROM day_totals),
sweep AS (
  SELECT b.t, b.delta,
         SUM(b.delta) OVER (PARTITION BY b.day ORDER BY b.t, b.delta DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           + o.carry AS concurrent
  FROM boundaries b JOIN day_offsets o ON b.day = o.day)
SELECT CAST(MAX({peak_struct}).c AS BIGINT) AS max_concurrent,
       CAST(-MAX({peak_struct}).negt AS BIGINT) AS first_peak_us,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions
FROM sweep
"""


def q_events_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak session concurrency over the whole event stream (see
    :func:`_max_intersections_sql`)."""
    from clickhouse_vs_dbt_spark.catalog import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_max_intersections_sql("spark"))


# --- linear interpolation over gaps (WITH FILL INTERPOLATE analog) ---

def q_events_gap_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY ... WITH FILL INTERPOLATE`` analog: dense
    10-minute buckets per event_type where empty buckets get the
    *linear interpolation* between the nearest observed neighbors
    (LOCF's smooth sibling; boundary gaps take the nearest side).

    Shape: sparse keyed rollup + sequence() grid (as gap_fill), then
    two IGNORE NULLS window passes per type — previous and next
    observation with their bucket times — and one closed-form blend.
    All blend arithmetic is IEEE ops on identically-derived operands,
    so both engines produce bit-identical doubles.  Windows partition
    by type: parallel across series, never a global sort."""
    e = load_table(spark, sf_dir, "events")
    sparse = (
        e.groupBy(F.window("ts", f"{TUMBLE_SEC} seconds").alias("w"), "event_type")
        .agg(davg(F.col("value")).alias("obs"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "obs",
        )
    )
    bounds = e.agg(
        (F.floor(F.unix_timestamp(F.min("ts")) / TUMBLE_SEC) * TUMBLE_SEC)
        .cast("long")
        .alias("lo"),
        (F.floor(F.unix_timestamp(F.max("ts")) / TUMBLE_SEC) * TUMBLE_SEC)
        .cast("long")
        .alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(TUMBLE_SEC))).alias("window_start")
    ).crossJoin(e.select("event_type").distinct())

    from pyspark.sql import Window

    back = Window.partitionBy("event_type").orderBy("window_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # The forward scan is expressed as a DESCENDING running frame, not a
    # [CURRENT, UNBOUNDED FOLLOWING] frame: Spark evaluates
    # unbounded-following frames by re-scanning the remainder of the
    # partition per row (O(n²) per partition — measured 4× the whole
    # query's cost at sf0.1), while an unbounded-preceding frame keeps
    # O(1) running state per row in either sort direction.
    fwd = Window.partitionBy("event_type").orderBy(
        F.col("window_start").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs_ws = F.when(F.col("obs").isNotNull(), F.col("window_start"))
    joined = (
        grid.join(sparse, ["window_start", "event_type"], "left")
        .withColumn("pv", F.last("obs", ignorenulls=True).over(back))
        .withColumn("pw", F.last(obs_ws, ignorenulls=True).over(back))
        .withColumn("nv", F.last("obs", ignorenulls=True).over(fwd))
        .withColumn("nw", F.last(obs_ws, ignorenulls=True).over(fwd))
    )
    interp = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("window_start") - F.col("pw"))
               / (F.col("nw") - F.col("pw")))
        )
    )
    return (
        joined.select(
            "window_start",
            "event_type",
            (F.col("obs").isNotNull()).alias("observed"),
            F.round(interp, 6).alias("value_interp"),
        )
        .orderBy("window_start", "event_type")
    )


O_GAP_INTERPOLATE = f"""
WITH sparse AS (
  SELECT CAST(floor(epoch(ts) / {TUMBLE_SEC}) * {TUMBLE_SEC} AS BIGINT) AS window_start,
         event_type, {sql_davg('value')} AS obs
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT CAST(floor(epoch(min(ts)) / {TUMBLE_SEC}) * {TUMBLE_SEC} AS BIGINT) AS lo,
         CAST(floor(epoch(max(ts)) / {TUMBLE_SEC}) * {TUMBLE_SEC} AS BIGINT) AS hi
  FROM events),
grid AS (
  SELECT g.window_start, t.event_type
  FROM (SELECT unnest(generate_series(lo, hi, {TUMBLE_SEC})) AS window_start
        FROM bounds) g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
marked AS (
  SELECT g.window_start, g.event_type, s.obs,
         last_value(s.obs IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.window_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN s.obs IS NOT NULL THEN g.window_start END
                    IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.window_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pw,
         first_value(s.obs IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.window_start
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN s.obs IS NOT NULL THEN g.window_start END
                     IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.window_start
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nw
  FROM grid g LEFT JOIN sparse s
    ON s.window_start = g.window_start AND s.event_type = g.event_type)
SELECT window_start, event_type,
       obs IS NOT NULL AS observed,
       round(CASE WHEN obs IS NOT NULL THEN obs
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * ((window_start - pw)
                                         / CAST(nw - pw AS DOUBLE)) END,
             6) AS value_interp
FROM marked ORDER BY 1, 2
"""


# --- JSON property extraction (schema-on-read over events.props) ---

def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` column via ``from_json``
    (schema-on-read, JVM-side Jackson parse — the Spark analog of
    ClickHouse's JSONExtract*), then per-type aggregation of the
    extracted field."""
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events")
    props = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return (
        e.withColumn("k", props.getField("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


O_JSON_EXTRACT = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- LTTB downsampling (ClickHouse largestTriangleThreeBuckets) ---

LTTB_N_OUT = 24


def lttb_select(xs, ys, n_out: int):
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013;
    ClickHouse ships it as the ``largestTriangleThreeBuckets``
    aggregate).  Returns the indices of the selected points: endpoints
    always kept; the interior splits into ``n_out - 2`` buckets and
    each bucket contributes the point maximizing the triangle area
    with the previously selected point and the NEXT bucket's centroid.
    Ties break to the earliest index (strict ``>``), so the result is
    deterministic."""
    n = len(xs)
    if n_out >= n or n_out < 3:
        return list(range(n))
    idx = [0]
    buckets = n_out - 2
    # interior points 1..n-2 split into `buckets` near-equal ranges
    bounds = [1 + (n - 2) * i // buckets for i in range(buckets + 1)]
    prev = 0
    for b in range(buckets):
        lo, hi = bounds[b], bounds[b + 1]
        nlo, nhi = (bounds[b + 1], bounds[b + 2]) if b + 1 < buckets else (
            n - 1,
            n,
        )
        # the centroid division is multiplied through (area·cnt — a
        # positive scaling, argmax-invariant): with integer inputs
        # every operation below is EXACT integer arithmetic, which is
        # what lets the DuckDB oracle replay the identical pick chain
        # in HUGEINT (O_LTTB) instead of racing float rounding
        cnt = nhi - nlo
        sx = sum(xs[nlo:nhi])
        sy = sum(ys[nlo:nhi])
        ax, ay = xs[prev], ys[prev]
        best, best_area = lo, -1
        for i in range(lo, hi):
            area = abs(
                (ax * cnt - sx) * (ys[i] - ay)
                - (ax - xs[i]) * (sy - ay * cnt)
            )
            if area > best_area:
                best, best_area = i, area
        idx.append(best)
        prev = best
    idx.append(n - 1)
    return idx


def q_events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type LTTB downsample to LTTB_N_OUT visual points.

    Spark shape: the selection is inherently SEQUENTIAL within a
    series (each bucket's pick depends on the previous pick), so it
    runs as a keyed ``applyInPandas`` — one series per group, Arrow
    batches, state bounded by the series length, series processed in
    parallel across the cluster.  That is the 100 TB dashboard-render
    path: |series| × n_out output rows from arbitrarily long inputs.
    Ordering inside a series is (ts, event_id) — a total order, so
    the pick is deterministic under any partitioning.

    Rows-only gate by declared design: the bucket-sequential argmax
    chain is not expressible in DuckDB SQL (recursive CTEs disallow
    the per-step aggregate); the algorithm is instead value-pinned in
    tests/test_timeseries.py against a hand-computed case and
    structural invariants on the fixture."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # Arrow delivers datetime64[ns] (the serializer coerces to
        # nanoseconds); divide to the module's epoch-micros convention
        xs = (pdf["ts"].astype("int64") // 1000).tolist()
        # y in exact integer cents (values carry 2 decimals): the
        # whole pick chain is then integer-exact and replayable by
        # the recursive-CTE oracle — the scaling is argmax-invariant
        ys = [int(round(v * 100)) for v in pdf["value"]]
        keep = lttb_select(xs, ys, LTTB_N_OUT)
        out = pdf.iloc[keep][["event_type", "event_id", "value"]].copy()
        out["ts_us"] = [xs[i] for i in keep]
        out["out_idx"] = range(len(keep))
        return out[["event_type", "out_idx", "ts_us", "event_id", "value"]]

    return ev.select("event_type", "event_id", "ts", "value").groupBy(
        "event_type"
    ).applyInPandas(
        kernel,
        schema=(
            "event_type string, out_idx int, ts_us long, "
            "event_id long, value double"
        ),
    )


# LTTB oracle: the bucket-sequential pick chain replayed as a
# recursive CTE — the recursion carries (prev pick, prev x, prev y)
# per series and each step's argmax is a correlated ORDER BY/LIMIT 1
# subquery over the bucket (legal in DuckDB's recursive terms, unlike
# a bare aggregate).  All arithmetic is exact: x in epoch micros
# (BIGINT), y in cents, areas in HUGEINT via the multiplied-through
# centroid — bit-identical to the kernel's integer fold, so the gate
# hash-checks the full selection, not just row counts.
_LTTB_B = LTTB_N_OUT - 2
O_LTTB = f"""
WITH RECURSIVE base AS (
  SELECT event_type, epoch_us(ts) AS x,
         CAST(round(value * 100) AS BIGINT) AS yc,
         value, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) - 1 AS i
  FROM events),
nn AS (SELECT event_type, COUNT(*) AS n FROM base GROUP BY 1),
bs AS (
  SELECT nn.event_type, gs.b,
         1 + (nn.n - 2) * gs.b // {_LTTB_B} AS lo,
         1 + (nn.n - 2) * (gs.b + 1) // {_LTTB_B} AS hi,
         CASE WHEN gs.b < {_LTTB_B - 1}
              THEN 1 + (nn.n - 2) * (gs.b + 1) // {_LTTB_B}
              ELSE nn.n - 1 END AS nlo,
         CASE WHEN gs.b < {_LTTB_B - 1}
              THEN 1 + (nn.n - 2) * (gs.b + 2) // {_LTTB_B}
              ELSE nn.n END AS nhi
  FROM nn, (SELECT unnest(range({_LTTB_B})) AS b) gs),
cent AS (
  SELECT bo.event_type, bo.b,
         CAST(SUM(ba.x) AS HUGEINT) AS sx,
         CAST(SUM(ba.yc) AS HUGEINT) AS sy,
         CAST(COUNT(*) AS HUGEINT) AS cnt
  FROM bs bo JOIN base ba ON ba.event_type = bo.event_type
   AND ba.i >= bo.nlo AND ba.i < bo.nhi
  GROUP BY 1, 2),
walk AS (
  SELECT ba.event_type, -1 AS b, ba.i AS pick, ba.x AS px, ba.yc AS py
  FROM base ba WHERE ba.i = 0
  UNION ALL
  SELECT w.event_type, w.b + 1, p.i, p.x, p.yc
  FROM walk w JOIN base p
    ON p.event_type = w.event_type
   AND p.i = (
     SELECT ba.i
     FROM base ba, bs bo, cent ce
     WHERE ba.event_type = w.event_type
       AND bo.event_type = w.event_type AND bo.b = w.b + 1
       AND ce.event_type = w.event_type AND ce.b = w.b + 1
       AND ba.i >= bo.lo AND ba.i < bo.hi
     ORDER BY abs(
         (CAST(w.px AS HUGEINT) * ce.cnt - ce.sx)
           * CAST(ba.yc - w.py AS HUGEINT)
         - CAST(w.px - ba.x AS HUGEINT)
           * (ce.sy - CAST(w.py AS HUGEINT) * ce.cnt)
       ) DESC, ba.i ASC
     LIMIT 1)
  WHERE w.b < {_LTTB_B - 1}),
sel AS (
  SELECT event_type, b + 1 AS out_idx, pick FROM walk
  UNION ALL
  SELECT event_type, {LTTB_N_OUT - 1}, n - 1 FROM nn)
SELECT s.event_type, CAST(s.out_idx AS INT) AS out_idx,
       ba.x AS ts_us, ba.event_id, ba.value
FROM sel s JOIN base ba
  ON ba.event_type = s.event_type AND ba.i = s.pick
ORDER BY s.event_type, s.out_idx
"""

QUERIES = {
    "events_lttb_downsample": q_events_lttb_downsample,
    "events_tumbling_window": q_events_tumbling,
    "events_json_extract": q_events_json_extract,
    "events_sliding_window": q_events_sliding,
    "events_session_window": q_events_session,
    "events_gap_to_prev": q_events_gap_to_prev,
    "events_latest_per_user": q_events_latest_per_user,
    "events_argmax_state": q_events_argmax_state,
    "events_time_parts": q_events_time_parts,
    "events_gap_fill": q_events_gap_fill,
    "events_gap_interpolate": q_events_gap_interpolate,
    "events_max_intersections": q_events_max_intersections,
    "events_rollup_hierarchy": q_events_rollup_hierarchy,
    "events_asof_join": q_events_asof_join,
    "events_range_join": q_events_range_join,
}

ORACLES = {
    "events_lttb_downsample": O_LTTB,
    "events_tumbling_window": O_TUMBLING,
    "events_json_extract": O_JSON_EXTRACT,
    "events_sliding_window": O_SLIDING,
    "events_session_window": O_SESSION,
    "events_gap_to_prev": O_GAP,
    "events_latest_per_user": O_LATEST_PER_USER,
    "events_argmax_state": O_ARGMAX_STATE,
    "events_time_parts": O_TIME_PARTS,
    "events_gap_fill": O_GAP_FILL,
    "events_gap_interpolate": O_GAP_INTERPOLATE,
    "events_max_intersections": _max_intersections_sql("duckdb"),
    "events_rollup_hierarchy": O_ROLLUP_HIERARCHY,
    "events_asof_join": O_ASOF,
    "events_range_join": O_RANGE_JOIN,
}
