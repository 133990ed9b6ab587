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
from clickhouse_vs_dbt_spark.operators.common import dsum, sql_dsum

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


QUERIES = {
    "events_tumbling_window": q_events_tumbling,
    "events_sliding_window": q_events_sliding,
    "events_session_window": q_events_session,
    "events_gap_to_prev": q_events_gap_to_prev,
}

ORACLES = {
    "events_tumbling_window": O_TUMBLING,
    "events_sliding_window": O_SLIDING,
    "events_session_window": O_SESSION,
    "events_gap_to_prev": O_GAP,
}
