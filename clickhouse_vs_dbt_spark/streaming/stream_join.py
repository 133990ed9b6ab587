"""Stream-stream interval join (Structured Streaming).

Two event streams — views and purchases, both watermarked — joined on
user with a time-range condition (purchase within 30 minutes after the
view).  This is the streaming join shape Spark executes with symmetric
hash join state on both sides; the watermark + range condition bound
how long each side's rows are retained (state TTL = range upper bound +
watermark delay), which is what makes the operator runnable forever on
unbounded input.

The fixture replay reuses the chronological chunked dir from
stateful_sessions (mtime-ordered range chunks + far-future sentinel;
the sentinel's user_id=-1 matches nothing but advances both watermarks
so state drains).  An INNER interval join emits each match as soon as
both rows have arrived, so the replayed result equals the batch join —
the oracle is the plain SQL interval join over the same table.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_vs_dbt_spark.streaming.stateful_sessions import _chunked_replay_dir

JOIN_WINDOW_MIN = 30

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def run_interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    replay_dir = _chunked_replay_dir(spark, sf_dir)

    def stream() -> DataFrame:
        return (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "*.parquet")
            .parquet(replay_dir)
        )

    views = (
        stream()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 minute")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_MIN} MINUTES")),
        "inner",
    ).select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        F.unix_micros("v_ts").alias("view_ts_us"),
        F.unix_micros("p_ts").alias("purchase_ts_us"),
    )
    name = f"sjoin_{uuid.uuid4().hex[:8]}"
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("view_id", "purchase_id")


def q_events_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable wrapper; the oracle is the batch interval join."""
    return run_interval_join_stream(spark, sf_dir)


O_STREAM_INTERVAL_JOIN = f"""
SELECT v.event_id AS view_id, p.event_id AS purchase_id,
       v.user_id AS user_id,
       epoch_us(v.ts) AS view_ts_us, epoch_us(p.ts) AS purchase_ts_us
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(v.ts)
 AND epoch_us(p.ts) <= epoch_us(v.ts) + {JOIN_WINDOW_MIN * 60 * 1_000_000}
ORDER BY view_id, purchase_id
"""

QUERIES = {"events_stream_interval_join": q_events_stream_interval_join}
ORACLES = {"events_stream_interval_join": O_STREAM_INTERVAL_JOIN}
