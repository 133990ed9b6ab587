"""Stream–static enrichment join.

The streaming inventory covers stream-stream (interval join), stateful
sessions, dedup, and watermark semantics; the remaining everyday shape
is the *enrichment* join — an unbounded event stream joined to a slowly
changing dimension table.  In Spark this is a first-class plan: the
static side is planned per micro-batch like any batch relation, so a
small dimension rides a broadcast-hash join and the stream side never
shuffles — at 100 TB/day of events this is THE pattern that keeps
enrichment map-side (re-broadcast on dimension refresh is the
micro-batch analog of ClickHouse's dictionary reload).

The fixture join key: ``events.user_id`` ⊂ ``customer.c_custkey``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.common import dsum, sql_dsum
from clickhouse_vs_dbt_spark.streaming.events_stream import streaming_events


def run_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed events ⋈ broadcast(static customer) → per-segment
    totals (complete mode, memory sink, fixture fully replayed)."""
    import uuid

    events = streaming_events(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
    )
    agg = (
        events.join(dim, events.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )
    sink = f"enrich_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(sink).orderBy("c_mktsegment")


O_ENRICH = f"""
SELECT c_mktsegment, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

QUERIES = {"events_stream_enrich": run_enrich_stream}
ORACLES = {"events_stream_enrich": O_ENRICH}
