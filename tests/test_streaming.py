"""Structured Streaming tumbling window must equal the batch operator
row-for-row (one window-semantics definition, two execution modes)."""

from __future__ import annotations

from clickhouse_vs_dbt_spark.operators.timeseries import q_events_tumbling
from clickhouse_vs_dbt_spark.streaming.events_stream import run_tumbling_stream


def test_stream_equals_batch(spark, sf_dir):
    batch = q_events_tumbling(spark, sf_dir).collect()
    stream = run_tumbling_stream(spark, sf_dir).collect()
    assert len(stream) == len(batch)
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))
