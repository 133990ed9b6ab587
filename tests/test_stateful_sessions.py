"""The applyInPandasWithState sessionizer must equal the batch
session_window operator row-for-row (same gap rule, same decimal-exact
sums), including sessions that span micro-batch boundaries."""

import os

from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators.timeseries import q_events_session
from clickhouse_vs_dbt_spark.streaming.stateful_sessions import (
    _chunked_replay_dir,
    run_session_stream,
)

SF_DIR = "/root/testdata/sf0.01"


def _synthetic_sf_dir(spark, tmp_path) -> str:
    """A tiny events table whose sessions MUST straddle any 4-way
    time-range chunking: user 1 fires every 10 minutes for 6 hours (one
    long session covering the whole span), user 2 every 50 minutes
    (all singleton sessions).  ts is int64 nanos like the fixture."""
    base = 1_600_000_000 * 1_000_000_000
    rows = [
        (k, base + k * 600 * 10**9, 1, "click", float(k) + 0.25, "{}")
        for k in range(37)
    ] + [
        (100 + k, base + k * 3000 * 10**9, 2, "view", 0.5, "{}")
        for k in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    d = str(tmp_path / "synth_sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_stream_sessions_equal_batch_synthetic(spark, tmp_path):
    """Deterministic cross-batch case: one session spans every chunk
    boundary, so state must survive micro-batches and merge."""
    d = _synthetic_sf_dir(spark, tmp_path)
    replay = _chunked_replay_dir(spark, d)
    parts = sorted(f for f in os.listdir(replay) if f.startswith("part-"))
    nonempty = [
        p
        for p in parts
        if spark.read.parquet(f"{replay}/{p}").limit(1).count() > 0
    ]
    assert len(nonempty) >= 2  # genuinely multi-batch

    streamed = run_session_stream(spark, d).collect()
    batch = q_events_session(spark, d).collect()
    key = lambda r: (r.user_id, r.session_start_us, r.n_events, round(r.total_value, 6))
    assert [key(r) for r in streamed] == [key(r) for r in batch]
    # user 1 = one 6-hour session (37 events); user 2 = 8 singletons
    assert [key(r) for r in streamed if r.user_id == 1][0][2] == 37
    assert len([r for r in streamed if r.user_id == 2]) == 8


def test_stream_sessions_equal_batch_fixture(spark):
    streamed = run_session_stream(spark, SF_DIR).collect()
    batch = q_events_session(spark, SF_DIR).collect()
    assert len(streamed) == len(batch) > 0
    skey = [(r.user_id, r.session_start_us, r.n_events, round(r.total_value, 6)) for r in streamed]
    bkey = [(r.user_id, r.session_start_us, r.n_events, round(r.total_value, 6)) for r in batch]
    assert skey == bkey
