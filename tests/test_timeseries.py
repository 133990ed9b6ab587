"""Event-time window operators (SURVEY.md §2.3) — semantics pinned on
tiny in-memory frames; fixture-level totals cross-checked."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators import timeseries


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_tumbling_window_assignment(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    df = _events(
        spark,
        [
            (1, t0, 1, "a", 1.0),
            (2, t0 + datetime.timedelta(seconds=599), 1, "a", 1.0),
            (3, t0 + datetime.timedelta(seconds=600), 1, "a", 1.0),  # next window
        ],
    )
    out = (
        df.groupBy(F.window("ts", "600 seconds").alias("w"))
        .count()
        .select(F.unix_timestamp("w.start").alias("s"), "count")
        .orderBy("s")
        .collect()
    )
    assert [(r.s % 600, r["count"]) for r in out] == [(0, 2), (0, 1)]


def test_sliding_window_multiplicity(spark, sf_dir):
    # every event lands in exactly size/slide = 2 sliding windows
    tumb = timeseries.q_events_tumbling(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]
    slide = timeseries.q_events_sliding(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]
    assert slide == 2 * tumb


def test_session_window_gap_split(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    gap = timeseries.SESSION_GAP_MIN
    df = _events(
        spark,
        [
            (1, t0, 7, "a", 1.0),
            (2, t0 + datetime.timedelta(minutes=gap - 1), 7, "a", 1.0),  # same session
            # next event is gap-1 min after the PREVIOUS event → still same session
            (3, t0 + datetime.timedelta(minutes=2 * gap - 3), 7, "a", 1.0),
            # > gap after event 3 → new session
            (4, t0 + datetime.timedelta(minutes=3 * gap + 1), 7, "a", 1.0),
        ],
    )
    out = (
        df.groupBy(F.session_window("ts", f"{gap} minutes"), "user_id")
        .count()
        .collect()
    )
    assert sorted(r["count"] for r in out) == [1, 3]


def test_gap_to_prev_first_event_null(spark, sf_dir):
    out = timeseries.q_events_gap_to_prev(spark, sf_dir)
    per_user_nulls = (
        out.groupBy("user_id")
        .agg(F.sum(F.col("gap_us").isNull().cast("long")).alias("nulls"))
        .collect()
    )
    # exactly one NULL gap (the first event) per user
    assert all(r.nulls == 1 for r in per_user_nulls)
    nonneg = out.filter(F.col("gap_us") < 0).count()
    assert nonneg == 0


def test_range_self_join_boundaries(spark):
    """Bucket-edge cases: pair exactly at the width (included), one
    microsecond past (excluded), cross-bucket pair, different users."""
    from clickhouse_vs_dbt_spark.operators.timeseries import range_self_join

    W = 300 * 1_000_000
    rows = [
        # (event_id, user_id, ts_us)
        (1, 1, 0),
        (2, 1, W),          # exactly width from id 1 -> included
        (3, 1, 2 * W + 1),  # W+1 from id 2 -> excluded
        (4, 1, 2 * W + 2),  # 1us from id 3 -> included (crosses no bucket)
        (5, 2, W + 1),      # different user, close to id 2 -> excluded
        (6, 1, 3 * W - 1),  # W-3 from id 4: crosses bucket boundary -> included
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
    got = sorted(
        (r.id_a, r.id_b) for r in range_self_join(df, W).collect()
    )
    assert got == [(1, 2), (3, 4), (3, 6), (4, 6)]


def test_rollup_hierarchy_preserves_mass_and_matches_direct(spark, sf_dir):
    import pyspark.sql.functions as F

    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.operators.timeseries import (
        HOUR_SEC,
        q_events_rollup_hierarchy,
    )

    roll = q_events_rollup_hierarchy(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    assert roll.agg(F.sum("n_events")).collect()[0][0] == e.count()

    # re-aggregated hour grain == hour grain computed directly from raw
    direct = (
        e.groupBy(
            (F.floor(F.unix_timestamp("ts") / HOUR_SEC) * HOUR_SEC)
            .cast("long")
            .alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("hour_start", "event_type")
    )
    got = [(r.hour_start, r.event_type, r.n_events) for r in roll.collect()]
    want = [(r.hour_start, r.event_type, r.n_events) for r in direct.collect()]
    assert got == want


def test_max_intersections_bounds(spark, sf_dir):
    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.operators import timeseries

    r = timeseries.q_events_max_intersections(spark, sf_dir).first()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # concurrency is at most one open session per user, at least 1
    assert 1 <= r.max_concurrent <= n_users
    assert r.n_sessions >= n_users


def test_lttb_hand_case():
    """6 points → 4: endpoints + the per-bucket max-area picks, worked
    by hand (areas 16.25 vs 2.5 in bucket 1; 11 vs 3.5 in bucket 2)."""
    from clickhouse_vs_dbt_spark.operators.timeseries import lttb_select

    xs = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [0.0, 10.0, 0.0, 0.0, 5.0, 1.0]
    assert lttb_select(xs, ys, 4) == [0, 1, 3, 5]
    # degenerate sizes: everything kept
    assert lttb_select(xs, ys, 6) == list(range(6))
    assert lttb_select(xs, ys, 10) == list(range(6))


def test_lttb_downsample_invariants(spark, sf_dir):
    """Per series: exactly min(N_OUT, n) rows, endpoints kept, output
    points are actual input points, ts non-decreasing."""
    from clickhouse_vs_dbt_spark.operators.timeseries import (
        LTTB_N_OUT,
        q_events_lttb_downsample,
    )
    from clickhouse_vs_dbt_spark.catalog import load_table
    import pyspark.sql.functions as F

    out = q_events_lttb_downsample(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    assert set(by_type) == set(per_type)
    ev_rows = {
        (r.event_type, r.event_id): r
        for r in ev.select("event_type", "event_id", "value").collect()
    }
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r.out_idx)
        assert len(rows) == min(LTTB_N_OUT, per_type[et])
        ts_list = [r.ts_us for r in rows]
        assert ts_list == sorted(ts_list)
        # ts_us really is MICROseconds (regression: Arrow hands the
        # kernel datetime64[ns], which is 1000x off unless divided)
        micros = {
            (r.event_type, r.event_id): r.us
            for r in ev.selectExpr(
                "event_type", "event_id", "unix_micros(ts) AS us"
            ).collect()
        }
        for r in rows:
            assert micros[(et, r.event_id)] == r.ts_us
        for r in rows:  # every output is a real input point
            assert (et, r.event_id) in ev_rows
            assert ev_rows[(et, r.event_id)].value == r.value
