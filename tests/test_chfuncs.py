"""Semantic checks for the ClickHouse analytics-function family."""

from __future__ import annotations

from clickhouse_vs_dbt_spark.operators import chfuncs


def test_funnel_levels_partition_users(spark, sf_dir):
    rows = chfuncs.q_events_funnel_window(spark, sf_dir).collect()
    levels = {r.level for r in rows}
    assert levels <= {0, 1, 2, 3}
    # every user lands in exactly one level
    n_users = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users


def test_retention_day0_covers_all_users(spark, sf_dir):
    rows = chfuncs.q_events_retention_matrix(spark, sf_dir).collect()
    n_users = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    day0 = sum(r.n_users for r in rows if r.day_offset == 0)
    assert day0 == n_users  # everyone is active on their own cohort day
    for off in (1, 7):
        assert sum(r.n_users for r in rows if r.day_offset == off) <= day0


def test_sequence_match_three_step_implies_two_step(spark, sf_dir):
    for r in chfuncs.q_events_sequence_match(spark, sf_dir).collect():
        assert r.has_vp in (0, 1) and r.has_vcp in (0, 1)
        if r.has_vcp:
            # view→click→purchase contains view→purchase
            assert r.has_vp


def test_group_array_caps_at_k(spark, sf_dir):
    for r in chfuncs.q_events_group_array(spark, sf_dir).collect():
        types = r.first_types.split(",")
        assert len(types) == min(r.n_events, chfuncs.GROUP_ARRAY_K)
        assert set(types) <= {"click", "error", "purchase", "signup", "view"}


def test_bit_aggregates_bounds(spark, sf_dir):
    for r in chfuncs.q_events_bit_aggregates(spark, sf_dir).collect():
        # AND ⊆ XOR-support ⊆ OR as bitmasks
        assert r.k_and & r.k_or == r.k_and
        assert r.k_xor & r.k_or == r.k_xor


def test_cond_agg_consistency(spark, sf_dir):
    for r in chfuncs.q_events_cond_agg_suite(spark, sf_dir).collect():
        if r.n_hot:
            assert r.min_hot > chfuncs.COND_THRESHOLD
            assert r.min_hot <= r.max_hot
            assert r.uniq_hot_users <= r.n_hot


def test_sequence_count_bounds(spark, sf_dir):
    rows = chfuncs.q_events_sequence_count(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # greedy non-overlapping pairs can never exceed either side
        assert 0 <= r.n_pairs <= min(r.n_views, r.n_purchases)
    # fixture has both event types, so some user pairs them
    assert any(r.n_pairs > 0 for r in rows)


def test_strict_order_funnel_aborts_on_interleave(spark, sf_dir):
    """view→click→other→purchase must stop at level 2 (the interleaved
    event aborts, per strict_order), while view→click→purchase reaches
    3 and view→other→click stops at 1."""
    import datetime

    from clickhouse_vs_dbt_spark.operators.chfuncs import (
        q_events_funnel_strict_order,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []

    def add(uid, seq):
        for i, et in enumerate(seq):
            rows.append(
                (len(rows), base + datetime.timedelta(seconds=i), uid, et, 0.0)
            )

    add(1, ["view", "click", "error", "purchase"])  # -> 2
    add(2, ["view", "click", "purchase"])           # -> 3
    add(3, ["view", "error", "click"])              # -> 1
    add(4, ["error", "view", "click"])              # pre-anchor noise ok -> 2
    add(5, ["click", "purchase"])                   # never anchors -> 0
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    df.createOrReplaceTempView("events")
    # run the same fold logic directly over the temp view via the query
    # helper's SQL pieces: reuse the gated function against a fake sf_dir
    # by monkeypatching load_table is heavier than just re-deriving:
    from clickhouse_vs_dbt_spark.operators import chfuncs as m
    from pyspark.sql import functions as F

    elem = (
        "(unix_micros(ts) div 1000000) * 10 + "
        "CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 "
        "WHEN 'purchase' THEN 3 ELSE 0 END AS BIGINT)"
    )
    fold = (
        "aggregate("
        f"transform(sort_array(collect_list(struct(ts, event_id, {elem}))), "
        "t -> t.col3), CAST(0 AS BIGINT), "
        f"{m._strict_funnel_fold('spark')})"
    )
    got = {
        r.user_id: r.level
        for r in df.groupBy("user_id")
        .agg(F.expr(f"({fold} % 100) div 10").alias("level"))
        .collect()
    }
    assert got == {1: 2, 2: 3, 3: 1, 4: 2, 5: 0}
