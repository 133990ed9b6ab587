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
