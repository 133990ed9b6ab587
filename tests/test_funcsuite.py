"""Scalar/window function breadth suite + argMax-state parity."""

from __future__ import annotations

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators import funcsuite
from clickhouse_vs_dbt_spark.operators.timeseries import (
    q_events_argmax_state,
    q_events_latest_per_user,
)


def test_string_suite_values(spark, sf_dir):
    rows = {r.c_custkey: r for r in funcsuite.q_string_functions(spark, sf_dir).collect()}
    r0 = rows[0]
    assert r0.up == "CUSTOMER#000000000"
    assert r0.prefix8 == "Customer"
    assert r0.padded_key == "0000000000"
    assert r0.squeezed == "Customer#0"
    assert r0.hash_pos == 9
    assert r0.num_part == "000000000"
    assert r0.rev == "Customer#000000000"[::-1]


def test_ntile_buckets_are_balanced(spark, sf_dir):
    rows = funcsuite.q_ntile_quartiles(spark, sf_dir).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg, qs in by_seg.items():
        ns = [q.n for q in sorted(qs, key=lambda x: x.quartile)]
        assert max(ns) - min(ns) <= 1  # ntile remainder rule
        # quartile boundaries are monotone in balance
        mins = [q.min_bal for q in sorted(qs, key=lambda x: x.quartile)]
        assert mins == sorted(mins)


def test_math_suite_bounds(spark, sf_dir):
    for r in funcsuite.q_math_functions(spark, sf_dir).collect():
        assert r.sum_sqrt_qty > 0
        assert r.min_floor_price <= r.max_ceil_price
        assert r.sum_least <= r.sum_greatest


def test_ship_latency_nonnegative_and_complete(spark, sf_dir):
    rows = funcsuite.q_ship_latency_histogram(spark, sf_dir).collect()
    n_lines = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_lines for r in rows) == n_lines
    # each bucket's average must sit inside the bucket's day range
    # (holds for negative weeks too — floor semantics)
    for r in rows:
        assert 7 * r.lat_weeks <= r.avg_days < 7 * (r.lat_weeks + 1)


def test_argmax_state_agrees_with_window_form(spark, sf_dir):
    """max_by aggregate and row_number window must pick identical
    winners — two physical plans, one semantics."""
    agg = {
        r.user_id: (r.last_event_type, r.last_value)
        for r in q_events_argmax_state(spark, sf_dir).collect()
    }
    win = {
        r.user_id: (r.event_type, r.value)
        for r in q_events_latest_per_user(spark, sf_dir).collect()
    }
    assert agg == win
