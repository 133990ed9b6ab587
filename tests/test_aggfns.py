"""ClickHouse aggregate-analog edge cases (operators/aggfns.py):
interval-union overlap handling, delta-sum monotonicity, Spearman
extremes, combinator caps."""

from __future__ import annotations

import datetime

from clickhouse_vs_dbt_spark.operators import aggfns


def _events(spark, rows):
    """(event_id, ts, user_id, event_type, value) mini event fixtures."""
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=sec), uid, et, float(v))
            for i, (sec, uid, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_interval_union_counts_overlaps_once(spark):
    # two events 1s apart: union is 300s + 1s, NOT 600s
    _events(spark, [(0, 1, "a", 1.0), (1, 1, "a", 2.0)]).createOrReplaceTempView(
        "events"
    )
    r = spark.sql(aggfns._interval_length_sql("spark")).collect()[0]
    assert r.covered_us == aggfns.INTERVAL_US + 1_000_000
    assert r.n_intervals == 2


def test_interval_union_disjoint_adds(spark):
    # 400s apart > 300s window: two disjoint intervals
    _events(spark, [(0, 1, "a", 1.0), (400, 1, "a", 2.0)]).createOrReplaceTempView(
        "events"
    )
    r = spark.sql(aggfns._interval_length_sql("spark")).collect()[0]
    assert r.covered_us == 2 * aggfns.INTERVAL_US


def test_delta_sum_only_positive_steps(spark):
    # 1 → 3 (+2) → 2 (ignored) → 5 (+3) = 5
    _events(
        spark, [(0, 1, "a", 1.0), (1, 1, "a", 3.0), (2, 1, "a", 2.0), (3, 1, "a", 5.0)]
    ).createOrReplaceTempView("events")
    r = spark.sql(aggfns._delta_sum_sql("spark")).collect()[0]
    assert r.delta_sum == 5.0


def test_delta_sum_carry_crosses_day_boundary(spark):
    # 1 → 3 (+2) on day 1; day 2 opens with 2 (3→2 ignored, carried
    # across the bucket boundary) then 5 (+3).  Total = 5.
    day2 = 86_400
    _events(
        spark,
        [(0, 1, "a", 1.0), (1, 1, "a", 3.0),
         (day2, 1, "a", 2.0), (day2 + 1, 1, "a", 5.0)],
    ).createOrReplaceTempView("events")
    r = spark.sql(aggfns._delta_sum_sql("spark")).collect()[0]
    assert r.delta_sum == 5.0
    assert r.n == 4


def test_spearman_ties_use_average_ranks(spark):
    # x = (1,1,2), y ranks = (1,2,3): avg-tie ranks give
    # rho = 1.5 / sqrt(1.5 * 2) = 0.866025 (hand-computed)
    _events(
        spark, [(0, 1, "a", 1.0), (1, 1, "a", 1.0), (2, 1, "a", 2.0)]
    ).createOrReplaceTempView("events")
    r = aggfns.run_rank_corr(spark).collect()[0]
    assert r.spearman_rho == 0.866025


def test_spearman_extremes(spark):
    # value strictly increasing with ts → rho = 1; strictly decreasing → -1
    inc = [(s, 1, "up", s) for s in range(1, 6)]
    dec = [(s, 1, "down", 10 - s) for s in range(1, 6)]
    _events(spark, inc + dec).createOrReplaceTempView("events")
    rows = {r.event_type: r.spearman_rho for r in
            aggfns.run_rank_corr(spark).collect()}
    assert rows == {"up": 1.0, "down": -1.0}


def test_uniq_up_to_caps(spark):
    # 6 distinct users but uniqUpTo(3) reports at most 4 (= K+1)
    _events(spark, [(s, s, "a", 1.0) for s in range(6)]).createOrReplaceTempView(
        "events"
    )
    r = spark.sql(aggfns._combinators_sql("spark")).collect()[0]
    assert r.uniq_up_to_3 == 4


def test_sum_map_merges_keys(spark):
    _events(
        spark, [(0, 1, "a", 1.5), (1, 1, "b", 2.0), (2, 1, "a", 0.5)]
    ).createOrReplaceTempView("events")
    r = spark.sql(aggfns._sum_map_sql("spark")).collect()[0]
    assert r.n_keys == 2
    assert r.sum_map == "a:2.000000,b:2.000000"
    assert r.min_map == "a:0.500000,b:2.000000"
    assert r.max_map == "a:1.500000,b:2.000000"
