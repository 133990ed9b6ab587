"""Semantic checks for the window-function breadth suite."""

from __future__ import annotations

from collections import defaultdict

from clickhouse_vs_dbt_spark.operators import windowfns


def test_frame_suite_offsets_consistent(spark, sf_dir):
    rows = windowfns.q_window_frame_suite(spark, sf_dir).collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r.o_custkey].append(r)
    some_multi = 0
    for grp in by_cust.values():
        grp.sort(key=lambda r: r.pct_rank)  # window (date) order, not orderkey order
        assert grp[0].prev_price is None
        assert grp[-1].next_price is None
        assert grp[0].pct_rank == 0.0
        assert abs(grp[-1].cume - 1.0) < 1e-12
        if len(grp) >= 2:
            some_multi += 1
            # lead of row i equals the price implied by prev of row i+1's lag
            assert grp[1].prev_price is not None
            assert grp[0].second_price is None  # frame has 1 row at first row
    assert some_multi > 0


def test_trailing_30d_bounds(spark, sf_dir):
    rows = windowfns.q_window_trailing_30d(spark, sf_dir).collect()
    for r in rows:
        assert r.trail30_orders >= 1
        assert r.trail30_spend > 0.0


def test_lateral_top_orders_capped(spark, sf_dir):
    rows = windowfns.q_lateral_top_orders(spark, sf_dir).collect()
    per_cust = defaultdict(list)
    for r in rows:
        per_cust[r.c_custkey].append(r.o_totalprice)
    for prices in per_cust.values():
        assert 1 <= len(prices) <= windowfns.LATERAL_TOP_K
        assert prices == sorted(prices, reverse=True)
