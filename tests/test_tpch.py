"""Adapted TPC-H flight: result sanity + physical plan shape."""

from __future__ import annotations

from clickhouse_vs_dbt_spark.operators import tpch


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_predicates_push_into_scan(spark, sf_dir):
    df = tpch.q_tpch_q6(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    rows = df.collect()
    assert len(rows) == 1 and rows[0].revenue > 0
    # the date/discount/quantity filters must sit on the scan, pushed
    # below the aggregate (PushedFilters shows in the scan node)
    assert "PushedFilters: [" in _plan(df)


def test_q3_topk_uses_heap_not_global_sort(spark, sf_dir):
    df = tpch.q_tpch_q3(spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)
    rows = df.collect()
    assert len(rows) == 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_locality_join_and_order(spark, sf_dir):
    rows = tpch.q_tpch_q5(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 25  # at most one row per nation
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_broadcasts_nation_region(spark, sf_dir):
    plan = _plan(tpch.q_tpch_q5(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_q18_having_threshold(spark, sf_dir):
    rows = tpch.q_tpch_q18(spark, sf_dir).collect()
    assert rows, "sf0.01 should contain orders with total_qty > 250"
    assert all(r.total_qty > 250 for r in rows)


def test_q14_pct_bounded(spark, sf_dir):
    r = tpch.q_tpch_q14(spark, sf_dir).collect()[0]
    assert 0.0 <= r.promo_pct <= 100.0


def test_q7_bilateral_pairs_only(spark, sf_dir):
    rows = tpch.q_tpch_q7(spark, sf_dir).collect()
    pair = {"NATION_1", "NATION_2"}
    for r in rows:
        assert {r.supp_nation, r.cust_nation} == pair
        assert r.l_year in (1996, 1997)
        assert r.revenue > 0


def test_q8_share_bounded(spark, sf_dir):
    for r in tpch.q_tpch_q8(spark, sf_dir).collect():
        assert 0.0 <= r.mkt_share <= 1.0


def test_q12_counts_partition_late_lines(spark, sf_dir):
    rows = tpch.q_tpch_q12(spark, sf_dir).collect()
    for r in rows:
        assert r.high_line_count >= 0 and r.low_line_count >= 0
        assert r.high_line_count + r.low_line_count > 0


def test_q13_distribution_covers_all_customers(spark, sf_dir):
    from clickhouse_vs_dbt_spark.catalog import load_table

    rows = tpch.q_tpch_q13(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust


def test_q17_single_scalar(spark, sf_dir):
    rows = tpch.q_tpch_q17(spark, sf_dir).collect()
    assert len(rows) == 1  # global aggregate, possibly null on tiny sf


def test_q22_dormant_segments_positive(spark, sf_dir):
    # every counted customer is above the average positive balance, so
    # each segment's count and balance total must be strictly positive
    for r in tpch.q_tpch_q22(spark, sf_dir).collect():
        assert r.numcust > 0 and r.totacctbal > 0


def test_q15_returns_the_global_max(spark, sf_dir):
    rows = tpch.q_tpch_q15(spark, sf_dir).collect()
    assert rows  # at least one supplier ships in the quarter
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # all returned rows tie at the maximum


def test_q21_semi_anti_combination(spark, sf_dir):
    rows = tpch.q_tpch_q21(spark, sf_dir).collect()
    assert len(rows) <= 20
    for r in rows:
        assert r.numwait >= 1
    waits = [r.numwait for r in rows]
    assert waits == sorted(waits, reverse=True)
