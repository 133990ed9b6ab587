"""Semantic checks for the statistical aggregate suite."""

from __future__ import annotations

import math

from clickhouse_vs_dbt_spark.operators import stats


def test_moments_against_numpy(spark, sf_dir):
    rows = stats.q_stats_moments(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    import numpy as np

    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_quantity, r.l_extendedprice)
        )
    assert len(rows) == len(by_flag)
    for r in rows:
        xs = np.array([x for x, _ in by_flag[r.l_returnflag]])
        ys = np.array([y for _, y in by_flag[r.l_returnflag]])
        assert r.n == len(xs)
        assert math.isclose(r.mean_qty, xs.mean(), rel_tol=1e-9)
        assert math.isclose(r.var_pop_qty, xs.var(), rel_tol=1e-9)
        assert math.isclose(r.stddev_pop_qty, xs.std(), rel_tol=1e-9)
        m = xs.mean()
        skew = ((xs - m) ** 3).mean() / xs.std() ** 3
        kurt = ((xs - m) ** 4).mean() / xs.var() ** 2
        assert math.isclose(r.skew_qty, skew, rel_tol=1e-6)
        assert math.isclose(r.kurt_qty, kurt, rel_tol=1e-6)
        cov = ((xs - m) * (ys - ys.mean())).mean()
        assert math.isclose(r.covar_pop, cov, rel_tol=1e-6)
        corr = cov / (xs.std() * ys.std())
        assert math.isclose(r.corr_qty_price, corr, rel_tol=1e-6)


def test_weighted_median_definition(spark, sf_dir):
    rows = stats.q_weighted_median(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    by_flag = {}
    for r in li:
        wt = int(math.floor(r.l_extendedprice * 100.0 + 0.5))
        by_flag.setdefault(r.l_returnflag, []).append((r.l_quantity, wt))
    for r in rows:
        pairs = sorted(by_flag[r.l_returnflag])
        tot = sum(w for _, w in pairs)
        cum = 0
        for x, w in pairs:
            cum += w
            if cum * 2 >= tot:
                assert r.wmedian_qty == x
                break


def test_ema_first_row_and_bounds(spark, sf_dir):
    rows = stats.q_events_ema(spark, sf_dir).collect()
    series = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    for grp in series.values():
        grp.sort(key=lambda r: r.d)
        # first row: no history, EMA == the count itself
        assert math.isclose(grp[0].ema20, float(grp[0].c), abs_tol=1e-6)
        # EMA stays within min/max of the trailing 20 counts
        for i, r in enumerate(grp):
            window = [g.c for g in grp[max(0, i - 19) : i + 1]]
            assert min(window) - 1e-6 <= r.ema20 <= max(window) + 1e-6


def test_linreg_r2_in_unit_interval(spark, sf_dir):
    from clickhouse_vs_dbt_spark.operators import stats

    for r in stats.q_linreg_price_on_qty(spark, sf_dir).collect():
        assert 0.0 <= r.r2 <= 1.0
        # fit must reproduce the group mean: mean_y == k * mean_x + b
        # (exact identity of the closed form; checked via finite values)
        assert abs(r.k) < 1e6 and abs(r.b) < 1e9


def test_welch_ttest_shape(spark, sf_dir):
    from clickhouse_vs_dbt_spark.operators import stats

    r = stats.q_welch_ttest(spark, sf_dir).first()
    assert r.na > 1 and r.nb > 1
    assert r.welch_df > 0
    # df is bounded by na+nb-2 (equality only when variances scale equally)
    assert r.welch_df <= r.na + r.nb - 2


def test_cramers_v_in_unit_interval(spark, sf_dir):
    from clickhouse_vs_dbt_spark.operators import stats

    r = stats.q_cramers_v(spark, sf_dir).first()
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.chi2 >= 0.0
