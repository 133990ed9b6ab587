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


def test_t_pvalue_closed_forms():
    """The compat incomplete-beta t CDF against exact closed forms:
    df=1 is Cauchy, df=2 has an algebraic tail, df→∞ is normal."""
    import math

    from clickhouse_vs_dbt_spark.compat import t_pvalue

    for t in (0.25, 0.5, 1.0, 2.5, 7.0):
        assert abs(t_pvalue(t, 1) - (1 - 2 * math.atan(t) / math.pi)) < 1e-12
        assert abs(t_pvalue(t, 2) - (1 - t / math.sqrt(2 + t * t))) < 1e-12
        assert abs(t_pvalue(t, 1e7) - math.erfc(t / math.sqrt(2))) < 1e-6
    # symmetry and edge behavior
    assert abs(t_pvalue(-2.0, 5) - t_pvalue(2.0, 5)) < 1e-15
    assert t_pvalue(0.0, 5) == 1.0
    # textbook critical value: t(df=20, p=0.05) = 2.086
    assert abs(t_pvalue(2.086, 20) - 0.05) < 1e-4


def test_tuple_index_rewrite():
    """Positional tuple access on tuple-returning rewrites maps to
    the struct field name; access on anything else passes through."""
    from clickhouse_vs_dbt_spark.dialect import transpile

    out = transpile("SELECT sumCount(x).1 AS s, sumCount(x).2 AS c FROM t")
    assert ".`sum`" in out and ".`count`" in out
    out = transpile("SELECT studentTTest(v, i).2 FROM t")
    assert ".`p_value`" in out
    # no named_struct before the paren: untouched
    assert "upper(x).1" in transpile("SELECT upper(x).1 FROM t")


def test_dialect_ttest_matches_numpy(spark, sf_dir):
    """End-to-end studentTTest/welchTTest (t AND p halves) against a
    direct numpy computation + the closed-form t CDF."""
    import numpy as np
    import pandas as pd

    from clickhouse_vs_dbt_spark.compat import t_pvalue
    from clickhouse_vs_dbt_spark.dialect import run_clickhouse_sql

    r = run_clickhouse_sql(
        spark,
        """
        SELECT studentTTest(value, event_type = 'error').1 AS t_s,
               studentTTest(value, event_type = 'error').2 AS p_s,
               welchTTest(value, event_type = 'error').1 AS t_w,
               welchTTest(value, event_type = 'error').2 AS p_w
        FROM events
        WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL
        """,
        sf_dir,
        ("events",),
    ).first()

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf = pdf[pdf.event_type.isin(["purchase", "error"])].dropna(
        subset=["value"]
    )
    a = pdf[pdf.event_type != "error"].value.values
    b = pdf[pdf.event_type == "error"].value.values
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    t_s = (a.mean() - b.mean()) / np.sqrt(sp2 * (1 / na + 1 / nb))
    t_w = (a.mean() - b.mean()) / np.sqrt(va / na + vb / nb)
    df_w = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert abs(r.t_s - t_s) < 1e-6
    assert abs(r.t_w - t_w) < 1e-6
    assert abs(r.p_s - t_pvalue(t_s, na + nb - 2)) < 1e-9
    assert abs(r.p_w - t_pvalue(t_w, df_w)) < 1e-9


def test_dialect_meanz_matches_numpy(spark, sf_dir):
    """End-to-end meanZTest (all four tuple slots) against a direct
    numpy computation: z, erfc p-value, and the CI bounds built from
    the stdlib inverse normal CDF the transpiler folds."""
    import math
    from statistics import NormalDist

    import numpy as np
    import pandas as pd

    from clickhouse_vs_dbt_spark.dialect import run_clickhouse_sql

    r = run_clickhouse_sql(
        spark,
        """
        SELECT meanZTest(400.0, 380.0, 0.9)(value, event_type = 'error').1
                 AS z,
               meanZTest(400.0, 380.0, 0.9)(value, event_type = 'error').2
                 AS p,
               meanZTest(400.0, 380.0, 0.9)(value, event_type = 'error').3
                 AS lo,
               meanZTest(400.0, 380.0, 0.9)(value, event_type = 'error').4
                 AS hi
        FROM events
        WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL
        """,
        sf_dir,
        ("events",),
    ).first()

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf = pdf[pdf.event_type.isin(["purchase", "error"])].dropna(
        subset=["value"]
    )
    a = pdf[pdf.event_type != "error"].value.values
    b = pdf[pdf.event_type == "error"].value.values
    se = np.sqrt(400.0 / len(a) + 380.0 / len(b))
    diff = a.mean() - b.mean()
    zcrit = NormalDist().inv_cdf(0.95)
    assert abs(r.z - diff / se) < 1e-6
    assert abs(r.p - math.erfc(abs(diff / se) / math.sqrt(2))) < 1e-9
    assert abs(r.lo - (diff - zcrit * se)) < 1e-6
    assert abs(r.hi - (diff + zcrit * se)) < 1e-6


def test_meanz_refusals():
    """Non-literal parameters, out-of-range confidence, and the plain
    (non-parametric) call each refuse with the pointer message."""
    import pytest

    from clickhouse_vs_dbt_spark.dialect import DialectError, transpile

    with pytest.raises(DialectError, match="numeric literal"):
        transpile("SELECT meanZTest(v0, v1, 0.95)(x, i) FROM t")
    with pytest.raises(DialectError, match="confidence level"):
        transpile("SELECT meanZTest(1.0, 1.0, 1.5)(x, i) FROM t")
    with pytest.raises(DialectError, match="parametric"):
        transpile("SELECT meanZTest(x, i) FROM t")


def test_mann_whitney_matches_bruteforce(spark, sf_dir):
    """The distinct-value rank algebra against a direct average-rank
    computation in pandas (scipy-free)."""
    import numpy as np
    import pandas as pd

    from clickhouse_vs_dbt_spark.operators import stats

    r = stats.q_stats_mann_whitney(spark, sf_dir).first()

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf = pdf[pdf.event_type.isin(["purchase", "error"])].dropna(
        subset=["value"]
    )
    ranks = pdf.value.rank(method="average")
    r1 = ranks[pdf.event_type == "purchase"].sum()
    n1 = int((pdf.event_type == "purchase").sum())
    n2 = int((pdf.event_type == "error").sum())
    u1 = r1 - n1 * (n1 + 1) / 2
    assert r.n1 == n1 and r.n2 == n2
    assert r.u1_x2 == int(round(2 * u1))
    assert r.u1_x2 + r.u2_x2 == 2 * n1 * n2
    # z against direct tie-corrected formula
    n = n1 + n2
    _, counts = np.unique(pdf.value.values, return_counts=True)
    ties = (counts.astype(np.int64) ** 3 - counts).sum()
    sigma = np.sqrt(n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1))))
    z = (u1 - n1 * n2 / 2) / sigma
    assert abs(r.z_stat - z) < 1e-5


def test_categorical_assoc_bounds(spark, sf_dir):
    """Association measures live in [0,1]; entropies are bounded by
    log2(cardinality); bias correction only shrinks V."""
    import math

    from clickhouse_vs_dbt_spark.operators import stats

    r = stats.q_stats_categorical_assoc(spark, sf_dir).first()
    assert 0.0 <= r.cramers_v <= 1.0
    assert 0.0 <= r.cramers_v_bc <= r.cramers_v + 1e-9
    assert 0.0 <= r.theils_u <= 1.0
    assert 0.0 < r.entropy_x <= math.log2(5) + 1e-9  # 5 mktsegments
    assert 0.0 < r.entropy_y <= math.log2(3) + 1e-9  # 3 statuses


def test_ks_test_matches_bruteforce(spark, sf_dir):
    """ECDF max-gap against a direct numpy two-sample KS computation,
    and the asymptotic tail against its series definition."""
    import math

    import numpy as np
    import pandas as pd

    from clickhouse_vs_dbt_spark.operators import stats

    r = stats.q_stats_ks_test(spark, sf_dir).first()

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf = pdf[pdf.event_type.isin(["purchase", "error"])].dropna(
        subset=["value"]
    )
    a = np.sort(pdf[pdf.event_type == "purchase"].value.values)
    b = np.sort(pdf[pdf.event_type == "error"].value.values)
    allv = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, allv, side="right") / len(a)
    f2 = np.searchsorted(b, allv, side="right") / len(b)
    d = np.abs(f1 - f2).max()
    assert r.n1 == len(a) and r.n2 == len(b)
    assert abs(r.d_stat - d) < 1e-6

    lam = d * math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    q = 2 * sum(
        (-1) ** (k - 1) * math.exp(-2 * k * k * lam * lam)
        for k in range(1, 101)
    )
    assert abs(r.p_asymp - min(1.0, max(0.0, q))) < 1e-6
