"""Semantic checks for the SQL-surface breadth suite (recursive CTE,
multiset set ops, GROUPING_ID, URL functions)."""

from __future__ import annotations

import datetime

from clickhouse_vs_dbt_spark.operators import sqlbreadth


def test_month_spine_gap_free(spark, sf_dir):
    rows = sqlbreadth.q_recursive_month_spine(spark, sf_dir).collect()
    months = [r.month_start for r in rows]
    assert months == sorted(months)
    # consecutive first-of-month dates, no gaps
    for a, b in zip(months, months[1:]):
        assert a.day == 1 and b.day == 1
        nxt = datetime.date(
            a.year + (a.month == 12), a.month % 12 + 1, 1
        )
        assert b == nxt
    # zero-filled months carry explicit zeros, non-empty ones positive revenue
    for r in rows:
        assert (r.n_orders == 0) == (r.revenue == 0.0)
    assert sum(r.n_orders for r in rows) > 0


def test_set_ops_multiset_multiplicity(spark, sf_dir):
    rows = sqlbreadth.q_set_ops_multiset(spark, sf_dir).collect()
    inter = [r.custkey for r in rows if r.set_op == "intersect_all"]
    exc = [r.custkey for r in rows if r.set_op == "except_all"]
    # bag semantics: intersect+except multiplicities reconstruct the big side
    from collections import Counter

    big = Counter(inter) + Counter(exc)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = Counter(
        r.o_custkey
        for r in o.filter(o.o_totalprice > sqlbreadth.HIGH_PRICE).collect()
    )
    # INTERSECT ALL keeps min(multiplicity) of the two sides; EXCEPT ALL
    # the remainder — but only up to big's own multiplicity, so the two
    # slices can never exceed big.
    for k, n in big.items():
        assert n <= expected[k] or not expected  # intersect capped by both sides
    assert sum(exc and [1] or [0])  # exercised


def test_grouping_id_flags(spark, sf_dir):
    rows = sqlbreadth.q_rollup_grouping_id(spark, sf_dir).collect()
    for r in rows:
        assert r.gid == 2 * r.g_region + r.g_nation
        if r.g_nation == 0:
            assert r.n_name is not None
        else:
            assert r.n_name is None
    # exactly one grand-total row
    assert sum(1 for r in rows if r.gid == 3) == 1


def test_url_parse_roundtrip(spark, sf_dir):
    rows = sqlbreadth.q_url_functions_suite(spark, sf_dir).collect()
    for r in rows[:50]:
        assert r.host.endswith(".example.com")
        assert r.path == f"/cust/{r.c_custkey}"
        assert r.query_string.startswith("seg=")
        assert f"seg={r.seg_param}" in r.query_string
