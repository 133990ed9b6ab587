"""Extended relational flight — exact parity at sf0.001 + plan shape."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from clickhouse_vs_dbt_spark.operators import relational


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q1_pricing_summary",
        "top_customers",
        "window_rank_parts",
        "set_ops_nations",
        "left_join_order_counts",
        "anti_join_quiet_customers",
        "rollup_revenue",
        "pivot_status_revenue",
        "median_quantity",
    ],
)
def test_relational_matches_oracle(spark, sf_dir, duck, name):
    # Counter, not sorted(): rollup/cube rows contain None group keys,
    # which Python refuses to order against ints.
    from collections import Counter

    got = Counter(tuple(r) for r in relational.QUERIES[name](spark, sf_dir).collect())
    want = Counter(tuple(r) for r in duck.execute(relational.ORACLES[name]).fetchall())
    assert got == want


def test_topk_uses_take_ordered(spark, sf_dir):
    # global ORDER BY + LIMIT must compile to per-partition heaps
    # (TakeOrderedAndProject), not a full global sort — the 100 TB shape.
    plan = (
        relational.q_top_customers(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_semi_join_physical(spark, sf_dir):
    plan = (
        relational.q_semi_join_bulk_orders(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan


def test_all_relational_queries_registered():
    qs = entrymod.queries()
    for name in relational.QUERIES:
        assert name in qs


def test_approx_aggregates_error_bounds(spark, sf_dir):
    """HLL++ distinct counts within 5% of exact; approx quantiles within
    the rank-error guarantee (accuracy 10000 -> tight at this scale)."""
    from pyspark.sql import functions as F

    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.operators.relational import (
        q_approx_distinct_quantiles,
    )

    approx = {r.o_orderstatus: r for r in q_approx_distinct_quantiles(spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderstatus: r
        for r in l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for k, a in approx.items():
        e = exact[k]
        assert abs(a.approx_parts - e.parts) / e.parts < 0.05
        assert abs(a.qty_p50 - e.p50) / max(e.p50, 1) < 0.10


def test_histogram_buckets_aligned(spark, sf_dir):
    from clickhouse_vs_dbt_spark.operators.relational import (
        HIST_WIDTH,
        q_histogram_quantity,
    )

    rows = q_histogram_quantity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bucket % HIST_WIDTH == 0
        assert r.n_items > 0


def test_unpivot_doubles_rows(spark, sf_dir):
    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.operators.relational import q_unpivot_part_measures

    n_parts = load_table(spark, sf_dir, "part").count()
    out = q_unpivot_part_measures(spark, sf_dir)
    assert out.count() == 2 * n_parts
    assert set(r.measure for r in out.select("measure").distinct().collect()) == {
        "p_size",
        "p_retailprice",
    }


def test_group_quantiles_ordered(spark, sf_dir):
    from clickhouse_vs_dbt_spark.operators.relational import q_group_quantiles

    for r in q_group_quantiles(spark, sf_dir).collect():
        assert r.p50 <= r.p95
        assert r.n > 0


def test_latest_per_user_unique(spark, sf_dir):
    from clickhouse_vs_dbt_spark.operators.timeseries import (
        q_events_latest_per_user,
    )

    rows = q_events_latest_per_user(spark, sf_dir).collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users)) > 0
