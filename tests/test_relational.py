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
