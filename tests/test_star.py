"""Star model (operators J1/P2/P3; reference README.md:349-395)."""

from __future__ import annotations

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.plans.star import STAR_COLUMNS, build_star


def test_star_preserves_fact_grain(spark, sf_dir):
    # every FK resolves in the fixtures, so the inner joins keep the grain
    star = build_star(spark, sf_dir)
    assert star.count() == load_table(spark, sf_dir, "lineitem").count()


def test_star_projection(spark, sf_dir):
    star = build_star(spark, sf_dir)
    assert star.columns == list(STAR_COLUMNS)


def test_dimensions_broadcast(spark, sf_dir):
    # scale posture: the three true dims must join as BroadcastHashJoin
    plan = build_star(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
