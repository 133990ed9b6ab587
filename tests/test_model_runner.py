"""Model DAG runner — the dbt-analog (operators S2/S3/S5;
reference README.md:254-263, :391-409)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.plans.models import Materialization, Model, ModelRunner
from clickhouse_vs_dbt_spark.plans.star import build_star


def test_topological_order_and_views(spark, sf_dir, tmp_path):
    runner = ModelRunner(spark, warehouse_dir=str(tmp_path))

    @runner.model("star_m", deps=["stg_lineitem_m"], materialization=Materialization.TABLE)
    def star_m(s):
        return build_star(s, sf_dir)

    @runner.model("stg_lineitem_m")
    def stg_lineitem_m(s):
        return load_table(s, sf_dir, "lineitem").select("*")

    order = runner.order()
    assert order.index("stg_lineitem_m") < order.index("star_m")

    out = runner.run()
    # both models are queryable by name afterwards (dbt ref() semantics)
    assert spark.table("star_m").count() == out["stg_lineitem_m"].count()


def test_table_materialization_is_physical(spark, sf_dir, tmp_path):
    runner = ModelRunner(spark, warehouse_dir=str(tmp_path))
    runner.add(
        Model(
            "star_part",
            lambda s: build_star(s, sf_dir).withColumn(
                "order_year", F.year("o_orderdate")
            ),
            materialization=Materialization.TABLE,
            partition_by=("order_year",),
        )
    )
    out = runner.run()
    # partitioned parquet on disk → partition pruning for year predicates
    years = [p.name for p in (tmp_path / "star_part").iterdir() if p.name.startswith("order_year=")]
    assert len(years) >= 5
    # reading back one partition only scans that partition
    one = out["star_part"].filter(F.col("order_year") == 1996)
    scan = one._jdf.queryExecution().executedPlan().toString()
    assert "order_year" in scan


def test_missing_dep_raises(spark):
    runner = ModelRunner(spark)
    runner.add(Model("a", lambda s: s.range(1), deps=["ghost"]))
    with pytest.raises(Exception):
        runner.run()


def test_duplicate_model_raises(spark):
    runner = ModelRunner(spark)
    runner.add(Model("a", lambda s: s.range(1)))
    with pytest.raises(ValueError):
        runner.add(Model("a", lambda s: s.range(1)))


def test_bucketed_models_join_without_shuffle(spark, sf_dir):
    """Bucketing both fact tables on the join key makes lineitem⋈orders
    exchange-free (co-located join) — the 100 TB answer to the one
    non-broadcast join in the star build."""
    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.plans.models import Materialization, Model, ModelRunner

    runner = ModelRunner(spark)
    runner.add(
        Model(
            "b_lineitem",
            lambda s: load_table(s, sf_dir, "lineitem"),
            materialization=Materialization.TABLE,
            bucket_by=(8, ("l_orderkey",)),
            sort_by=("l_orderkey",),
        )
    )
    runner.add(
        Model(
            "b_orders",
            lambda s: load_table(s, sf_dir, "orders"),
            materialization=Materialization.TABLE,
            bucket_by=(8, ("o_orderkey",)),
            sort_by=("o_orderkey",),
        )
    )
    out = runner.run()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = out["b_lineitem"].join(
            out["b_orders"],
            out["b_lineitem"].l_orderkey == out["b_orders"].o_orderkey,
        )
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    l2 = load_table(spark, sf_dir, "lineitem")
    o2 = load_table(spark, sf_dir, "orders")
    assert n == l2.join(o2, l2.l_orderkey == o2.o_orderkey).count()
    assert "hashpartitioning" not in plan  # no shuffle on either side
