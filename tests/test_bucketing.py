"""Plan-shape evidence for bucketed co-located joins: the join reads
pre-bucketed data with NO Exchange; bucket-key filters prune buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.plans import bucketing


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    join = bucketing.bucketed_join(spark, sf_dir)
    plan = _executed_plan(join)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_bucket_key_filter_prunes_buckets(spark, sf_dir):
    import contextlib
    import io

    t_orders, _ = bucketing.ensure_bucketed(spark, sf_dir)
    # auto-bucketed-scan turns bucketed reading off for scans with no
    # join/agg to feed, which also forfeits bucket pruning — pin it on
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = spark.table(t_orders).filter(F.col("o_custkey") == 7)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "SelectedBucketsCount: 1 out of" in buf.getvalue(), buf.getvalue()
    finally:
        spark.conf.set(key, prev)


def test_bucketed_result_matches_plain_join(spark, sf_dir):
    got = {
        r.c_mktsegment: (r.n_orders, round(r.revenue, 2))
        for r in bucketing.q_bucketed_join_revenue(spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = {
        r.c_mktsegment: (r.n_orders, round(r.revenue, 2))
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert got == want
