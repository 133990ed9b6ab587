"""corpus_prep pipeline + the scalable two-pass prefix sum."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_vs_dbt_spark.operators.pipeline import (
    q_corpus_prep,
    running_total_scalable,
)


def test_running_total_matches_global_window(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 7 % 997).alias("k"), (F.col("id") % 13 + 1).alias("v")
    ).filter(F.col("k") % 3 != 1)  # gaps + non-contiguous keys
    got = {
        r["k"]: r["cum"]
        for r in running_total_scalable(df, "k", "v", "cum").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {r["k"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_running_total_empty(spark):
    df = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    assert running_total_scalable(df, "k", "v", "cum").count() == 0


def test_corpus_prep_shape(spark, sf_dir):
    rows = q_corpus_prep(spark, sf_dir).collect()
    assert rows
    cum = 0
    for r in rows:
        assert r.pred_lang == "en"
        assert r.quality_score >= 0.5
        assert 5 <= r.n_tokens <= 1000
        cum += r.n_tokens
        assert r.cum_tokens == cum  # doc_id-ordered prefix sums, no gaps skipped
