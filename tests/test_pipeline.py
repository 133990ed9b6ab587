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


def test_corpus_shuffle_is_exact_md5_permutation(spark, sf_dir):
    """The two-pass bucketed rank must equal the naive global
    ORDER BY md5-key permutation, and be a bijection 1..N."""
    from pyspark.sql import functions as F

    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.operators.pipeline import (
        SHUFFLE_SALT,
        q_corpus_shuffle,
    )

    got = {r.doc_id: r.position for r in q_corpus_shuffle(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "documents").count()
    assert sorted(got.values()) == list(range(1, n + 1))

    naive = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SHUFFLE_SALT))).alias("k"),
        )
        .orderBy("k", "doc_id")
        .collect()
    )
    assert {r.doc_id: i + 1 for i, r in enumerate(naive)} == got


def test_corpus_shuffle_no_global_data_window(spark, sf_dir):
    """The only unpartitioned window runs over the <=256 bucket counts;
    the data-scale rank window must be hash-partitioned by bucket."""
    from clickhouse_vs_dbt_spark.operators.pipeline import q_corpus_shuffle

    plan = (
        q_corpus_shuffle(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(bucket" in plan
