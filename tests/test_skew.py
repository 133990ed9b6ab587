"""Salted join must be semantically identical to the plain join,
including a constructed hot-key skew case."""

from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join_under_skew(spark):
    # 90% of rows share one hot key
    large = spark.range(0, 5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("payload")
    )
    got = sorted(
        (r.row_id, r.k, r.payload)
        for r in salted_join(large, small, on="k", tiebreak=F.col("row_id")).collect()
    )
    want = sorted(
        (r.row_id, r.k, r.payload) for r in large.join(small, "k").collect()
    )
    assert got == want and len(got) == 5000
