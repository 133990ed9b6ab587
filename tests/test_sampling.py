"""Deterministic corpus sampling / rebalancing."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.sampling import (
    RATES,
    q_rebalance_weights,
    q_stratified_sample,
)


def test_sample_is_deterministic_and_stratified(spark, sf_dir):
    a = q_stratified_sample(spark, sf_dir).collect()
    b = q_stratified_sample(spark, sf_dir).collect()
    assert a == b  # bit-identical across runs — no RNG state

    full = {
        r.lang: r["count"]
        for r in load_table(spark, sf_dir, "documents").groupBy("lang").count().collect()
    }
    sampled: dict[str, int] = {}
    for r in a:
        sampled[r.lang] = sampled.get(r.lang, 0) + 1
    for lang, rate in RATES.items():
        if rate == 100:  # keep-all strata survive exactly
            assert sampled.get(lang, 0) == full.get(lang, 0)
    # the downsampled stratum actually shrank
    n_en_full = (
        load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en").count()
    )
    assert 0 < sampled["en"] < n_en_full


def test_rebalance_weights_inverse_frequency(spark, sf_dir):
    rows = q_rebalance_weights(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    k = len(rows)
    for r in rows:
        assert abs(r.weight - total / (k * r.n_docs)) < 1e-5
    # weighted doc mass is uniform across classes by construction
    masses = [r.n_docs * r.weight for r in rows]
    assert max(masses) - min(masses) < 1e-3
