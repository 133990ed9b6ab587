"""Dedup operators: recall vs exact baselines + constructed edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators import dedup


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    exact = _pairs(dedup.q_dedup_ngram_jaccard(spark, sf_dir))
    approx = _pairs(dedup.q_dedup_minhash_lsh(spark, sf_dir))
    assert exact, "fixtures should contain planted near-duplicates"
    # candidates are verified with exact Jaccard → no false positives
    assert approx <= exact
    # 8 bands × 4 rows at j≥0.8: miss probability (1-j^4)^8 ≤ 2%/pair
    assert len(approx) >= 0.9 * len(exact)


def test_exact_dedup_collapses_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "  hello   world".replace("   ", " ")), (3, "other")],
        "doc_id long, text string",
    )
    out = (
        df.withColumn("text_key", F.lower(F.trim("text")))
        .groupBy("text_key")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    rows = {r.keep_doc_id: r.n_copies for r in out.collect()}
    assert rows == {1: 2, 3: 1}


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [
            (1, "spark join filter window group sort merge"),
            (2, "spark join filter window group sort merge"),
            (3, "completely different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    sigs = {
        r.doc_id: r.simhash for r in dedup.simhash_signatures(df).collect()
    }
    assert sigs[1] == sigs[2]
    # different token sets should differ in many bits
    assert bin((sigs[1] ^ sigs[3]) & ((1 << dedup.SIMHASH_BITS) - 1)).count("1") > 10


def test_simhash_deterministic_across_runs(spark, sf_dir):
    q = dedup.QUERIES["dedup_simhash"]
    first = {tuple(r) for r in q(spark, sf_dir).limit(50).collect()}
    second = {tuple(r) for r in q(spark, sf_dir).limit(50).collect()}
    assert first == second


def test_jaccard_threshold_boundary(spark):
    # two docs sharing exactly 4 of 5 union shingles: j = 0.8 → kept (>=)
    a = "w1 w2 w3 w4 w5 w6"  # shingles: 4
    b = "w1 w2 w3 w4 w5 w7"  # shingles: 4, common 3 → j=3/5
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    df.createOrReplaceTempView("documents_tiny")
    from clickhouse_vs_dbt_spark.functions.textfns import word_shingles

    sh = df.select(
        "doc_id", word_shingles("split(trim(text), '\\\\s+')", 3).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))
    pairs = dedup._exact_jaccard_pairs(sh).collect()
    assert len(pairs) == 1
    assert pairs[0].jaccard == pytest.approx(3 / 5)


def test_embedding_near_dup_blocked_by_label(spark, sf_dir):
    out = dedup.q_dedup_embedding(spark, sf_dir).collect()
    assert out, "threshold calibrated to yield pairs on fixtures"
    for r in out:
        assert r.cos_sim >= dedup.COSINE_THRESHOLD


def test_connected_components_chain_and_clique(spark):
    """Transitive closure over a 4-chain and a separate triangle."""
    from clickhouse_vs_dbt_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_rep)
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
    }


def test_dedup_clusters_reps_are_component_minima(spark, sf_dir):
    from clickhouse_vs_dbt_spark.operators.components import q_dedup_clusters

    rows = q_dedup_clusters(spark, sf_dir).collect()
    by_rep: dict[int, list[int]] = {}
    for r in rows:
        by_rep.setdefault(r.cluster_rep, []).append(r.doc_id)
    for rep, members in by_rep.items():
        assert rep == min(members)  # canonical keeper is the min id
        assert len(members) >= 2  # only docs with a near-dup partner
