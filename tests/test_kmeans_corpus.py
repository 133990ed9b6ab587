"""Deterministic k-means + corpus text statistics."""

from __future__ import annotations

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators import corpus, kmeans
from clickhouse_vs_dbt_spark.operators.text import q_text_repetition


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    rows = kmeans.q_kmeans_lloyd(spark, sf_dir).collect()
    clusters = {r.cluster for r in rows}
    assert 1 <= len(clusters) <= kmeans.K
    # every (cluster, pos) cell present for each surviving cluster
    per_cluster = {c: [r for r in rows if r.cluster == c] for c in clusters}
    for c, cells in per_cluster.items():
        assert len(cells) == kmeans.DIM
    # membership counts at pos 0 sum to the corpus size
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows if r.pos == 0) == n_total


def test_kmeans_deterministic(spark, sf_dir):
    a = kmeans.q_kmeans_lloyd(spark, sf_dir).collect()
    b = kmeans.q_kmeans_lloyd(spark, sf_dir).collect()
    assert a == b


def test_vocab_stats_invariants(spark, sf_dir):
    r = corpus.q_corpus_vocab_stats(spark, sf_dir).collect()[0]
    assert 0 < r.vocab_size <= r.total_tokens
    assert 0 <= r.hapax_count <= r.vocab_size
    assert r.max_token_freq <= r.total_tokens


def test_top_terms_sorted_and_bounded(spark, sf_dir):
    rows = corpus.q_corpus_top_terms(spark, sf_dir).collect()
    assert len(rows) == corpus.TOPK_TERMS
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_tfidf_topk_shape(spark, sf_dir):
    rows = corpus.q_text_tfidf_topk(spark, sf_dir).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
        assert r.tfidf > 0
    for cells in per_doc.values():
        assert 1 <= len(cells) <= corpus.TFIDF_K
        scores = [c.tfidf for c in cells]
        assert scores == sorted(scores, reverse=True)


def test_repetition_fractions_bounded(spark, sf_dir):
    rows = q_text_repetition(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.distinct_ratio <= 1.0
        assert 0 < r.top_token_frac <= 1.0
        assert 0 <= r.top_bigram_frac <= 1.0
        assert r.n_distinct <= r.n_tokens
