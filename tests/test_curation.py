"""Corpus-curation operators: decontamination, packing, mixture,
PII scrub, shard export."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.curation import (
    EVAL_MOD,
    MIX_RATES,
    N_SHARDS,
    PACK_TOKENS,
    q_decontaminate_ngram,
    q_export_shards,
    q_mixture_weighted_sample,
    q_sequence_pack,
    q_text_pii_scrub,
)


def test_decontaminate_excludes_eval_docs(spark, sf_dir):
    rows = q_decontaminate_ngram(spark, sf_dir).collect()
    assert rows, "fixtures contain overlapping shingles"
    for r in rows:
        assert r.doc_id % EVAL_MOD != 0  # eval docs never flagged
        assert r.n_hit_shingles >= 1 and r.n_eval_docs >= 1


def test_sequence_pack_budget_and_coverage(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    total_tokens = d.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).collect()[0].t
    packs = q_sequence_pack(spark, sf_dir).collect()
    assert sum(p.n_docs for p in packs) == n_docs  # every doc packed once
    assert sum(p.pack_tokens for p in packs) == total_tokens
    # streaming rule: a pack overflows by at most one document, so any
    # pack except a language's last must have started under budget
    by_lang: dict[str, list] = {}
    for p in packs:
        by_lang.setdefault(p.lang, []).append(p)
    for lang, ps in by_lang.items():
        ids = [p.pack_id for p in sorted(ps, key=lambda x: x.pack_id)]
        assert ids == sorted(set(ids))  # no duplicate pack ids


def test_mixture_sample_rates_and_weights(spark, sf_dir):
    rows = q_mixture_weighted_sample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        idx = int(r.source[3:]) % 4
        assert abs(r.weight - 100.0 / MIX_RATES[idx]) < 1e-5
    # full-rate sources keep every doc
    d = load_table(spark, sf_dir, "documents")
    full_srcs = {
        r.source
        for r in d.select("source").distinct().collect()
        if int(r.source[3:]) % 4 == 0
    }
    kept = {r.source: 0 for r in rows}
    for r in rows:
        kept[r.source] = kept.get(r.source, 0) + 1
    for s in full_srcs:
        n_full = d.filter(F.col("source") == s).count()
        assert kept.get(s, 0) == n_full


def test_pii_scrub_masks_planted_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me at alice@example.com or bob.smith@corp.co.uk ok"),
            (2, "card 1234567890 and pin 12345 stay"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("___pii_tmp")
    from clickhouse_vs_dbt_spark.operators import curation as c

    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), c.EMAIL_RE, "<EMAIL>"),
        c.DIGITS_RE,
        "<NUM>",
    )
    out = {r.doc_id: r.s for r in df.select("doc_id", scrubbed.alias("s")).collect()}
    assert out[1] == "contact me at <EMAIL> or <EMAIL> ok"
    assert out[2] == "card <NUM> and pin 12345 stay"  # <6 digits untouched
    assert out[3] == "clean text only"


def test_export_shards_is_a_permutation(spark, sf_dir):
    rows = q_export_shards(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs  # every doc exactly once
    assert {r.shard_id for r in rows} <= set(range(N_SHARDS))
    # positions are dense 1..k within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_mixture_token_budget_quota_and_straddle(spark, sf_dir):
    """r7: per-source greedy fill — each source's selection stops at
    the first document whose cumulative start crosses the quota (that
    straddling document is KEPT), in deterministic hash order; no
    source exceeds quota by more than one document's tokens."""
    from clickhouse_vs_dbt_spark.operators.curation import (
        DEFAULT_TOKEN_BUDGET,
        TOKEN_BUDGETS,
        q_mixture_token_budget,
    )

    out = {r.source: r for r in q_mixture_token_budget(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r.source: r.t
        for r in docs.selectExpr(
            "source",
            "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n",
        )
        .groupBy("source")
        .agg(F.sum("n").alias("t"))
        .collect()
    }
    max_tok = docs.selectExpr(
        "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n"
    ).agg(F.max("n")).collect()[0][0]
    assert set(out) == set(totals)
    for src, r in out.items():
        budget = TOKEN_BUDGETS.get(src, DEFAULT_TOKEN_BUDGET)
        if totals[src] <= budget:
            assert r.n_tokens == totals[src]  # quota exceeds corpus
        else:
            # filled: reached the quota, overshoot bounded by one doc
            assert budget <= r.n_tokens < budget + max_tok
