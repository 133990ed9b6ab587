"""Corpus-level text statistics over ``documents`` — the global-view
complement of the per-document operators in operators/text.py.

Three operators, all pure Catalyst word-count-family plans (explode →
keyed count with map-side combine → small join/top-k), no Python in the
row path:

* ``corpus_vocab_stats``   — one-row corpus summary (vocab size, total
                             tokens, hapax count, max token frequency).
* ``corpus_top_terms``     — global top-10 tokens (TakeOrderedAndProject:
                             per-partition heaps, no global sort).
* ``text_tfidf_topk``      — top-3 terms per document by tf·idf.  The
                             idf is the log-free ratio N/df: a single
                             division keeps the score bit-identical in
                             both engines (ln/log2 are libm calls whose
                             last-ulp behavior is not guaranteed to
                             match across engines), and it is monotone
                             in the classic idf, so the top-k ranking
                             is the same one.

Scale notes: the token-count relation is the canonical linear shuffle
(map-side combine collapses per-partition duplicates first).  The df
(document-frequency) relation is |vocab| rows — it broadcasts; at
100 TB the tfidf join is therefore map-side after one count pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.functions.textfns import tokens

TOPK_TERMS = 10
TFIDF_K = 3


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, cnt) — per-document token counts."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_TOKEN_COUNTS = """
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
"""


def q_corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus summary from the global token-frequency relation:
    two chained aggregates, the second over |vocab| rows."""
    tc = _token_counts(spark, sf_dir)
    vocab = tc.groupBy("tok").agg(F.sum("cnt").alias("freq"))
    return vocab.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("freq").alias("total_tokens"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).alias("hapax_count"),
        F.max("freq").alias("max_token_freq"),
    )


O_VOCAB_STATS = f"""
WITH toks AS ({SQL_TOKEN_COUNTS}),
vocab AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok)
SELECT COUNT(*) AS vocab_size,
       CAST(SUM(freq) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
       CAST(MAX(freq) AS BIGINT) AS max_token_freq
FROM vocab
"""


def q_corpus_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 tokens by frequency, deterministic tie-break on the
    token itself.

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
    per-partition bounded heaps merged on the driver — so the unbounded
    web-scale vocabulary (typos, numbers, hashes) never collapses into a
    single-task global sort.  The rank window afterwards runs over the
    k=10 surviving rows only, which is bounded by construction."""
    tc = _token_counts(spark, sf_dir)
    vocab = tc.groupBy("tok").agg(F.sum("cnt").alias("freq"))
    topk = vocab.orderBy(F.col("freq").desc(), F.col("tok").asc()).limit(
        TOPK_TERMS
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("rank", "tok", "freq")
        .orderBy("rank")
    )


O_TOP_TERMS = f"""
WITH toks AS ({SQL_TOKEN_COUNTS}),
vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
ranked AS (
  SELECT tok, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, tok ASC) AS rank
  FROM vocab)
SELECT CAST(rank AS INT) AS rank, tok, freq FROM ranked
WHERE rank <= {TOPK_TERMS} ORDER BY rank
"""


def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by tf·idf (idf as the log-free N/df
    ratio — see module docstring).  The df relation is |vocab| rows and
    broadcasts; tf joins it map-side, then a per-doc window heap."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar; the corpus row count is model state
    tc = _token_counts(spark, sf_dir)
    doc_len = tc.groupBy("doc_id").agg(F.sum("cnt").alias("n_tokens"))
    df_rel = F.broadcast(
        tc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tc.join(doc_len, "doc_id")
        .join(df_rel, "tok")
        .withColumn(
            "tfidf",
            F.round(
                (F.col("cnt").cast("double") / F.col("n_tokens"))
                * (F.lit(float(n_docs)) / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_K)
        .select("doc_id", "rank", "tok", "tfidf")
        .orderBy("doc_id", "rank")
    )


O_TFIDF = f"""
WITH toks AS ({SQL_TOKEN_COUNTS}),
tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok),
doc_len AS (SELECT doc_id, SUM(cnt) AS n_tokens FROM tc GROUP BY doc_id),
df_rel AS (SELECT tok, COUNT(*) AS df FROM tc GROUP BY tok),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tc.doc_id, tc.tok,
         round((CAST(tc.cnt AS DOUBLE) / doc_len.n_tokens)
               * (n.n_docs / df_rel.df), 6) AS tfidf
  FROM tc
  JOIN doc_len USING (doc_id)
  JOIN df_rel  USING (tok)
  CROSS JOIN n),
ranked AS (
  SELECT doc_id, tok, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, tok ASC) AS rank
  FROM scored)
SELECT doc_id, CAST(rank AS INT) AS rank, tok, tfidf
FROM ranked WHERE rank <= {TFIDF_K}
ORDER BY doc_id, rank
"""


def q_unigram_freq_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality proxy: score each document by the
    average corpus frequency of its tokens (the integer-exact core of a
    unigram log-likelihood filter — rare-token-heavy docs score low,
    which is the perplexity-filter signal without libm ``log``).

    Shape: token explode → global vocab aggregate → broadcast the vocab
    back onto per-doc token counts.  The vocab is Zipf-distributed, so
    at 100 TB you cap it at the top-V terms (everything below the cap is
    'rare' with frequency 1) and it broadcasts in MBs; the fact-side
    explode never shuffles except the final per-doc aggregate.
    ``score`` is one IEEE division of two exact int64s — deterministic
    in both engines."""
    tc = _token_counts(spark, sf_dir)
    vocab = tc.groupBy("tok").agg(F.sum("cnt").alias("freq"))
    return (
        tc.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("freq")).alias("freq_mass"),
            F.sum("cnt").alias("n_tokens"),
        )
        .withColumn(
            "score", (F.col("freq_mass").cast("double") / F.col("n_tokens"))
        )
        .orderBy("doc_id")
    )


O_UNIGRAM_QUALITY = f"""
WITH tc AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM ({SQL_TOKEN_COUNTS}) GROUP BY doc_id, tok),
vocab AS (SELECT tok, CAST(SUM(cnt) AS BIGINT) AS freq FROM tc GROUP BY tok)
SELECT doc_id,
       CAST(SUM(cnt * freq) AS BIGINT) AS freq_mass,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(CAST(SUM(cnt * freq) AS BIGINT) AS DOUBLE)
         / CAST(SUM(cnt) AS BIGINT) AS score
FROM tc JOIN vocab USING (tok)
GROUP BY doc_id ORDER BY doc_id
"""


PAIR_TOPK = 20


def q_corpus_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair frequency counting — the inner loop of BPE/WordPiece
    tokenizer training (count all adjacent symbol pairs, take the most
    frequent for the next merge), at word granularity over the corpus.

    Shape: per-document ordered pair explode (map-local
    ``sequence``+``transform`` — no window, no shuffle until the count),
    one keyed count with map-side combine, global top-k as
    TakeOrderedAndProject.  One BPE merge round at 100 TB is exactly
    this plan; training loops it with a merge-table broadcast."""
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        d.select(tokens().alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("pair").asc())
        .limit(PAIR_TOPK)
    )


O_PAIR_COUNTS = f"""
WITH arrs AS (
  SELECT string_split_regex(trim(text), '\\s+') AS a FROM documents),
idx AS (
  SELECT a, unnest(range(1, len(a))) AS i FROM arrs WHERE len(a) >= 2),
pairs AS (SELECT a[i] || ' ' || a[i + 1] AS pair FROM idx)
SELECT pair, COUNT(*) AS freq FROM pairs
GROUP BY pair ORDER BY freq DESC, pair ASC LIMIT {PAIR_TOPK}
"""


QUERIES = {
    "corpus_vocab_stats": q_corpus_vocab_stats,
    "corpus_pair_counts": q_corpus_pair_counts,
    "corpus_top_terms": q_corpus_top_terms,
    "text_tfidf_topk": q_text_tfidf_topk,
    "unigram_freq_quality": q_unigram_freq_quality,
}

ORACLES = {
    "corpus_vocab_stats": O_VOCAB_STATS,
    "corpus_pair_counts": O_PAIR_COUNTS,
    "corpus_top_terms": O_TOP_TERMS,
    "text_tfidf_topk": O_TFIDF,
    "unigram_freq_quality": O_UNIGRAM_QUALITY,
}
