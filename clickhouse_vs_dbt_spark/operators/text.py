"""Text-analysis operators over ``documents`` (SURVEY.md §2.3):
token statistics, quality scoring, heuristic language ID, and
content fingerprinting.

All four are pure Catalyst expressions (split / regexp / higher-order
array functions) — zero Python in the row path, so they run at scan
speed on 100 TB — and all four are oracle-checked against identical
formulas in DuckDB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.functions.textfns import (
    rolling_hash,
    sql_rolling_hash,
    tokens,
)

STOPWORDS = ("the", "a", "of", "to", "and", "in")
WORD_RE = "[A-Za-z0-9]+"
PUNCT_RE = r"[.,!?;:]"

# language marker words for the n-gram/function-word heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "to"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "les", "et", "dans"),
}


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counting: whitespace tokens, word-regex tokens
    (the BPE-ish pre-tokenization pass), character length."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{WORD_RE}', 0))").alias("n_words"),
    ).orderBy("doc_id")


O_TOKEN_STATS = f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       len(regexp_extract_all(text, '{WORD_RE}')) AS n_words
FROM documents ORDER BY doc_id
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: stopword ratio, punctuation density, mean
    token length, and a blended score.  The formula is arbitrary but
    deterministic and engine-portable — the operator under test is the
    expression pipeline, not the linguistics."""
    d = load_table(spark, sf_dir, "documents")
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = "split(trim(text), '\\\\s+')"
    return (
        d.withColumn("n_tokens", F.expr(f"size({toks})"))
        .withColumn(
            "stop_ratio",
            F.round(
                F.expr(
                    f"size(filter({toks}, t -> t IN ({stoplist}))) / CAST(size({toks}) AS DOUBLE)"
                ),
                6,
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                (
                    F.length("text")
                    - F.length(F.regexp_replace("text", PUNCT_RE, ""))
                ).cast("double")
                / F.length("text"),
                6,
            ),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                F.length(F.regexp_replace("text", r"\s+", "")).cast("double")
                / F.col("n_tokens"),
                6,
            ),
        )
        .withColumn(
            "quality_score",
            F.round(
                F.lit(1.0)
                - F.least(F.lit(1.0), F.col("punct_ratio") * 5)
                * F.lit(0.5)
                - F.greatest(
                    F.lit(0.0), F.lit(0.15) - F.col("stop_ratio")
                )
                * F.lit(2.0),
                6,
            ),
        )
        .select(
            "doc_id", "n_tokens", "stop_ratio", "punct_ratio",
            "mean_token_len", "quality_score",
        )
        .orderBy("doc_id")
    )


def _o_quality() -> str:
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS t
  FROM documents
), m AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         round(len(list_filter(t, x -> x IN ({stoplist}))) / CAST(len(t) AS DOUBLE), 6) AS stop_ratio,
         round(CAST(length(text) - length(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
         round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(t), 6) AS mean_token_len
  FROM base)
SELECT doc_id, n_tokens, stop_ratio, punct_ratio, mean_token_len,
       round(1.0 - least(1.0, punct_ratio * 5) * 0.5
                 - greatest(0.0, 0.15 - stop_ratio) * 2.0, 6) AS quality_score
FROM m ORDER BY doc_id
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count function-word markers per language,
    argmax with a fixed priority order on ties, 'und' when no marker
    hits.  (The fixture ``lang`` column is a synthetic label — kept in
    the output for comparison, not used by the predictor.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = "split(lower(trim(text)), '\\\\s+')"
    counts = {
        lang: f"size(filter({toks}, t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in LANG_MARKERS.items()
    }
    pred = f"""
      CASE WHEN {counts['en']} >= {counts['es']} AND {counts['en']} >= {counts['de']}
                AND {counts['en']} >= {counts['fr']} AND {counts['en']} > 0 THEN 'en'
           WHEN {counts['es']} >= {counts['de']} AND {counts['es']} >= {counts['fr']}
                AND {counts['es']} > 0 THEN 'es'
           WHEN {counts['de']} >= {counts['fr']} AND {counts['de']} > 0 THEN 'de'
           WHEN {counts['fr']} > 0 THEN 'fr'
           ELSE 'und' END
    """
    return d.select(
        "doc_id",
        F.col("lang").alias("claimed_lang"),
        F.expr(counts["en"]).alias("en_hits"),
        F.expr(pred).alias("pred_lang"),
    ).orderBy("doc_id")


def _o_langid() -> str:
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    counts = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in LANG_MARKERS.items()
    }
    return f"""
SELECT doc_id, lang AS claimed_lang,
       {counts['en']} AS en_hits,
       CASE WHEN {counts['en']} >= {counts['es']} AND {counts['en']} >= {counts['de']}
                 AND {counts['en']} >= {counts['fr']} AND {counts['en']} > 0 THEN 'en'
            WHEN {counts['es']} >= {counts['de']} AND {counts['es']} >= {counts['fr']}
                 AND {counts['es']} > 0 THEN 'es'
            WHEN {counts['de']} >= {counts['fr']} AND {counts['de']} > 0 THEN 'de'
            WHEN {counts['fr']} > 0 THEN 'fr'
            ELSE 'und' END AS pred_lang
FROM documents ORDER BY doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content fingerprint: polynomial rolling hash over
    characters (portable mod-prime fold — see functions/textfns.py)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", rolling_hash("text").alias("fingerprint")
    ).orderBy("doc_id")


O_FINGERPRINT = f"""
SELECT doc_id, {sql_rolling_hash('text')} AS fingerprint
FROM documents ORDER BY doc_id
"""


# --- context-window chunking (training-batch packing) ---

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the packing step that turns a corpus into model training samples.

    Map-only Catalyst pipeline: tokenize once, derive the chunk count
    arithmetically, ``explode(sequence(...))`` to one row per chunk,
    ``slice`` the shared token array per row.  No shuffle at all until
    the cosmetic final sort; at 100 TB this runs scan-local and the
    chunk table inherits the corpus partitioning.  Chunk content is
    emitted as an md5 over the space-joined tokens (portable to the
    oracle) rather than the raw text, keeping the compared relation
    narrow."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens().alias("t")).withColumn(
        "n_tokens", F.size("t")
    )
    n_chunks = F.when(F.col("n_tokens") <= CHUNK_TOKENS, F.lit(1)).otherwise(
        F.ceil(
            (F.col("n_tokens") - CHUNK_TOKENS) / F.lit(float(CHUNK_STRIDE))
        ).cast("int")
        + 1
    )
    chunk = F.slice(
        F.col("t"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return (
        toks.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size(chunk).alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


O_TEXT_CHUNKS = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0,
           CASE WHEN len(toks) <= {CHUNK_TOKENS} THEN 0
                ELSE CAST(ceil((len(toks) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS INT)
           END)) AS chunk_id
  FROM t)
SELECT doc_id, chunk_id,
       len(list_slice(toks, chunk_id * {CHUNK_STRIDE} + 1,
                      chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS})) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, chunk_id * {CHUNK_STRIDE} + 1,
                      chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')) AS chunk_md5
FROM c
ORDER BY doc_id, chunk_id
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token
    ratio (rep-1) and the occurrence share of the most frequent token
    and word-bigram (rep-2).  Highly repetitive machine-generated text
    scores high on top_*_frac and low on distinct_ratio — the standard
    pre-training filter family (Rae et al. 2021, "Scaling Language
    Models", §A.1.1 — public paper, heuristic reimplemented here).

    Shape: tokenize → explode uni/bigrams → two keyed count aggregates
    each with map-side combine → per-doc max/sum, join on doc_id.  The
    shuffles carry (doc_id, gram) counts — at 100 TB this is the same
    linear pass as word-count; no Python, no skew (doc_id is unique)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens().alias("t"))
    uni = base.select("doc_id", F.explode("t").alias("g"))
    # zip_with of the two shifted slices: no CASE needed — a 1-token doc
    # slices to two empty arrays and zips to zero bigrams.
    bi = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), "
                "(a, b) -> concat(a, ' ', b))"
            )
        ).alias("g"),
    )

    def stats(g: DataFrame, max_name: str, total_name: str) -> DataFrame:
        counts = g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt"))
        return counts.groupBy("doc_id").agg(
            F.max("cnt").alias(max_name),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("cnt").alias(total_name),
        )

    us = stats(uni, "max_uni", "n_tokens")
    bs = stats(bi, "max_bi", "n_bigrams").drop("n_distinct")
    return (
        us.join(bs, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 6).alias(
                "distinct_ratio"
            ),
            F.round(F.col("max_uni").cast("double") / F.col("n_tokens"), 6).alias(
                "top_token_frac"
            ),
            F.coalesce(
                F.round(F.col("max_bi").cast("double") / F.col("n_bigrams"), 6),
                F.lit(0.0),
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


O_TEXT_REPETITION = """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
uni AS (SELECT doc_id, unnest(t) AS g FROM base),
bi AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
  FROM base),
uc AS (SELECT doc_id, g, COUNT(*) AS cnt FROM uni GROUP BY doc_id, g),
bc AS (SELECT doc_id, g, COUNT(*) AS cnt FROM bi GROUP BY doc_id, g),
us AS (SELECT doc_id, MAX(cnt) AS max_uni, COUNT(*) AS n_distinct,
              CAST(SUM(cnt) AS BIGINT) AS n_tokens
       FROM uc GROUP BY doc_id),
bs AS (SELECT doc_id, MAX(cnt) AS max_bi, CAST(SUM(cnt) AS BIGINT) AS n_bigrams
       FROM bc GROUP BY doc_id)
SELECT u.doc_id, u.n_tokens, u.n_distinct,
       round(CAST(u.n_distinct AS DOUBLE) / u.n_tokens, 6) AS distinct_ratio,
       round(CAST(u.max_uni AS DOUBLE) / u.n_tokens, 6) AS top_token_frac,
       coalesce(round(CAST(b.max_bi AS DOUBLE) / b.n_bigrams, 6), 0.0) AS top_bigram_frac
FROM us u LEFT JOIN bs b USING (doc_id)
ORDER BY u.doc_id
"""


# --- Unicode NFC normalization (normalizeUTF8NFC analog) ---

def q_text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``normalizeUTF8NFC`` analog via a vectorized Pandas
    UDF (Spark has no built-in Unicode normalizer): per document,
    whether the text is already NFC, its normalized length, and an md5
    of the normalized form — value-checked against DuckDB's native
    ``nfc_normalize``.  The kernel is ``unicodedata.normalize`` over
    Arrow string batches; combining-character edge cases are pinned in
    tests with explicitly non-NFC inputs (the fixture corpus is already
    NFC, which the ``is_nfc`` column demonstrates rather than hides)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(texts: pd.Series) -> pd.Series:
        import unicodedata

        return texts.map(lambda t: unicodedata.normalize("NFC", t))

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", nfc("text").alias("norm"), "text")
        .select(
            "doc_id",
            (F.col("norm") == F.col("text")).alias("is_nfc"),
            F.length("norm").cast("long").alias("norm_len"),
            F.md5(F.col("norm").cast("binary")).alias("norm_md5"),
        )
        .orderBy("doc_id")
    )


O_NFC_NORMALIZE = """
SELECT doc_id,
       nfc_normalize(text) = text AS is_nfc,
       CAST(length(nfc_normalize(text)) AS BIGINT) AS norm_len,
       md5(nfc_normalize(text)) AS norm_md5
FROM documents ORDER BY doc_id
"""


# --- Arrow-batched Pandas UDF path, value-checked ---

def q_text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-diversity quality signal computed in a **vectorized
    Pandas UDF** — the sanctioned Python escape hatch (Arrow batch
    transfer, ~10-100× over row-at-a-time UDFs), gated through the same
    value-check as every Catalyst operator to prove the Python path
    loses nothing.

    Per doc: distinct characters, character length, and their ratio
    (one IEEE division of two exact ints — deterministic).  Spark-side
    the UDF sees pandas Series batches; the DuckDB twin is
    list_distinct(string_split(text, '')).  Use this shape only when
    Catalyst can't express the kernel (here it could — see
    string-function suites — which is exactly why it makes a good
    differential test of the UDF machinery itself)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_distinct_chars(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(set(t)))

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            n_distinct_chars("text").alias("n_uniq_chars"),
            F.length("text").cast("long").alias("n_chars_len"),
        )
        .withColumn(
            "diversity",
            F.col("n_uniq_chars").cast("double") / F.col("n_chars_len"),
        )
        .orderBy("doc_id")
    )


O_CHAR_DIVERSITY = """
SELECT doc_id,
       CAST(len(list_distinct(string_split(text, ''))) AS BIGINT)
         AS n_uniq_chars,
       CAST(length(text) AS BIGINT) AS n_chars_len,
       CAST(len(list_distinct(string_split(text, ''))) AS DOUBLE)
         / length(text) AS diversity
FROM documents ORDER BY doc_id
"""


def q_text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation statistics — the sentence-level quality
    signals (count, mean/max length) used by pretraining filters such
    as Gopher's rules.  Segmentation is a shared regex split on
    terminal-punctuation runs with empty fragments dropped; all stats
    derive from exact integer sums (one IEEE division for the mean), so
    both engines agree bit-for-bit.  Map-only — runs at scan speed."""
    d = load_table(spark, sf_dir, "documents")
    sents = "filter(split(text, '[.!?]+'), s -> length(trim(s)) > 0)"
    lens = f"transform({sents}, s -> length(trim(s)))"
    return (
        d.select(
            "doc_id",
            F.expr(f"size({sents})").cast("int").alias("n_sentences"),
            F.expr(f"aggregate({lens}, 0L, (a, x) -> a + x)").alias("_chars"),
            F.expr(
                f"coalesce(array_max({lens}), 0)"
            ).cast("int").alias("max_sentence_chars"),
        )
        .withColumn(
            "avg_sentence_chars",
            F.when(
                F.col("n_sentences") > 0,
                F.round(
                    F.col("_chars").cast("double") / F.col("n_sentences"), 6
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "doc_id", "n_sentences", "avg_sentence_chars", "max_sentence_chars"
        )
        .orderBy("doc_id")
    )


O_SENTENCE_STATS = """
WITH s AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[.!?]+'),
                     s -> length(trim(s)) > 0) AS sents
  FROM documents),
l AS (
  SELECT doc_id,
         CAST(len(sents) AS INT) AS n_sentences,
         list_sum(list_transform(sents, s -> length(trim(s)))) AS chars_,
         CAST(COALESCE(list_max(list_transform(sents, s -> length(trim(s)))), 0)
              AS INT) AS max_sentence_chars
  FROM s)
SELECT doc_id, n_sentences,
       CASE WHEN n_sentences > 0
            THEN round(CAST(chars_ AS DOUBLE) / n_sentences, 6)
            ELSE 0.0 END AS avg_sentence_chars,
       max_sentence_chars
FROM l ORDER BY doc_id
"""


QUERIES = {
    "text_nfc_normalize": q_text_nfc_normalize,
    "text_char_diversity": q_text_char_diversity,
    "text_sentence_stats": q_text_sentence_stats,
    "text_token_stats": q_text_token_stats,
    "text_repetition": q_text_repetition,
    "text_chunks": q_text_chunks,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
}

ORACLES = {
    "text_nfc_normalize": O_NFC_NORMALIZE,
    "text_char_diversity": O_CHAR_DIVERSITY,
    "text_sentence_stats": O_SENTENCE_STATS,
    "text_token_stats": O_TOKEN_STATS,
    "text_repetition": O_TEXT_REPETITION,
    "text_chunks": O_TEXT_CHUNKS,
    "text_quality": _o_quality(),
    "text_langid": _o_langid(),
    "text_fingerprint": O_FINGERPRINT,
}
