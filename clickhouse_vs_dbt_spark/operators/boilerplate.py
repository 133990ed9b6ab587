"""Sub-document dedup: corpus-wide boilerplate n-gram removal
(C4-style repeated-span scrubbing).

Document-level dedup (operators/dedup.py) drops whole near-duplicate
documents; real pretraining corpora also need *span*-level cleanup —
navigation chrome, license headers, templated sentences that repeat
across otherwise-distinct pages.  This operator finds every token
8-gram that occurs in ≥2 distinct documents, removes all tokens covered
by any such gram, and re-emits the cleaned text per document.

Pipeline shape (all relational — no UDFs):
  tokens → gram windows (array ops, map-side) → gram document-frequency
  (one shuffle, keyed on gram) → covered positions (explode) →
  anti-join tokens (co-partitioned on doc_id) → per-doc re-assembly.

Scale: the gram-DF aggregate is the only corpus-wide shuffle, and it is
partial-aggregated map-side.  At 100 TB the gram *string* should not be
the shuffle key — hash each gram to 64 bits first (xxhash64) and accept
the ~2⁻⁶⁴ collision rate, shrinking shuffle width ~10×; the string form
is kept here because the DuckDB oracle must group on identical values.
The cover/anti-join stages shuffle on doc_id only — narrow keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

NGRAM = 8
MIN_DF = 2


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )


def q_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: token counts before/after boilerplate-gram removal
    plus the cleaned text itself (empty string when the whole document
    was boilerplate, e.g. exact duplicates).

    Token positions are never exploded: the covered-position set comes
    back as one array per document and the removal is a map-side
    ``filter`` with index over the token array — so the only shuffles
    are the gram-DF aggregate and the per-doc covered-set rollup, both
    narrow."""
    from pyspark import StorageLevel

    base = _toks(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).persist(StorageLevel.MEMORY_AND_DISK)

    grams = base.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(toks) >= {NGRAM} THEN "
                f"transform(sequence(1, size(toks) - {NGRAM - 1}),"
                f" i -> concat_ws(' ', slice(toks, i, {NGRAM}))) "
                "ELSE array() END"
            )
        ).alias("p0", "g"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "g")
    # Two consumers (DF aggregate + frequent-gram join) — computing the
    # gram windows once is the difference between 1× and 2× tokenize cost.
    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)

    freq = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= MIN_DF)
        .select("g")
    )
    cov = (
        grams.join(freq, "g")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {NGRAM - 1})")).alias("cpos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("cpos").alias("cov"))
    )
    kept = F.expr(
        "filter(transform(toks, (x, i) -> struct(i + 1 AS pos, x AS tok)),"
        " s -> NOT array_contains(coalesce(cov, array()), s.pos))"
    )
    return (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            kept.alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("kept").cast("long").alias("n_kept"),
            (F.col("n_tokens") - F.size("kept")).cast("long").alias("n_removed"),
            F.concat_ws(" ", F.transform("kept", lambda s: s["tok"])).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


O_DEDUP_BOILERPLATE = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
toks AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos FROM base),
grams AS (
  SELECT a.doc_id, a.pos, string_agg(b.tok, ' ' ORDER BY b.pos) AS g
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos AND a.pos + {NGRAM - 1}
  GROUP BY a.doc_id, a.pos HAVING COUNT(*) = {NGRAM}),
freq AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= {MIN_DF}),
covered AS (
  SELECT DISTINCT grams.doc_id, grams.pos + o.i AS cpos
  FROM grams JOIN freq ON grams.g = freq.g
  CROSS JOIN (SELECT unnest(range(0, {NGRAM})) AS i) o),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
  WHERE c.cpos IS NULL),
cleaned AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
  FROM kept GROUP BY doc_id)
SELECT base.doc_id,
       CAST(len(base.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(cleaned.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(base.toks) - COALESCE(cleaned.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(cleaned.cleaned_text, '') AS cleaned_text
FROM base LEFT JOIN cleaned ON base.doc_id = cleaned.doc_id
ORDER BY base.doc_id
"""


QUERIES = {"dedup_boilerplate": q_dedup_boilerplate}
ORACLES = {"dedup_boilerplate": O_DEDUP_BOILERPLATE}
