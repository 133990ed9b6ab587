"""Corpus sampling / rebalancing operators over ``documents``
(SURVEY.md §2.3 — training-data pipeline surface).

Training corpora are routinely rebalanced: dominant languages or
sources are downsampled to target rates, and per-class loss weights
compensate for what remains.  Both operators here are **deterministic**
— sampling uses a Knuth multiplicative hash of the stable ``doc_id``
rather than an RNG, so (a) the oracle can reproduce it exactly in SQL,
(b) a re-run over 100 TB selects the identical subset (idempotent
pipelines, resumable after partial failure), and (c) there is no seed
state to coordinate across executors.  ``df.sample()``/``sampleBy()``
trade those properties for statistical niceties; for corpus curation
the deterministic form is the one you want.

Both are map-only / single-agg — no shuffle beyond the final tiny
aggregate; at 100 TB the sample predicate pushes into the scan's
projection and costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

# per-language keep-rates (percent): downsample English, keep the rest
RATES = {"en": 30, "de": 100, "es": 100, "fr": 100, "zh": 100}
KNUTH = 2654435761  # 2^32 * golden ratio; doc_id * KNUTH stays < 2^63


def _keep_bucket() -> F.Column:
    """Deterministic pseudo-uniform bucket 0..99 from doc_id (identical
    integer arithmetic in Spark and DuckDB)."""
    return (F.col("doc_id") * F.lit(KNUTH)) % 100


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsample at the RATES table."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in RATES.items()],
        F.lit(0),
    )
    return (
        d.filter(_keep_bucket() < rate)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_SQL_RATE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in RATES.items()
) + " ELSE 0 END"

O_STRATIFIED = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (doc_id * {KNUTH}) % 100 < {_SQL_RATE}
ORDER BY doc_id
"""


def q_rebalance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language class-balance weights over the *sampled* corpus:
    weight = total/(k·n_lang), the standard inverse-frequency form.
    Composes the sample (map-only) with one global aggregate."""
    s = q_stratified_sample(spark, sf_dir)
    per_lang = s.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = s.count()  # scalar action on a tiny aggregate — not row data
    k = len(RATES)
    return (
        per_lang.withColumn(
            "weight",
            F.round(F.lit(float(total)) / (F.lit(k) * F.col("n_docs")), 6),
        )
        .orderBy("lang")
    )


O_REBALANCE = f"""
WITH sampled AS (
  SELECT lang FROM documents
  WHERE (doc_id * {KNUTH}) % 100 < {_SQL_RATE}
)
SELECT lang, COUNT(*) AS n_docs,
       round((SELECT COUNT(*) FROM sampled)::DOUBLE
             / ({len(RATES)} * COUNT(*)), 6) AS weight
FROM sampled GROUP BY lang ORDER BY lang
"""

QUERIES = {
    "stratified_sample": q_stratified_sample,
    "rebalance_weights": q_rebalance_weights,
}

ORACLES = {
    "stratified_sample": O_STRATIFIED,
    "rebalance_weights": O_REBALANCE,
}
