"""End-to-end training-corpus preparation pipeline.

Composes the individual training-data operators into the shape an LLM
data pipeline actually runs: exact dedup → language/quality gating →
embedding join → token-budget selection.  One declarative plan; every
stage is a Catalyst-expressible transformation, so the whole pipeline
is a single lazy DAG (scan-pruned, filter-pushed) and the full result
is oracle-checked against DuckDB.

The token-budget stage needs a *global running sum in doc_id order* —
the one operation here that is inherently sequential.  A naive
``Window.orderBy("doc_id")`` collapses to a single partition (fine at
60k rows, dead at 100 TB), so this implements the scalable two-pass
prefix sum instead:

1. range-repartition survivors by doc_id;
2. per-partition running sums (keyed window — parallel);
3. per-partition subtotals to the driver (P rows of metadata — NOT a
   data collect), exclusive-prefixed into offsets;
4. broadcast offsets back; cumulative = offset(pid) + within-partition
   running sum.

Same result as the global window, shuffle-parallel at every step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.text import _o_langid, _o_quality, q_text_langid, q_text_quality

QUALITY_MIN = 0.5
TOKENS_MIN, TOKENS_MAX = 5, 1000
TOKEN_BUDGET = 2_000_000


def running_total_scalable(
    df: DataFrame, order_col: str, value_col: str, out_col: str
) -> DataFrame:
    """Distributed prefix sum of ``value_col`` in ``order_col`` order
    (two-pass: bucket offsets + within-bucket window).

    Buckets are fixed-width ranges of the (numeric) order column,
    derived from one min/max agg — deterministic by construction, so
    the offset pass and the window pass agree on bucket membership
    (``repartitionByRange`` would re-SAMPLE boundaries per job and can
    disagree with itself between executions).
    """
    spark = df.sparkSession
    stats = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if stats["lo"] is None:
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    n_buckets = spark.sparkContext.defaultParallelism
    width = max(1, (int(stats["hi"]) - int(stats["lo"]) + n_buckets) // n_buckets)
    bucketed = df.withColumn(
        "_pid", ((F.col(order_col) - int(stats["lo"])) / width).cast("int")
    )
    w = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_within = bucketed.withColumn("_within", F.sum(value_col).over(w))
    # Bucket subtotals to the driver: n_buckets rows of metadata — the
    # standard prefix-sum driver step, not a data collect.
    subtotals = {
        r["_pid"]: r["_sub"]
        for r in bucketed.groupBy("_pid").agg(F.sum(value_col).alias("_sub")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    offset_expr = (
        F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
        if offsets
        else F.lit(0)
    )
    return with_within.withColumn(out_col, offset_expr + F.col("_within")).drop(
        "_pid", "_within"
    )


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus selection:

    1. exact dedup on normalized text (keep smallest doc_id);
    2. keep docs predicted English with quality_score >= 0.5 and
       5 <= n_tokens <= 1000;
    3. join each survivor's embedding, exposing its L2 norm;
    4. admit docs in doc_id order until the cumulative token budget.
    """
    d = load_table(spark, sf_dir, "documents")
    winners = (
        d.select(F.lower(F.trim("text")).alias("text_key"), "doc_id")
        .groupBy("text_key")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    quality = q_text_quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    lang = q_text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            6,
        ).alias("emb_norm"),
    )
    survivors = (
        winners.join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(emb, "doc_id")
        .filter(
            (F.col("pred_lang") == "en")
            & (F.col("quality_score") >= QUALITY_MIN)
            & F.col("n_tokens").between(TOKENS_MIN, TOKENS_MAX)
        )
    )
    budgeted = running_total_scalable(survivors, "doc_id", "n_tokens", "cum_tokens")
    return (
        budgeted.filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select(
            "doc_id", "n_tokens", "quality_score", "pred_lang", "emb_norm", "cum_tokens"
        )
        .orderBy("doc_id")
    )


def _o_corpus_prep() -> str:
    return f"""
WITH winners AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY lower(trim(text))
), quality AS ({_o_quality()}), lang AS ({_o_langid()}),
emb AS (
  SELECT vec_id AS doc_id,
         round(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS emb_norm
  FROM embeddings
), survivors AS (
  SELECT w.doc_id, q.n_tokens, q.quality_score, l.pred_lang, e.emb_norm
  FROM winners w
  JOIN quality q USING (doc_id)
  JOIN lang l USING (doc_id)
  JOIN emb e USING (doc_id)
  WHERE l.pred_lang = 'en' AND q.quality_score >= {QUALITY_MIN}
    AND q.n_tokens BETWEEN {TOKENS_MIN} AND {TOKENS_MAX}
), budgeted AS (
  SELECT *, CAST(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_tokens
  FROM survivors)
SELECT doc_id, n_tokens, quality_score, pred_lang, emb_norm, cum_tokens
FROM budgeted WHERE cum_tokens <= {TOKEN_BUDGET} ORDER BY doc_id
"""


SHUFFLE_SEED = 42
SHUFFLE_SALT = f":shuffle:{SHUFFLE_SEED}"


def _corpus_shuffle_sql() -> str:
    """Deterministic global training-order permutation WITHOUT a global
    sort — the 'shuffle the corpus before epoch N' step of an LLM
    pipeline, as the distributed two-pass rank:

    1. shuffle key = md5(doc_id ‖ seed) — seeded, engine-portable,
       uniform;
    2. bucket by the key's first two hex chars (≤256 fixed, content-
       derived ranges — no sampled boundaries to disagree between
       passes);
    3. rank WITHIN each bucket (keyed window, parallel);
    4. exclusive-prefix the per-bucket counts (≤256 metadata rows — the
       only unpartitioned window) and add the bucket offset.

    The result is the exact permutation ``ORDER BY md5_key`` would give,
    with the biggest task bounded at ~corpus/256 instead of the whole
    corpus.  Identical SQL executes on both engines — value-checked
    end-to-end."""
    return f"""
WITH keyed AS (
  SELECT doc_id, md5(CAST(doc_id AS STRING) || '{SHUFFLE_SALT}') AS k
  FROM documents),
b AS (
  SELECT doc_id, k,
         ascii(substring(k, 1, 1)) * 256 + ascii(substring(k, 2, 1)) AS bucket
  FROM keyed),
local AS (
  SELECT doc_id, k, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY k, doc_id) AS lr
  FROM b),
counts AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY bucket),
offs AS (
  SELECT bucket,
         COALESCE(SUM(c) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off
  FROM counts)
SELECT l.doc_id, CAST(l.lr + o.off AS BIGINT) AS position
FROM local l JOIN offs o ON l.bucket = o.bucket
ORDER BY position
"""


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global corpus permutation (see :func:`_corpus_shuffle_sql`)."""
    from clickhouse_vs_dbt_spark.catalog import register_views

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_corpus_shuffle_sql())


QUERIES = {"corpus_prep": q_corpus_prep, "corpus_shuffle": q_corpus_shuffle}
ORACLES = {
    "corpus_prep": _o_corpus_prep(),
    "corpus_shuffle": _corpus_shuffle_sql(),
}
