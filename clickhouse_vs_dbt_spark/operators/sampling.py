"""Corpus sampling / rebalancing operators over ``documents``
(SURVEY.md §2.3 — training-data pipeline surface).

Training corpora are routinely rebalanced: dominant languages or
sources are downsampled to target rates, and per-class loss weights
compensate for what remains.  Both operators here are **deterministic**
— sampling uses a Wang-style integer finalizer of the stable ``doc_id``
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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

# per-language keep-rates (percent): downsample English, keep the rest
RATES = {"en": 30, "de": 100, "es": 100, "fr": 100, "zh": 100}

# xxhash32 primes — multiplier constants for the mixer below.
_M1 = 2246822519
_M2 = 3266489917


def mix_hash_sql(dialect: str, col: str = "doc_id") -> str:
    """Pseudo-uniform 32-bit hash of a stable integer id, as a SQL
    expression string for ``dialect`` ('spark' | 'duckdb').

    A single multiplicative (Knuth) hash mod 100 reduces to a fixed
    permutation of ``id mod 100`` (the multiplier is coprime to 100), so
    sampling would stripe by id residue (round-1 ADVICE.md).  This is a
    Wang-style integer finalizer instead — multiply / xor-shift /
    multiply / xor-shift in 32-bit space — so the output mixes every
    input bit.  All arithmetic stays below 2^48 (multiplies are done in
    16-bit halves), hence identical BIGINT semantics in Spark and
    DuckDB: the oracle reproduces the value bit-for-bit, and a 100 TB
    re-run selects the identical rows (idempotent, resumable, no seed
    state to coordinate)."""
    if dialect == "spark":
        xor = lambda a, b: f"({a} ^ {b})"  # noqa: E731
        div = lambda a, b: f"({a} div {b})"  # noqa: E731
    elif dialect == "duckdb":
        xor = lambda a, b: f"xor({a}, {b})"  # noqa: E731
        div = lambda a, b: f"({a} // {b})"  # noqa: E731
    else:  # pragma: no cover
        raise ValueError(dialect)

    def mulmod32(h: str, m: int) -> str:
        # (h * m) mod 2^32 without exceeding 2^48: split h into 16-bit
        # halves; the high half's product re-enters shifted by 16.
        return (
            f"((({h} % 65536) * {m} + (({div(h, 65536)} * {m}) % 65536) * 65536)"
            f" % 4294967296)"
        )

    h = f"({col} % 4294967296)"
    h = mulmod32(h, _M1)
    h = xor(h, div(h, 65536))
    h = mulmod32(h, _M2)
    h = xor(h, div(h, 65536))
    return h


def mix_bucket_sql(dialect: str, col: str = "doc_id") -> str:
    """Pseudo-uniform bucket 0..99 from a stable integer id (see
    :func:`mix_hash_sql`)."""
    return f"({mix_hash_sql(dialect, col)} % 100)"


def _keep_bucket() -> F.Column:
    """Deterministic pseudo-uniform bucket 0..99 from doc_id (identical
    integer arithmetic in Spark and DuckDB)."""
    return F.expr(mix_bucket_sql("spark"))


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
WHERE {mix_bucket_sql('duckdb')} < {_SQL_RATE}
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
  WHERE {mix_bucket_sql('duckdb')} < {_SQL_RATE}
)
SELECT lang, COUNT(*) AS n_docs,
       round((SELECT COUNT(*) FROM sampled)::DOUBLE
             / ({len(RATES)} * COUNT(*)), 6) AS weight
FROM sampled GROUP BY lang ORDER BY lang
"""

RESERVOIR_K = 20  # fixed-size sample per language


def q_reservoir_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (k=20) per-stratum sample: the k documents with the
    smallest mixed hash in each language — the deterministic equivalent
    of per-stratum reservoir sampling (a uniform hash order IS a random
    permutation of the stratum; taking its k smallest is a k-reservoir,
    minus the RNG state).

    Scale shape: one window heap per stratum — rank() over a hash order
    needs only a per-partition top-k + merge (no global sort), and
    re-running over 100 TB reproduces the identical sample for free
    (resumable pipelines; no coordination across executors)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.expr(mix_hash_sql("spark"))
    # doc_id tie-break makes the order total even on hash collision
    w = F.row_number().over(
        Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    )
    return (
        d.withColumn("rk", w)
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "lang", F.col("rk").cast("int").alias("rk"))
        .orderBy("lang", "rk")
    )


O_RESERVOIR = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {mix_hash_sql('duckdb')} ASC, doc_id ASC) AS rk
  FROM documents)
SELECT doc_id, lang, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {RESERVOIR_K}
ORDER BY lang, rk
"""


# --- deterministic train/val/test split ---

SPLIT_BOUNDS = (80, 90)  # hash-bucket < 80 → train, < 90 → val, else test


def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic 80/10/10 train/val/test assignment per
    document — the split every training pipeline needs, as a map-side
    projection of the Wang-mixed id bucket (no RNG, no seed state;
    re-runs and late-arriving shards land in the same split forever,
    and a doc's split never depends on what else is in the batch).
    Emitted as per-(lang, split) counts plus a char-mass checksum so
    the gate verifies the exact membership, not just proportions."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(mix_bucket_sql("spark"))
    split = (
        F.when(bucket < SPLIT_BOUNDS[0], "train")
        .when(bucket < SPLIT_BOUNDS[1], "val")
        .otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang", "split")
    )


O_TRAIN_VAL_TEST = f"""
SELECT lang,
       CASE WHEN {mix_bucket_sql('duckdb')} < {SPLIT_BOUNDS[0]} THEN 'train'
            WHEN {mix_bucket_sql('duckdb')} < {SPLIT_BOUNDS[1]} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY 1, 2 ORDER BY lang, split
"""


SAMPLE_NUM, SAMPLE_DEN = 1, 10  # SAMPLE 1/10
SAMPLE_OFFSET_NUM, SAMPLE_OFFSET_DEN = 1, 2  # OFFSET 1/2


def q_clickhouse_sample_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``SAMPLE 1/10 OFFSET 1/2``: a deterministic
    hash-range slice of the table on its sampling key.  ClickHouse
    keeps rows whose ``intHash32(key)/2^32`` falls in
    [offset, offset + fraction); the analog reuses :func:`mix_hash_sql`
    so the slice is reproducible in both engines bit-for-bit.  OFFSET
    exists so that disjoint sample runs (e.g. A/B analysis halves)
    never overlap — the two properties together are why ClickHouse
    sampling beats ``rand() < p``: idempotent re-runs and composable
    disjoint slices.  The predicate is a map-side filter on a scan
    projection — no shuffle, and at 100 TB the full scan cost is the
    sample's only cost (ClickHouse pays the same unless the table is
    physically sample-ordered)."""
    lo = (4294967296 * SAMPLE_OFFSET_NUM) // SAMPLE_OFFSET_DEN
    hi = lo + (4294967296 * SAMPLE_NUM) // SAMPLE_DEN
    register_tables = load_table(spark, sf_dir, "orders")
    h = mix_hash_sql("spark", "o_orderkey")
    sampled = register_tables.filter(F.expr(f"{h} >= {lo} AND {h} < {hi}"))
    return sampled.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sampled_total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


def _o_sample_clause() -> str:
    lo = (4294967296 * SAMPLE_OFFSET_NUM) // SAMPLE_OFFSET_DEN
    hi = lo + (4294967296 * SAMPLE_NUM) // SAMPLE_DEN
    h = mix_hash_sql("duckdb", "o_orderkey")
    return f"""
SELECT o_orderstatus,
       COUNT(*) AS n_sampled,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS sampled_total,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders
WHERE {h} >= {lo} AND {h} < {hi}
GROUP BY o_orderstatus
"""


QUERIES = {
    "stratified_sample": q_stratified_sample,
    "clickhouse_sample_clause": q_clickhouse_sample_clause,
    "rebalance_weights": q_rebalance_weights,
    "reservoir_per_lang": q_reservoir_per_lang,
    "train_val_test_split": q_train_val_test_split,
}

ORACLES = {
    "stratified_sample": O_STRATIFIED,
    "clickhouse_sample_clause": _o_sample_clause(),
    "train_val_test_split": O_TRAIN_VAL_TEST,
    "rebalance_weights": O_REBALANCE,
    "reservoir_per_lang": O_RESERVOIR,
}
