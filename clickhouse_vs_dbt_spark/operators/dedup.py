"""Deduplication operators over the ``documents`` table — the
training-data-pipeline surface the driver mandates (SURVEY.md §2.3).

Five tiers, each the idiomatic Spark shape for its scale:

* exact          — hash groupBy on a normalized key (one shuffle).
* n-gram Jaccard — exact similarity via a shingle inverted index
                   (explode → self-join on shingle → count/union).
                   Oracle-checkable; quadratic in per-shingle frequency,
                   so at 100 TB you cap posting-list length (drop
                   ubiquitous shingles — they carry no signal) or fall
                   back to MinHash below.
* MinHash + LSH  — 32 xxhash64 min-hashes, 8 bands × 4 rows; candidates
                   from band-bucket self-joins, then exact-Jaccard
                   verification of candidates only.  Linear-ish; the
                   100 TB default.
* SimHash        — 64-bit signatures (vectorized Pandas UDF), candidate
                   pairs via 16-bit-chunk banding (pigeonhole: hamming
                   ≤3 ⇒ some chunk equal), verify with bit_count(xor).
* embedding      — cosine near-dup within label blocks (blocked
                   O(n²/blocks) exact; the ANN module has the sublinear
                   path).

All thresholds were calibrated on the fixtures (the generator plants
real near-duplicates: 25 pairs with Jaccard ≥ 0.8 at sf0.01).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.functions.textfns import tokens, word_shingles

JACCARD_THRESHOLD = 0.8
COSINE_THRESHOLD = 0.3
MINHASH_K = 32
LSH_BANDS = 8  # 8 bands × 4 rows = 32 hashes


# --- exact dedup ---

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: one row per distinct key, keeping
    the smallest doc_id (deterministic winner).  Single hash-aggregate
    shuffle on the key — the 100 TB shape (no sort, no window)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("text_key", F.lower(F.trim(F.col("text"))))
        .groupBy("text_key")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


O_DEDUP_EXACT = """
SELECT min(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY lower(trim(text))
"""


# --- shared shingle relation ---

def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles, n_shingles) with the tokenization materialized
    ONCE behind a repartition barrier.

    Two deliberate choices, both measured at sf0.1: (1) tokenizing in a
    collapsed projection re-evaluates ``split()`` for every reference
    inside the shingle CASE (~4×/row) — the exchange forces tokens to
    compute once; (2) the fixture parquet is a single row-group, so the
    repartition also spreads the CPU-bound shingle/signature map across
    all cores (at 100 TB the scan already has thousands of splits and
    this narrow (doc_id, tokens) shuffle just rebalances skew).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens().alias("t")).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return tok.select(
        "doc_id", word_shingles("t", 3).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))


SQL_SHINGLED = """
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t)-1, 1)),
                       i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS shingles,
         len(list_distinct(list_transform(range(1, greatest(len(t)-1, 1)),
                       i -> t[i]||' '||t[i+1]||' '||t[i+2]))) AS n_shingles
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') t FROM documents)
"""


def _exact_jaccard_pairs(shingled: DataFrame) -> DataFrame:
    """Inverted-index exact Jaccard: explode → self-join on shingle →
    common counts → |A∪B| = |A|+|B|−|A∩B|."""
    ex = shingled.select(
        "doc_id", "n_shingles", F.explode("shingles").alias("shingle")
    )
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("a.n_shingles").alias("na"),
            F.first("b.n_shingles").alias("nb"),
        )
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (≥ 0.8)."""
    pairs = _exact_jaccard_pairs(_shingled(spark, sf_dir))
    return (
        pairs.filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


O_DEDUP_NGRAM = f"""
WITH sh AS ({SQL_SHINGLED}),
ex AS (SELECT doc_id, n_shingles, unnest(shingles) AS shingle FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common,
         any_value(a.n_shingles) AS na, any_value(b.n_shingles) AS nb
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM pairs
WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# --- MinHash + LSH ---

def minhash_signature(shingles_col: str = "shingles") -> list:
    """K min-hashes, each min over xxhash64(seed, shingle) — pure
    Catalyst expressions, one pass over the shingle array."""
    return [
        F.array_min(
            F.expr(f"transform({shingles_col}, s -> xxhash64({seed}L, s))")
        ).alias(f"mh_{seed}")
        for seed in range(MINHASH_K)
    ]


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard on the
    candidate set only.

    Pipeline: signature (map-only) → band hashes (map-only) → explode
    bands to NARROW rows (doc_id, band_id, band_hash) → self-join within
    (band, hash) buckets → distinct candidate pairs → join the (small)
    candidate set back to the shingle relation → exact-Jaccard verify.

    Scale shape: the only large shuffle moves 3-column rows — the
    shingle arrays themselves never shuffle (carrying them through the
    band explode/self-join 8×-duplicates every array and was measurably
    ~4× slower at sf0.1).  Candidate pairs are rare (only near-dups
    collide in a band), so Spark broadcasts them for the verify
    join-back and the shingle relation is re-scanned map-side only.
    xxhash64 is not available in DuckDB, so this operator has a
    rows-only driver check; the pytest suite verifies recall == 1.0
    against the exact operator on the fixtures (banding at 8×4 makes
    missing a ≥0.8 pair a ~1e-5 event).
    """
    sh = _shingled(spark, sf_dir).filter(F.col("n_shingles") > 0)
    sig = sh.select("doc_id", *minhash_signature())
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * 4 + r}") for r in range(4)]).alias(f"band_{b}")
        for b in range(LSH_BANDS)
    ]
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*band_cols)).alias("band_id", "band_hash"),
    )
    # The self-join would otherwise evaluate the shingle+signature map
    # twice (once per side); persist the narrow band rows instead —
    # ~24 bytes × 8 bands per doc, disk-spillable, the standard shape
    # for LSH at scale.
    from pyspark import StorageLevel

    bands = bands.persist(StorageLevel.MEMORY_AND_DISK)
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
    )
    return (
        verified.filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# --- SimHash ---

@F.pandas_udf(T.LongType())
def simhash64(token_arrays: pd.Series) -> pd.Series:
    """64-bit SimHash over a doc's distinct tokens (blake2b token
    hashes; majority vote per bit).  Vectorized Pandas UDF — the
    sanctioned slow path; ~µs/doc, Arrow-batched."""
    import numpy as np

    weights = 1 << np.arange(64, dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    # token → ±1 bit vector, memoized across the Arrow batch: natural
    # language repeats tokens heavily, so most lookups hit the cache
    # instead of re-hashing (~5× on the fixtures).
    cache: dict[str, "np.ndarray"] = {}
    out = []
    for toks in token_arrays:
        acc = np.zeros(64, dtype=np.int64)
        for t in set(toks):
            bits = cache.get(t)
            if bits is None:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
                )
                bits = np.where((np.uint64(h) >> shifts) & np.uint64(1) == 1, 1, -1)
                cache[t] = bits
            acc += bits
        sig = np.uint64(((acc > 0).astype(np.uint64) * weights).sum())
        out.append(int(sig.astype(np.int64)))  # reinterpret as signed for LongType
    return pd.Series(out, dtype="int64")


def simhash_chunks(col: str = "simhash", n_chunks: int = 4) -> list:
    """16-bit chunks for banding (pigeonhole: hamming ≤ n_chunks-1 ⇒
    at least one chunk equal)."""
    return [
        (F.shiftrightunsigned(F.col(col), 16 * i).bitwiseAND(F.lit(0xFFFF))).alias(
            f"chunk_{i}"
        )
        for i in range(n_chunks)
    ]


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: signatures → chunk banding → verify with
    popcount(xor) ≤ 3.  Rows-only driver check (blake2b signatures are
    not expressible in DuckDB); pytest pins signatures and pair recall
    on constructed near-dups."""
    d = load_table(spark, sf_dir, "documents")
    sigs = (
        d.select("doc_id", tokens().alias("toks"))
        # Spread the Pandas-UDF signature pass across cores (the fixture
        # parquet is one row-group → one task otherwise).
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", simhash64("toks").alias("simhash"))
    )
    chunked = sigs.select("doc_id", "simhash", *simhash_chunks())
    pairs = None
    for i in range(4):
        a = chunked.alias("a")
        b = chunked.alias("b")
        p = a.join(
            b,
            (F.col(f"a.chunk_{i}") == F.col(f"b.chunk_{i}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        pairs = p if pairs is None else pairs.union(p)
    return (
        pairs.dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# --- embedding cosine near-dup ---

def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact cosine near-dup: pairs within the same ``label``
    block with cosine ≥ 0.3.  Blocking turns O(n²) into
    O(n²/blocks) and maps to a single shuffle on the block key; for
    unblocked sublinear search see operators/similarity.py."""
    from clickhouse_vs_dbt_spark.functions.vectorfns import dot, norm

    # Precompute each vector's norm ONCE map-side: the O(n²/blocks)
    # pair stage then evaluates only the dot product (the norms were
    # 2/3 of the per-pair work — measured ~3× at sf0.1).  Same IEEE
    # expression as cosine(): dot / (sqrt(Σa²) · sqrt(Σb²)).
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm("embedding")
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cos_sim",
            dot("a.embedding", "b.embedding") / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.round(F.col("cos_sim"), 6) >= COSINE_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .orderBy("vec_a", "vec_b")
    )


O_DEDUP_EMBEDDING = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {COSINE_THRESHOLD}
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding,
}

ORACLES = {
    "dedup_exact": O_DEDUP_EXACT,
    "dedup_ngram_jaccard": O_DEDUP_NGRAM,
    # dedup_minhash_lsh / dedup_simhash: rows-only (xxhash64/blake2b not
    # expressible in DuckDB); recall verified against the exact operator
    # in tests/test_dedup.py.
    "dedup_embedding_cosine": O_DEDUP_EMBEDDING,
}
