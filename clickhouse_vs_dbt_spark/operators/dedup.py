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
* MinHash + LSH  — 32 affine-permutation min-hashes over an md5-prefix
                   base hash, 8 bands × 4 rows; candidates from
                   band-bucket self-joins, then exact-Jaccard
                   verification of candidates only.  Linear-ish; the
                   100 TB default.  Engine-portable arithmetic →
                   fully oracle-paired.
* SimHash        — 48-bit signatures (pure Catalyst, md5-prefix token
                   hashes + majority vote), candidate pairs via
                   12-bit-chunk banding (pigeonhole: hamming ≤3 ⇒ some
                   chunk equal), verify with bit_count(xor).  Also
                   oracle-paired.
* embedding      — cosine near-dup within label blocks (blocked
                   O(n²/blocks) exact; the ANN module has the sublinear
                   path).

All thresholds were calibrated on the fixtures (the generator plants
real near-duplicates: 25 pairs with Jaccard ≥ 0.8 at sf0.01).
"""

from __future__ import annotations

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    """(doc_id, shingles, n_shingles) — tokenize + 3-gram shingle.

    Two deliberate choices, both measured at sf0.1 (~5× combined):
    (1) the repartition barrier sits on the RAW (doc_id, text) rows, so
    the CPU-bound tokenize+shingle map runs on every core even when the
    input is a single parquet row-group (at 100 TB the scan already has
    thousands of splits and this narrow shuffle just rebalances skew);
    (2) ``split()`` is bound ONCE per row as a lambda variable — under
    projection collapse, a bare tokens column referenced by the shingle
    CASE would re-tokenize ~4×/row."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    shingle_core = (
        "CASE WHEN size(t) < 3 THEN CAST(array() AS array<string>) "
        "ELSE array_distinct(transform(sequence(0, size(t)-3), "
        "i -> concat_ws(' ', slice(t, i+1, 3)))) END"
    )
    bound = f"transform(array(split(trim(text), '\\\\s+')), t -> {shingle_core})[0]"
    return (
        d.select("doc_id", F.expr(bound).alias("shingles"))
        .withColumn("n_shingles", F.size("shingles"))
    )


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

# Affine-permutation MinHash over a Mersenne-prime field: the classic
# h_i(x) = (a_i·x + b_i) mod p with p = 2^31−1, applied to a 60-bit
# md5-prefix base hash of each shingle.  Every step is plain BIGINT
# arithmetic (a_i·x < 2^62) plus the md5 builtin — available and
# bit-identical in Spark AND DuckDB, so unlike xxhash64-based MinHash
# this one is fully oracle-pairable.  The a/b constants come from a
# fixed-seed MT19937 stream (stable across platforms) — no state to
# coordinate across executors.
MERSENNE = 2147483647  # 2^31 − 1

def _minhash_ab() -> tuple[list[int], list[int]]:
    import numpy as np

    rng = np.random.RandomState(7)
    a = [int(v) for v in rng.randint(1, MERSENNE, MINHASH_K)]
    b = [int(v) for v in rng.randint(0, MERSENNE, MINHASH_K)]
    return a, b


MINHASH_A, MINHASH_B = _minhash_ab()


def md5p_sql(expr: str, dialect: str) -> str:
    """60-bit integer from the first 15 hex chars of md5(expr) —
    the engine-portable base hash (identical in Spark and DuckDB)."""
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}),1,15),16,10) AS BIGINT)"
    return f"CAST(concat('0x', substr(md5({expr}),1,15)) AS BIGINT)"


def minhash_signature(shingled: DataFrame) -> DataFrame:
    """(doc_id, seed, mh) — the K per-seed signature minimums as ROWS,
    from the (doc_id, shingles) relation.

    Shape: one higher-order pass computes the md5-prefix base hash per
    shingle; a codegen'd projection emits the K affine values as an
    inline struct array; ``posexplode`` flattens to (doc_id, seed, v);
    ONE narrow MIN aggregate takes the per-seed minimum.  Two rejected
    formulations, both value-identical: a fold-with-accumulator array
    (K×|shingles| interpreted HOF invocations — slowest) and a K-wide
    MIN aggregate (generates a janino unit whose first-call compile
    cost exceeded the whole query).  Because the shingle relation is
    already hash-partitioned by doc_id (the _shingled barrier), neither
    aggregate here introduces an exchange — the signature pass stays
    map-local at any scale, and map-side combine collapses the exploded
    rows to K/doc before anything moves."""
    xs = shingled.select(
        "doc_id",
        F.explode(
            F.expr(f"transform(shingles, s -> {md5p_sql('s', 'spark')} % {MERSENNE})")
        ).alias("x"),
    )
    vals = ", ".join(
        f"({a} * x + {b}) % {MERSENNE}" for a, b in zip(MINHASH_A, MINHASH_B)
    )
    sv = xs.select(
        "doc_id", F.posexplode(F.expr(f"array({vals})")).alias("seed", "v")
    )
    return sv.groupBy("doc_id", "seed").agg(F.min("v").alias("mh"))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard on the
    candidate set only.

    Pipeline: fold signature (map-only) → band hashes (map-only) → explode
    bands to NARROW rows (doc_id, band_id, band_hash) → self-join within
    (band, hash) buckets → distinct candidate pairs → join the (small)
    candidate set back to the shingle relation → exact-Jaccard verify.

    Scale shape: the only large shuffle moves 3-column rows — the
    shingle arrays themselves never shuffle (carrying them through the
    band explode/self-join 8×-duplicates every array and was measurably
    ~4× slower at sf0.1).  Candidate pairs are rare (only near-dups
    collide in a band), so Spark broadcasts them for the verify
    join-back and the shingle relation is re-scanned map-side only.
    The whole pipeline — md5-prefix base hash, affine permutations mod
    2^31−1, band hashes — is engine-portable arithmetic, so the DuckDB
    oracle replays it exactly (O_DEDUP_MINHASH); the pytest suite
    additionally verifies recall == 1.0 against the exact operator on
    the fixtures (banding at 8×4 makes missing a ≥0.8 pair a ~1e-5
    event).
    """
    # Persist the shingle relation ONCE: it feeds three consumers (the
    # signature pass and both sides of the exact-Jaccard verify) and
    # tokenizing+shingling is the single most expensive map stage —
    # recomputing it per consumer tripled the cold cost.  Disk-backed
    # cache of (doc_id, shingles) ≈ the corpus itself; at 100 TB this
    # is the standard "materialize the tokenized relation" step (write
    # it as a table at ingest and every dedup pass reuses it).
    sh = (
        _shingled(spark, sf_dir)
        .filter(F.col("n_shingles") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sig = minhash_signature(sh)
    # Band key = md5-prefix int64 of the band's 4 signature values in
    # seed order — 8 bytes on the wire; one more map-local aggregate
    # (same doc_id partitioning) rolls the 4 row-mins per band up.
    bands = sig.groupBy(
        "doc_id", (F.col("seed") / 4).cast("int").alias("band_id")
    ).agg(
        F.expr(
            md5p_sql(
                "concat_ws(',', transform(sort_array(collect_list(struct(seed, mh))), "
                "t -> CAST(t.mh AS STRING)))",
                "spark",
            )
        ).alias("band_hash")
    )
    # The self-join would otherwise evaluate the signature map twice
    # (once per side); persist the narrow band rows too — ~24 bytes ×
    # 8 bands per doc, disk-spillable, the standard shape for LSH at
    # scale.
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


def _o_minhash() -> str:
    """DuckDB replay of the exact MinHash-LSH pipeline above — same
    base hash, same affine permutations, same band keys, same exact-
    Jaccard verify."""
    p = MERSENNE
    mh_cols = ",\n         ".join(
        f"list_min(list_transform(xs, x -> ({a} * x + {b}) % {p})) AS mh_{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band_id, {h} AS band_hash FROM sig".format(
            b=b,
            h=md5p_sql(
                "concat_ws(',', "
                + ", ".join(f"CAST(mh_{b * 4 + r} AS VARCHAR)" for r in range(4))
                + ")",
                "duckdb",
            ),
        )
        for b in range(LSH_BANDS)
    )
    return f"""
WITH sh AS ({SQL_SHINGLED}),
xs AS (
  SELECT doc_id, n_shingles, shingles,
         list_transform(shingles, s -> {md5p_sql('s', 'duckdb')} % {p}) AS xs
  FROM sh WHERE n_shingles > 0),
sig AS (
  SELECT doc_id,
         {mh_cols}
  FROM xs),
bands AS (
  {band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         / CAST(sa.n_shingles + sb.n_shingles
                - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard
  FROM cand c
  JOIN xs sa ON sa.doc_id = c.doc_a
  JOIN xs sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


# --- SimHash ---

SIMHASH_BITS = 48  # md5-prefix bits used for the signature
SIMHASH_CHUNK_BITS = 12  # 4 chunks × 12 bits


def _simhash48_udf():
    """Vectorized Pandas UDF computing the 48-bit SimHash from
    md5-prefix token hashes (the same base hash the DuckDB oracle
    uses, so the values stay fully gate-checkable)."""
    import hashlib

    import numpy as np
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def simhash48(token_arrays: pd.Series) -> pd.Series:
        shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
        weights = np.int64(1) << shifts
        # token → ±1 bit vector, memoized across the Arrow batch:
        # natural language repeats tokens heavily, so most lookups hit
        # the cache instead of re-hashing.
        cache: dict[str, np.ndarray] = {}
        out = []
        for toks in token_arrays:
            acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
            for t in set(toks):
                bits = cache.get(t)
                if bits is None:
                    h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                    bits = np.where((h >> shifts) & 1 == 1, 1, -1).astype(np.int64)
                    cache[t] = bits
                acc += bits
            out.append(int(((acc > 0) * weights).sum()))
        return pd.Series(out, dtype="int64")

    return simhash48


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 48-bit SimHash over each doc's distinct
    tokens: md5-prefix token hash, per-bit ±1 majority vote.

    This is the sanctioned Pandas-UDF slow path, on purpose: the
    alternative pure-Catalyst formulation (explode 48 ±1 contributions
    per token and aggregate) multiplies the token stream 48× before the
    first aggregate — measured ~4× slower at sf0.1 and the wrong shape
    at 100 TB, where a per-row numpy bit-twiddle beats a 48× row
    blowup.  The UDF is Arrow-batched, memoizes token hashes across
    the batch, and — because the base hash is the same md5 prefix the
    DuckDB oracle replays — the signatures remain value-checked at the
    driver gate (bit-for-bit).  The repartition barrier spreads the
    CPU-bound pass across cores even from a single input split."""
    sc_parallelism = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(sc_parallelism, "doc_id")
        .select(
            "doc_id",
            _simhash48_udf()(F.array_distinct(tokens())).alias("simhash"),
        )
    )


def simhash_chunks(col: str = "simhash", n_chunks: int = 4) -> list:
    """12-bit chunks for banding (pigeonhole: hamming ≤ n_chunks-1 ⇒
    at least one chunk equal)."""
    return [
        (
            F.shiftrightunsigned(F.col(col), SIMHASH_CHUNK_BITS * i).bitwiseAND(
                F.lit((1 << SIMHASH_CHUNK_BITS) - 1)
            )
        ).alias(f"chunk_{i}")
        for i in range(n_chunks)
    ]


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: signatures → chunk banding → verify with
    popcount(xor) ≤ 3.  Fully oracle-paired (md5-prefix signatures are
    portable arithmetic — O_DEDUP_SIMHASH replays them in DuckDB);
    pytest additionally pins pair recall on constructed near-dups."""
    d = load_table(spark, sf_dir, "documents")
    sigs = simhash_signatures(d)
    # Persist the (doc_id, simhash, chunks) relation: 4 banding
    # self-joins × 2 sides would otherwise re-run the signature UDF 8×.
    # ~30 B/doc, disk-spillable — signature tables are what you
    # materialize at ingest at 100 TB.
    chunked = sigs.select("doc_id", "simhash", *simhash_chunks()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
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
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def _o_simhash() -> str:
    """DuckDB replay of the SimHash pipeline — same md5-prefix token
    hash, same majority vote, same chunk banding and popcount verify."""
    chunk_cols = ", ".join(
        f"(simhash // {1 << (SIMHASH_CHUNK_BITS * i)}) % {1 << SIMHASH_CHUNK_BITS}"
        f" AS chunk_{i}"
        for i in range(4)
    )
    chunk_joins = "\n  UNION ALL\n  ".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"a.simhash AS sig_a, b.simhash AS sig_b "
        f"FROM chunked a JOIN chunked b "
        f"ON a.chunk_{i} = b.chunk_{i} AND a.doc_id < b.doc_id"
        for i in range(4)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
  FROM documents),
th AS (SELECT doc_id, {md5p_sql('tok', 'duckdb')} AS h FROM toks),
contrib AS (
  SELECT doc_id, j,
         CASE WHEN (h // CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END AS s
  FROM th, generate_series(0, {SIMHASH_BITS - 1}) t(j)),
per_bit AS (SELECT doc_id, j, SUM(s) AS sj FROM contrib GROUP BY doc_id, j),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN sj > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM per_bit GROUP BY doc_id),
chunked AS (SELECT doc_id, simhash, {chunk_cols} FROM sig),
pairs AS (
  {chunk_joins}),
uniq AS (SELECT DISTINCT doc_a, doc_b, sig_a, sig_b FROM pairs)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM uniq WHERE bit_count(xor(sig_a, sig_b)) <= 3
ORDER BY doc_a, doc_b
"""


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


# --- incremental (batch-vs-corpus) dedup ---

def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot dedup: dedup an incoming batch against an existing
    corpus, keeping only batch docs whose normalized text is (a) new
    relative to the corpus and (b) first within the batch.  The fixture
    split is doc_id parity (even = corpus, odd = incoming batch).

    Shape: batch-side exact dedup (hash groupBy) → LEFT ANTI join on the
    corpus's distinct keys.  At 100 TB the corpus side is a key-only
    relation (or a persisted bloom/bucketed key table) — the anti-join
    shuffles keys, never text, and AQE converts it to broadcast when a
    day's batch is small relative to the corpus."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "text_key", F.lower(F.trim(F.col("text")))
    )
    corpus_keys = d.filter(F.col("doc_id") % 2 == 0).select("text_key").distinct()
    batch = (
        d.filter(F.col("doc_id") % 2 == 1)
        .groupBy("text_key")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_in_batch"))
    )
    return (
        batch.join(corpus_keys, "text_key", "left_anti")
        .select("keep_doc_id", "n_in_batch")
        .orderBy("keep_doc_id")
    )


O_DEDUP_INCREMENTAL = """
WITH keyed AS (SELECT doc_id, lower(trim(text)) AS text_key FROM documents),
batch AS (
  SELECT text_key, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_in_batch
  FROM keyed WHERE doc_id % 2 = 1 GROUP BY text_key)
SELECT keep_doc_id, n_in_batch
FROM batch
WHERE text_key NOT IN (SELECT text_key FROM keyed WHERE doc_id % 2 = 0)
ORDER BY keep_doc_id
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_incremental": q_dedup_incremental,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding,
}

ORACLES = {
    "dedup_exact": O_DEDUP_EXACT,
    "dedup_incremental": O_DEDUP_INCREMENTAL,
    "dedup_ngram_jaccard": O_DEDUP_NGRAM,
    "dedup_minhash_lsh": _o_minhash(),
    "dedup_simhash": _o_simhash(),
    "dedup_embedding_cosine": O_DEDUP_EMBEDDING,
}
