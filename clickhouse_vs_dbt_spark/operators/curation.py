"""Corpus-curation operators for the training-data pipeline surface
(SURVEY.md §2.3): benchmark decontamination, sequence packing, weighted
source mixing, PII scrubbing, and deterministic shard export.

These are the operators a 100 TB pretraining-data pipeline runs between
"raw documents" and "tokenized shards":

* decontaminate    — drop training docs that share word n-grams with an
                     evaluation/benchmark set (the standard n-gram
                     overlap decontamination rule).
* sequence_pack    — assign documents to fixed-token-budget packs (the
                     write-side shape of sequence packing for training).
* mixture sample   — per-source keep-rates + inverse-rate loss weights
                     (dataset mixture tuning).
* pii_scrub        — mask emails / long digit runs, report mask counts
                     and a digest of the scrubbed text.
* shard export     — deterministic (shard, position) assignment for
                     reproducible training-data shuffles.

Everything is pure Catalyst expression work (no Python UDFs) and every
operator is DuckDB-oracle-paired — determinism is the point: a re-run
over 100 TB must reproduce the identical curated corpus (resumable,
idempotent, auditable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.dedup import SQL_SHINGLED, _shingled
from clickhouse_vs_dbt_spark.operators.sampling import mix_bucket_sql, mix_hash_sql

# Benchmark membership rule for the decontamination fixture: every 97th
# doc_id plays the role of the held-out eval set.  In production this is
# a real benchmark corpus; the operator shape (small eval side broadcast
# against the training corpus) is identical.
EVAL_MOD = 97

PACK_TOKENS = 256  # token budget per training pack

N_SHARDS = 16  # output shards for the export manifest


# --- n-gram decontamination ---

def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by word-3-gram overlap with the eval
    set: for each training doc sharing at least one shingle with any
    eval doc, report how many distinct shingles hit and how many eval
    docs are implicated.

    Scale shape: the eval set is tiny relative to the corpus (benchmarks
    are KBs, corpora are TBs), so its exploded shingle list broadcasts;
    the training side streams map-side through the broadcast-hash join
    and only the contaminated survivors reach the (small) aggregate.
    The expensive part — shingling the corpus — is the same materialized
    relation the dedup pass uses (operators/dedup.py)."""
    sh = _shingled(spark, sf_dir)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    ev = ex.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    tr = ex.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


O_DECONTAMINATE = f"""
WITH sh AS ({SQL_SHINGLED}),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
ev AS (SELECT doc_id AS eval_id, shingle FROM ex WHERE doc_id % {EVAL_MOD} = 0),
tr AS (SELECT doc_id, shingle FROM ex WHERE doc_id % {EVAL_MOD} <> 0)
SELECT tr.doc_id,
       COUNT(DISTINCT tr.shingle) AS n_hit_shingles,
       COUNT(DISTINCT ev.eval_id) AS n_eval_docs
FROM tr JOIN ev ON tr.shingle = ev.shingle
GROUP BY tr.doc_id ORDER BY doc_id
"""


# --- sequence packing ---

def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-sum sequence packing: within each language, documents in
    doc_id order are assigned to packs of ~{PACK_TOKENS} tokens via
    ``pack_id = floor(exclusive_cumulative_tokens / budget)`` — the
    streaming pack rule (a pack may overflow by at most one document;
    exact first-fit packing is inherently sequential and gains nothing
    at training time).  Output is the per-pack manifest.

    Scale shape: one window cumsum per language partition (a single
    hash-partitioned sort — languages are few and large, and a skewed
    language can be pre-split by a doc_id range salt without changing
    pack contents, since the order key stays (lang, doc_id))."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.withColumn(
            "pack_id", F.floor(cum_excl / PACK_TOKENS).cast("int")
        )
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


O_SEQUENCE_PACK = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents),
c AS (
  SELECT lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t)
SELECT lang, CAST(cum // {PACK_TOKENS} AS INT) AS pack_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM c GROUP BY 1, 2 ORDER BY lang, pack_id
"""


# --- dataset mixture: per-source keep-rates + loss weights ---

# keep-rate percent by source index mod 4 — a stand-in for the tuned
# per-source mixture table a real run would load.
MIX_RATES = {0: 100, 1: 50, 2: 25, 3: 10}

_SRC_IDX_SPARK = "CAST(substring(source, 4) AS INT) % 4"
_SRC_IDX_DUCK = "CAST(substr(source, 4) AS INT) % 4"


def q_mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixture sampling: each source keeps a tuned fraction of
    its documents (deterministic hash bucket, no RNG — idempotent at
    100 TB, see operators/sampling.py), and survivors carry the
    inverse-rate weight so downstream loss re-weighting preserves the
    original source proportions in expectation.  Map-only: the predicate
    and weight are scan-side projections, nothing shuffles."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.expr(_SRC_IDX_SPARK) == k, F.lit(v))
            for k, v in MIX_RATES.items()
        ]
    )
    return (
        d.withColumn("rate", rate)
        .filter(F.expr(mix_bucket_sql("spark")) < F.col("rate"))
        .select(
            "doc_id",
            "source",
            "lang",
            F.round(F.lit(100.0) / F.col("rate"), 6).alias("weight"),
        )
        .orderBy("doc_id")
    )


_SQL_MIX_RATE = "CASE " + " ".join(
    f"WHEN ({_SRC_IDX_DUCK}) = {k} THEN {v}" for k, v in MIX_RATES.items()
) + " END"

O_MIXTURE = f"""
SELECT doc_id, source, lang, round(100.0 / ({_SQL_MIX_RATE}), 6) AS weight
FROM documents
WHERE {mix_bucket_sql('duckdb')} < ({_SQL_MIX_RATE})
ORDER BY doc_id
"""


# --- PII scrubbing ---

# Both patterns are valid and equivalent in Java regex (Spark) and RE2
# (DuckDB): character classes, +, and bounded repetition only.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
DIGITS_RE = "[0-9]{6,}"


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: mask email addresses and ≥6-digit runs,
    report per-doc mask counts and an md5 digest of the scrubbed text
    (the digest stands in for the scrubbed payload so the gate can
    value-check the transformation without array/long-string columns).
    Pure map stage — at 100 TB this fuses into the ingest scan."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
        DIGITS_RE,
        "<NUM>",
    )
    return (
        d.select(
            "doc_id",
            F.size(F.expr(f"regexp_extract_all(text, '{EMAIL_RE}', 0)"))
            .cast("long")
            .alias("n_emails"),
            F.size(F.expr(f"regexp_extract_all(text, '{DIGITS_RE}', 0)"))
            .cast("long")
            .alias("n_digit_runs"),
            F.substring(F.md5(scrubbed), 1, 16).alias("scrub_digest"),
        )
        .orderBy("doc_id")
    )


O_PII_SCRUB = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{DIGITS_RE}')) AS BIGINT) AS n_digit_runs,
       substr(md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{DIGITS_RE}', '<NUM>', 'g')), 1, 16) AS scrub_digest
FROM documents ORDER BY doc_id
"""


# --- deterministic shard export ---

def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-shuffle manifest: shard = mixed hash of
    doc_id mod {N_SHARDS}, position = rank of the hash within the shard.
    This is the scalable form of "globally shuffle the corpus": a global
    row_number() would serialize through one partition, whereas per-shard
    windows parallelize across shards and each shard's internal order is
    still hash-pseudorandom.  Writing then becomes
    ``partitionBy(shard_id)`` with files already in final order."""
    d = load_table(spark, sf_dir, "documents")
    h = F.expr(mix_hash_sql("spark"))
    with_shard = d.select(
        "doc_id", "lang", h.alias("h"), (h % N_SHARDS).alias("shard_id")
    )
    w = Window.partitionBy("shard_id").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        with_shard.withColumn("pos", F.row_number().over(w))
        .select(
            F.col("shard_id").cast("int").alias("shard_id"),
            F.col("pos").cast("int").alias("pos"),
            "doc_id",
            "lang",
        )
        .orderBy("shard_id", "pos")
    )


O_EXPORT_SHARDS = f"""
WITH h AS (
  SELECT doc_id, lang, {mix_hash_sql('duckdb')} AS h,
         {mix_hash_sql('duckdb')} % {N_SHARDS} AS shard_id
  FROM documents)
SELECT CAST(shard_id AS INT) AS shard_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard_id
                               ORDER BY h ASC, doc_id ASC) AS INT) AS pos,
       doc_id, lang
FROM h ORDER BY shard_id, pos
"""


# --- token-budget mixture (take-until-quota per source) ---

# per-source token quotas; a pretraining mixture is specified as token
# counts per source, not keep-rates — the sampler must take documents
# until the quota is hit, deterministically, and include the document
# that straddles the boundary (standard "greedy fill" semantics).
TOKEN_BUDGETS = {"src0": 400, "src1": 1200}
DEFAULT_TOKEN_BUDGET = 800
_N_PREFIX_BUCKETS = 64
_PREFIX_DIV = 4294967296 // _N_PREFIX_BUCKETS


def q_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Take documents per source in deterministic hash order until the
    source's token quota is reached (the straddling document is kept).

    The running token total is a **distributed prefix sum**, not a
    per-source window: a per-source cumulative window puts the whole
    source in ONE task — a scale-killer when a source is tens of TB.
    Instead (the corpus_shuffle bucketed-rank pattern):

    1. bucket = hash div (2^32/64) — buckets are monotone in the hash
       order, so (bucket, hash) equals the global hash order;
    2. per-(source, bucket) token totals — a tiny aggregate
       (sources × 64 rows);
    3. exclusive bucket offsets via a window over that tiny relation;
    4. broadcast the offsets back; the within-bucket running sum is a
       window partitioned by (source, bucket) — 64-way parallel per
       source, each partition 1/64th of the source.

    Documents whose cumulative start lies inside the quota survive.
    Deterministic (no RNG): re-runs pick the identical mixture, and
    raising a quota only ADDS documents (the prefix property) — the
    incremental-top-up behavior a curriculum rebuild wants."""
    d = load_table(spark, sf_dir, "documents")
    h = mix_hash_sql("spark", "doc_id")
    base = d.selectExpr(
        "doc_id",
        "source",
        f"{h} AS __h",
        f"CAST({h} div {_PREFIX_DIV} AS INT) AS __b",
        "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS n_tokens",
    )
    per_bucket = base.groupBy("source", "__b").agg(
        F.sum("n_tokens").alias("__bt")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "source",
        "__b",
        F.coalesce(F.sum("__bt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_run = (
        Window.partitionBy("source", "__b")
        .orderBy("__h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    budget = F.coalesce(
        *[
            F.when(F.col("source") == k, F.lit(v))
            for k, v in TOKEN_BUDGETS.items()
        ],
        F.lit(DEFAULT_TOKEN_BUDGET),
    )
    picked = (
        base.join(F.broadcast(offsets), ["source", "__b"])
        .withColumn(
            "__cum", F.col("__off") + F.sum("n_tokens").over(w_run)
        )
        .filter(F.col("__cum") - F.col("n_tokens") < budget)
    )
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source")
    )


_SQL_BUDGET = "CASE " + " ".join(
    f"WHEN source = '{k}' THEN {v}" for k, v in TOKEN_BUDGETS.items()
) + f" ELSE {DEFAULT_TOKEN_BUDGET} END"

# the oracle computes the SAME selection with one global per-source
# cumulative window — valid at oracle scale, and equal to the bucketed
# plan because bucket = hash div D is monotone in the hash order
O_MIXTURE_TOKEN_BUDGET = f"""
WITH t AS (
  SELECT doc_id, source,
         {mix_hash_sql('duckdb', 'doc_id')} AS h,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents),
c AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM c
WHERE cum - n_tokens < ({_SQL_BUDGET})
GROUP BY source ORDER BY source
"""


QUERIES = {
    "decontaminate_ngram": q_decontaminate_ngram,
    "mixture_token_budget": q_mixture_token_budget,
    "sequence_pack": q_sequence_pack,
    "mixture_weighted_sample": q_mixture_weighted_sample,
    "text_pii_scrub": q_text_pii_scrub,
    "export_shards": q_export_shards,
}

ORACLES = {
    "decontaminate_ngram": O_DECONTAMINATE,
    "mixture_token_budget": O_MIXTURE_TOKEN_BUDGET,
    "sequence_pack": O_SEQUENCE_PACK,
    "mixture_weighted_sample": O_MIXTURE,
    "text_pii_scrub": O_PII_SCRUB,
    "export_shards": O_EXPORT_SHARDS,
}
