"""Engine-portable Bloom-filter semi-join — the runtime-filter pattern
as a first-class, value-checked operator.

At 100 TB the highest-leverage join optimization is often not the join
itself but *pre-filtering the fact scan* with a compact summary of the
selective dimension side: Spark's runtime bloom filters and ClickHouse's
JOIN-engine bloom indexes both do this.  Engine internals aren't
portable, so this module builds the Bloom filter from scratch with the
same Wang-mixer hash the sampling module uses (identical int64
arithmetic in Spark and DuckDB):

* build — the selective customer keys are triple-hashed
  (double-hashing: ``pos_i = (h1 + i·h2) mod m``) into an m=4096-bit
  filter materialized as 67 ``(word, bits)`` rows (62 usable bits per int64 word — bit 63 would overflow DuckDB's checked shift, bit 62 the sign) via one ``bit_or``
  aggregate — the partial-aggregatable, mergeable representation (the
  filter of a union is the OR of the filters).
* probe — every order computes its three (word, bit) probes and joins
  the (broadcast) filter words; it passes iff all three bits are set.
* verify — the gate compares, per order-status: rows passing the
  bloom, rows truly matching (exact semi-join), and the false-positive
  count — proving both the filter's correctness (no false negatives:
  ``n_true == n_semi``) and its exact, reproducible selectivity.

Scale shape: the filter is ≤ m/62 rows regardless of build-side size —
broadcast for free; the probe is a map-side hash join + bit test, so
the fact table is pre-filtered before any wide join would run.  The
``bit_or`` build is one keyed aggregate over (key → 3 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_vs_dbt_spark.catalog import register_views
from clickhouse_vs_dbt_spark.operators.sampling import mix_hash_sql

M_BITS = 4096
N_HASH = 3
BAL_MIN = 9000.0  # selective dimension predicate: high-balance customers


def _sql(dialect: str) -> str:
    idiv = "div" if dialect == "spark" else "//"
    shift = (
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 62 AS INT))"
        if dialect == "spark"
        else "(CAST(1 AS BIGINT) << CAST(pos % 62 AS INT))"
    )
    probe_shift = (
        "shiftleft(CAST(1 AS BIGINT), CAST(p.pos % 62 AS INT))"
        if dialect == "spark"
        else "(CAST(1 AS BIGINT) << CAST(p.pos % 62 AS INT))"
    )
    h1 = mix_hash_sql(dialect, "k")
    h2 = mix_hash_sql(dialect, "(k + 1442695040888963)")
    seq = (
        "SELECT explode(sequence(0, {n})) AS i".format(n=N_HASH - 1)
        if dialect == "spark"
        else "SELECT unnest(generate_series(0, {n})) AS i".format(n=N_HASH - 1)
    )
    return f"""
WITH build_keys AS (
  SELECT c_custkey AS k FROM customer WHERE c_acctbal > {BAL_MIN}),
hashes AS (
  SELECT k, {h1} AS h1, {h2} AS h2 FROM build_keys),
positions AS (
  SELECT (h1 + i * h2) % {M_BITS} AS pos
  FROM hashes CROSS JOIN ({seq})),
bloom AS (
  SELECT pos {idiv} 62 AS word, BIT_OR({shift}) AS bits
  FROM positions GROUP BY pos {idiv} 62),
probe AS (
  SELECT o_orderkey, o_orderstatus, o_custkey,
         (h1 + i * h2) % {M_BITS} AS pos
  FROM (SELECT o_orderkey, o_orderstatus, o_custkey,
               {mix_hash_sql(dialect, 'o_custkey')} AS h1,
               {mix_hash_sql(dialect, '(o_custkey + 1442695040888963)')} AS h2
        FROM orders) o
  CROSS JOIN ({seq})),
bloom_pass AS (
  -- DISTINCT positions first (double-hashing may collide i1,i2 onto
  -- one position), then pass iff NO distinct position misses its bit
  -- (absent word row = miss).  Robust to collisions by construction.
  SELECT p.o_orderkey, p.o_orderstatus, p.o_custkey
  FROM (SELECT DISTINCT o_orderkey, o_orderstatus, o_custkey, pos
        FROM probe) p
  LEFT JOIN bloom b ON b.word = p.pos {idiv} 62
  GROUP BY p.o_orderkey, p.o_orderstatus, p.o_custkey
  HAVING SUM(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & {probe_shift}) != 0
             THEN 0 ELSE 1 END) = 0),
truth AS (
  SELECT o_orderkey, o_orderstatus FROM orders
  WHERE o_custkey IN (SELECT k FROM build_keys)),
agg_pass AS (
  SELECT o_orderstatus, COUNT(*) AS n_bloom_pass,
         COUNT(CASE WHEN o_custkey IN (SELECT k FROM build_keys) THEN 1 END)
           AS n_true
  FROM bloom_pass GROUP BY o_orderstatus),
agg_truth AS (
  SELECT o_orderstatus, COUNT(*) AS n_semi FROM truth GROUP BY o_orderstatus)
SELECT t.o_orderstatus,
       CAST(t.n_semi AS BIGINT) AS n_semi,
       CAST(p.n_bloom_pass AS BIGINT) AS n_bloom_pass,
       CAST(p.n_true AS BIGINT) AS n_true,
       CAST(p.n_bloom_pass - p.n_true AS BIGINT) AS n_false_pos
FROM agg_truth t JOIN agg_pass p ON t.o_orderstatus = p.o_orderstatus
ORDER BY t.o_orderstatus
"""


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filtered semi-join of orders against high-balance
    customers; see module doc (``n_true == n_semi`` ⇔ no false
    negatives; ``n_false_pos`` is the filter's exact overshoot)."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_sql("spark"))


QUERIES = {"bloom_semi_join": q_bloom_semi_join}
ORACLES = {"bloom_semi_join": _sql("duckdb")}
