"""Connected components over the near-duplicate pair graph — the step
that turns pairwise dedup (operators/dedup.py) into dedup *clusters*.

Pairwise output says "A≈B, B≈C"; corpus curation needs the transitive
closure ("{A,B,C} is one document — keep exactly one").  This is an
inherently **iterative** computation; the Spark-native shape is
min-label propagation as a loop of joins over the (tiny, sparse) edge
relation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until a fixed point.  Convergence needs O(component diameter)
rounds — near-dup graphs are overwhelmingly small cliques/chains, so
this is 2-4 rounds in practice.  Each round is one keyed shuffle of the
EDGE relation (not the corpus): at 100 TB of documents the pair graph
is orders of magnitude smaller than the corpus, the per-round action is
a scalar convergence count (no row data on the driver), and long chains
would call for the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) plus
periodic checkpointing to cut lineage — same loop skeleton.

The DuckDB oracle computes the identical closure with a recursive CTE,
so the driver hash-checks an iterative distributed algorithm against a
declarative SQL fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    SQL_SHINGLED,
    _exact_jaccard_pairs,
    _shingled,
)

MAX_ROUNDS = 20  # safety bound; fixtures converge in <5


def connected_components(edges: DataFrame) -> DataFrame:
    """Min-label propagation over an undirected edge list
    (``doc_a``/``doc_b``).  Returns (doc_id, cluster_rep) where
    cluster_rep is the component's minimum doc_id."""
    sym = edges.selectExpr("doc_a AS u", "doc_b AS v").unionByName(
        edges.selectExpr("doc_b AS u", "doc_a AS v")
    )
    sym = sym.persist()
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    prev_persisted: DataFrame | None = None

    for _ in range(MAX_ROUNDS):
        neigh = (
            sym.join(labels.withColumnRenamed("u", "v"), on="v")
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neigh, on="u", how="left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
                (F.coalesce("nmin", F.col("label")) < F.col("label")).alias(
                    "chg"
                ),
            )
        )
        updated = updated.persist()
        n_changed = updated.filter(F.col("chg")).count()  # scalar only
        # the count materialized `updated`; the previous round's cache
        # (its parent) is now dead weight — drop it to bound memory at
        # O(1) cached rounds regardless of iteration count.
        if prev_persisted is not None:
            prev_persisted.unpersist()
        prev_persisted = updated
        labels = updated.select("u", "label")
        if n_changed == 0:
            break
    else:
        # Falling through with n_changed > 0 would silently return
        # partially-propagated (wrong) labels — a long-chain component
        # at scale needs more rounds, not a wrong answer.
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {MAX_ROUNDS} rounds "
            f"({n_changed} labels still changing); raise MAX_ROUNDS for "
            "long-diameter graphs"
        )
    sym.unpersist()
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_rep"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clusters over the exact n-gram Jaccard pairs (≥ 0.8):
    every document that participates in a near-dup pair, labeled with
    its component representative (the cluster's min doc_id — the
    deterministic "keep" candidate)."""
    pairs = _exact_jaccard_pairs(_shingled(spark, sf_dir)).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    return connected_components(pairs.select("doc_a", "doc_b")).orderBy("doc_id")


O_DEDUP_CLUSTERS = f"""
WITH RECURSIVE sh AS ({SQL_SHINGLED}),
ex AS (SELECT doc_id, n_shingles, unnest(shingles) AS shingle FROM sh),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common,
         any_value(a.n_shingles) AS na, any_value(b.n_shingles) AS nb
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM cand
  WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE)
        >= {JACCARD_THRESHOLD}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs),
reach(u, v) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
SELECT u AS doc_id, MIN(v) AS cluster_rep
FROM reach GROUP BY u ORDER BY doc_id
"""

QUERIES = {"dedup_clusters": q_dedup_clusters}
ORACLES = {"dedup_clusters": O_DEDUP_CLUSTERS}
