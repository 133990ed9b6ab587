"""Deterministic Lloyd's k-means over the ``embeddings`` table — the
iterative-algorithm pattern (assign → update → repeat) as idiomatic
Spark, with a full DuckDB oracle.

Spark ML's ``KMeans`` (used by the IVF quantizer in
operators/similarity.py) carries fitted state and RNG-dependent init,
so it can only get a rows-only driver check.  This operator instead
pins every source of nondeterminism so the whole algorithm is
value-checkable across engines:

* **init** — the first K vectors by ``vec_id`` (no RNG);
* **assignment** — squared-L2 distances summed in ``DECIMAL(28,12)``
  (order-free, so partitioning-independent), argmin tie-broken by
  cluster id;
* **update** — decimal-exact component means rounded to 6 decimals, so
  the next iteration's centroids are the same bits in both engines.

Scale shape: each iteration is one map-side assignment pass (centroids
are a K×dim literal — effectively a broadcast of the model state, the
same pattern every distributed k-means uses) plus one keyed aggregate
of (cluster, pos) cells.  Driver round-trips K×dim doubles per
iteration — model state, not data.  At 100 TB: identical plan, plus
you'd sample for init and cache the featurized scan across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

K = 4
ITERS = 2
DIM = 64
DDIST = "DECIMAL(28,12)"


def _dist2_expr(centroid: list[float]) -> str:
    """Order-free squared L2 distance to a literal centroid: per-term
    doubles cast to decimal, summed associatively in one fold."""
    arr = "array(" + ", ".join(f"{c!r}D" for c in centroid) + ")"
    return (
        f"aggregate(zip_with(embedding, {arr}, "
        f"(x, y) -> CAST((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) AS {DDIST})), "
        f"CAST(0 AS {DDIST}), (acc, t) -> CAST(acc + t AS {DDIST}))"
    )


def _assign(e: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    """(vec_id, embedding, cluster) — nearest centroid, ties to the
    lowest cluster id via lexicographic struct min."""
    structs = ", ".join(
        f"named_struct('d', {_dist2_expr(c)}, 'c', {k})"
        for k, c in sorted(centroids.items())
    )
    return e.withColumn("cluster", F.expr(f"array_min(array({structs})).c"))


def _update(assigned: DataFrame) -> DataFrame:
    """(cluster, pos, c, n) — decimal-exact component means, rounded to
    6 so the centroid bits match across engines and iterations."""
    flat = assigned.select(
        "cluster", F.posexplode("embedding").alias("pos", "component")
    )
    return flat.groupBy("cluster", "pos").agg(
        F.round(
            F.sum(F.col("component").cast("double").cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count("component"),
            6,
        ).alias("c"),
        F.count("component").alias("n"),
    )


_FIT_CACHE: dict[tuple[str, int], dict[int, list[float]]] = {}


def fit_centroids(
    spark: SparkSession, sf_dir: str, iters: int = ITERS
) -> dict[int, list[float]]:
    """Deterministic quantizer fit: ``iters`` Lloyd rounds from the
    first-K init; returns cluster → centroid literals (the model state
    the deterministic IVF in operators/similarity.py broadcasts).
    The fit is a pure function of (sf_dir, iters), so it is memoized
    per process — quantizer fitting is ingest-time model state, not
    per-query work (three IVF queries share it)."""
    cached = _FIT_CACHE.get((sf_dir, iters))
    if cached is not None:
        return cached
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < K).collect()
    }
    for _ in range(iters):
        cells = _update(_assign(e, centroids)).collect()
        centroids = {}
        for r in cells:
            centroids.setdefault(r.cluster, [0.0] * DIM)[r.pos] = r.c
    _FIT_CACHE[(sf_dir, iters)] = centroids
    return centroids


def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=4 clusters, 2 Lloyd iterations; returns the final centroid
    cells (cluster, pos, c, n_vectors), one row per cell."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = fit_centroids(spark, sf_dir)
    final = _update(_assign(e, centroids))
    return final.select(
        "cluster", "pos", "c", F.col("n").alias("n_vectors")
    ).orderBy("cluster", "pos")


def kmeans_ctes() -> str:
    """The DuckDB replay of the fit as a reusable WITH-chain prefix:
    flat → cent0 → assign1 → cent1 → assign2 → cent2 (the fitted
    quantizer) → assign3 (the final corpus assignment).  Shared by the
    kmeans oracle and the deterministic-IVF oracle
    (operators/similarity.py)."""
    flat = f"""
  SELECT vec_id, pos - 1 AS pos, CAST(embedding[pos] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, {DIM}) t(pos)"""
    assign = """
  SELECT vec_id, cluster FROM (
    SELECT f.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY f.vec_id
             ORDER BY SUM(CAST((f.x - c.c) * (f.x - c.c) AS {ddist})), c.cluster
           ) AS rn
    FROM flat f JOIN {cents} c ON f.pos = c.pos
    GROUP BY f.vec_id, c.cluster)
  WHERE rn = 1"""
    update = """
  SELECT a.cluster, f.pos,
         round(CAST(SUM(CAST(f.x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS c,
         COUNT(*) AS n
  FROM {assigned} a JOIN flat f ON f.vec_id = a.vec_id
  GROUP BY a.cluster, f.pos"""
    return f"""
flat AS ({flat}),
cent0 AS (
  SELECT vec_id AS cluster, pos, x AS c FROM flat WHERE vec_id < {K}),
assign1 AS ({assign.format(ddist=DDIST, cents='cent0')}),
cent1 AS ({update.format(assigned='assign1')}),
assign2 AS ({assign.format(ddist=DDIST, cents='cent1')}),
cent2 AS ({update.format(assigned='assign2')}),
assign3 AS ({assign.format(ddist=DDIST, cents='cent2')}),
final AS ({update.format(assigned='assign3')})"""


def _o_kmeans() -> str:
    """DuckDB replay: the same two assign/update rounds as chained CTEs
    (flattened per-pos), then the final assignment and means."""
    return f"""
WITH {kmeans_ctes()}
SELECT cluster, pos, c, CAST(n AS BIGINT) AS n_vectors
FROM final ORDER BY cluster, pos
"""


QUERIES = {"kmeans_lloyd": q_kmeans_lloyd}
ORACLES = {"kmeans_lloyd": _o_kmeans()}
