"""Distributed PageRank over the customer–supplier trade graph.

An iterative graph algorithm as idiomatic Spark: the edge relation is a
DataFrame, one PageRank iteration is ``join(ranks, src) → groupBy(dst)
→ sum``, and the driver-side Python loop only *composes* the plan — all
data movement is keyed shuffles on node id.  At 100 TB both edges and
ranks are hash-partitioned on the same key, so every iteration is one
co-partitioned join + one aggregate; persist the edge relation once and
reuse it across iterations (done below).

**Engine-exact by construction**: all arithmetic is int64 — ranks are
mass in units of 1e-12 of the whole graph (S = 10^12), the damping
factor 0.85 is the exact rational 85/100, and per-edge contributions
use floor division (``div``), which Spark and DuckDB define
identically.  That makes a 3-iteration PageRank *value-checkable
against a SQL oracle* (3 unrolled CTEs), something float PageRank can
never be (parallel float sums are order-dependent).

Graph: node per active customer (id = 2·custkey) and supplier
(id = 2·suppkey + 1); an undirected edge (both directions) per distinct
(custkey, suppkey) trade pair from orders ⋈ lineitem.  Symmetric edges
mean no dangling nodes, so mass only leaks through floor-division
remainders (bounded by one unit per in-edge per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

S_MASS = 10**12  # total rank mass, integer units
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
N_ITER = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct symmetric (src, dst) int64 node pairs from the trade
    graph.  One shuffle to dedup; reused (persisted) across
    iterations."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cust_node").alias("src"), F.col("supp_node").alias("dst"))
    rev = pairs.select(F.col("supp_node").alias("src"), F.col("cust_node").alias("dst"))
    return fwd.unionByName(rev)


def q_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 exact-integer PageRank iterations; returns (node_id, rank_e12)
    for every node, rank in 1e-12 mass units."""
    edges = _edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_deg = edges.join(deg, "src").persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    n_nodes = nodes.count()

    base = (S_MASS * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n_nodes)
    ranks = nodes.withColumn("rank", F.lit(S_MASS // n_nodes).cast("long"))
    for _ in range(N_ITER):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                "dst",
                F.expr(f"(rank * {DAMP_NUM}L) div ({DAMP_DEN}L * outdeg)").alias(
                    "c"
                ),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("in_mass", F.lit(0))).alias("rank"),
            )
        )
    out = ranks.select(F.col("node").alias("node_id"), F.col("rank").alias("rank_e12")).orderBy(
        "node_id"
    )
    return out


def _o_pagerank() -> str:
    """DuckDB twin: the same 3 iterations unrolled as CTEs with `//`."""
    base = f"({S_MASS} * {DAMP_DEN - DAMP_NUM}) // ({DAMP_DEN} * p.n)"
    step = """
r{i} AS (
  SELECT n.node, CAST({base} + coalesce(SUM((r.rank * {dnum}) // ({dden} * d.outdeg)), 0) AS BIGINT) AS rank
  FROM nodes n CROSS JOIN params p
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN deg d ON d.src = e.src
  LEFT JOIN r{prev} r ON r.node = e.src
  GROUP BY n.node, p.n)"""
    steps = ",".join(
        step.format(i=i, prev=i - 1, base=base, dnum=DAMP_NUM, dden=DAMP_DEN)
        for i in range(1, N_ITER + 1)
    )
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS cust_node, l_suppkey * 2 + 1 AS supp_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT cust_node AS src, supp_node AS dst FROM pairs
  UNION ALL
  SELECT supp_node AS src, cust_node AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
params AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST({S_MASS} // p.n AS BIGINT) AS rank
       FROM nodes CROSS JOIN params p),
{steps}
SELECT node AS node_id, rank AS rank_e12 FROM r{N_ITER} ORDER BY node_id
"""


QUERIES = {"pagerank_trade_graph": q_pagerank_trade_graph}
ORACLES = {"pagerank_trade_graph": _o_pagerank()}
