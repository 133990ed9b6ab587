"""Bucketed (pre-shuffled) table materialization and shuffle-free joins.

ClickHouse co-locates joins by sharding key / colocated distributed
tables; the Spark-native equivalent is **bucketing**: write both join
sides ``bucketBy(N, key)`` + ``sortBy(key)``, and every subsequent
sort-merge join on that key reads matching buckets directly — no
Exchange on either side, verified by ``tests/test_plans.py``-style plan
assertions in ``tests/test_bucketing.py``.

This is the 100 TB architecture decision that matters most for a fact
table joined repeatedly on the same key: pay the shuffle once at write
time, amortize it over every downstream query.  Bucket-count guidance:
pick N so one bucket file ≈ 100-200 MB; at 100 TB you don't bucket the
raw bytes into one flat namespace — partition by date first, then
bucket within partitions (N in the low thousands), which keeps file
counts sane and adds partition pruning on top.  Filters on the bucket
key also prune to a single bucket at scan time
(``SelectedBucketsCount: 1 out of 8`` in the scan node).

The materialization is once-per-process-per-sf (same pattern as
``operators/common.star``); results are oracle-checked against the
join-every-time SQL, so bucketing is provably a pure physical rewrite.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.common import dsum, sql_dsum

N_BUCKETS = 8

_READY: set[str] = set()


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9]", "_", sf_dir.strip("/"))


def ensure_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize ``orders`` and ``customer`` bucketed+sorted by
    custkey into the session warehouse, once per process per sf."""
    tag = _tag(sf_dir)
    t_orders, t_cust = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    if tag not in _READY:
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(
            spark.conf.get("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
        ).path
        for tbl, src, key in (
            (t_orders, "orders", "o_custkey"),
            (t_cust, "customer", "c_custkey"),
        ):
            # the metastore is per-process but the warehouse dir is not:
            # clear any orphan location from an earlier process
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(f"{warehouse}/{tbl.lower()}", ignore_errors=True)
            (
                load_table(spark, sf_dir, src)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tbl)
            )
        _READY.add(tag)
    return t_orders, t_cust


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw co-located join (pre-aggregation) — exposed separately so
    the plan test can assert it contains no Exchange."""
    t_orders, t_cust = ensure_bucketed(spark, sf_dir)
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    # merge hint: keep the sort-merge path (broadcast would also be
    # shuffle-free here but hides the bucketing evidence)
    return o.hint("merge").join(c, o.o_custkey == c.c_custkey)


def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and order count per market segment over the bucketed
    join.  The only Exchange in the whole plan is the final tiny
    groupBy(segment) — the join itself reads co-located buckets."""
    return (
        bucketed_join(spark, sf_dir)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


O_BUCKETED_JOIN_REVENUE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


QUERIES = {"bucketed_join_revenue": q_bucketed_join_revenue}
ORACLES = {"bucketed_join_revenue": O_BUCKETED_JOIN_REVENUE}
