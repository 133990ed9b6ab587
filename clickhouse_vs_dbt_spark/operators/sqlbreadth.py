"""SQL-surface breadth: recursive CTEs, multiset set operations,
GROUPING/GROUPING_ID, and the URL-function family.

Rounds out corners of the SQL surface a ClickHouse user would expect
(`WITH FILL`-style gap-free series, ``EXCEPT ALL``, ``GROUPING``,
``domain()``/``path()``/``extractURLParameter``) that no other module
exercises.  The recursive month spine runs the SAME SQL text through
``spark.sql`` and the DuckDB oracle — Spark 4's ``WITH RECURSIVE``
makes the dialects meet.

Scale notes: the recursive spine materializes O(months) rows on a
single task — recursion depth is bounded by the calendar, not the data;
the monthly aggregate underneath it is an ordinary partial-aggregated
groupBy.  ``EXCEPT ALL``/``INTERSECT ALL`` hash-partition both sides on
the full row — same cost class as a groupBy.  The URL suite is map-only
(``parse_url`` is a Catalyst expression, codegen'd — no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table, register_views
from clickhouse_vs_dbt_spark.operators.common import sql_dsum

# One SQL text, two engines (Spark 4 WITH RECURSIVE ≡ DuckDB).  The
# anchor scans orders ONCE for both bounds and carries the max along as
# a column, so every recursive step is a one-row filter+project — a
# naive subquery-in-the-recursion formulation re-ran the MAX(orderdate)
# aggregate per iteration (~80 jobs, 30s at sf0.01; this form is <2s).
SQL_MONTH_SPINE = f"""
WITH RECURSIVE spine(m, mx) AS (
  SELECT CAST(date_trunc('month', MIN(CAST(o_orderdate AS DATE))) AS DATE),
         CAST(date_trunc('month', MAX(CAST(o_orderdate AS DATE))) AS DATE)
  FROM orders
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mx FROM spine WHERE m < mx)
SELECT spine.m AS month_start,
       COALESCE(mo.n_orders, 0) AS n_orders,
       COALESCE(mo.revenue, CAST(0.0 AS DOUBLE)) AS revenue
FROM spine LEFT JOIN (
  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS m,
         COUNT(*) AS n_orders,
         {sql_dsum('o_totalprice')} AS revenue
  FROM orders GROUP BY 1) mo ON spine.m = mo.m
ORDER BY month_start
"""


def q_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly order series via ``WITH RECURSIVE`` (ClickHouse
    ``WITH FILL`` analog): the spine enumerates every month between the
    first and last order date, then left-joins the monthly rollup so
    empty months appear as explicit zeros."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(SQL_MONTH_SPINE)


HIGH_PRICE = 350_000.0


def q_set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INTERSECT ALL`` / ``EXCEPT ALL`` — bag semantics, preserving
    multiplicity (a customer with three big-ticket orders and one 1997
    order keeps two rows in the EXCEPT ALL side).  The DISTINCT
    variants live in relational.py; these are the multiset forms."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > HIGH_PRICE).select(
        F.col("o_custkey").alias("custkey")
    )
    recent = o.filter(F.year("o_orderdate") >= 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        big.intersectAll(recent)
        .withColumn("set_op", F.lit("intersect_all"))
        .union(big.exceptAll(recent).withColumn("set_op", F.lit("except_all")))
    )


O_SET_OPS_MULTISET = f"""
SELECT custkey, 'intersect_all' AS set_op FROM
  (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > {HIGH_PRICE}
   INTERSECT ALL
   SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) >= 1997)
UNION ALL
SELECT custkey, 'except_all' AS set_op FROM
  (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > {HIGH_PRICE}
   EXCEPT ALL
   SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) >= 1997)
"""


def q_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with explicit ``GROUPING``/``GROUPING_ID`` flags — the
    machine-readable way to tell a subtotal row from a data row whose
    key happens to be NULL."""
    register_views(spark, sf_dir, ("customer", "nation", "region"))
    return spark.sql("""
        SELECT r_name, n_name,
               CAST(grouping(r_name) AS BIGINT) AS g_region,
               CAST(grouping(n_name) AS BIGINT) AS g_nation,
               CAST(grouping_id(r_name, n_name) AS BIGINT) AS gid,
               COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY gid, r_name, n_name
    """)


O_ROLLUP_GROUPING_ID = """
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS BIGINT) AS g_region,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS gid,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY gid, r_name, n_name
"""


def q_url_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL-function family (``domain``, ``path``,
    ``queryString``, ``extractURLParameter``) via Spark ``parse_url``.
    URLs are synthesized deterministically from customer attributes so
    the parse round-trip is fully checkable."""
    c = load_table(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://seg"),
        F.col("c_nationkey").cast("string"),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?seg="),
        F.lower("c_mktsegment"),
        F.lit("&acct="),
        F.col("c_acctbal").cast("string"),
    )
    return (
        c.select("c_custkey", url.alias("url"))
        .select(
            "c_custkey",
            "url",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query_string"),
            F.parse_url("url", F.lit("QUERY"), F.lit("seg")).alias("seg_param"),
        )
        .orderBy("c_custkey")
    )


O_URL_FUNCTIONS_SUITE = """
WITH u AS (
  SELECT c_custkey,
         'https://seg' || CAST(c_nationkey AS VARCHAR) || '.example.com/cust/'
         || CAST(c_custkey AS VARCHAR) || '?seg=' || lower(c_mktsegment)
         || '&acct=' || CAST(c_acctbal AS VARCHAR) AS url
  FROM customer)
SELECT c_custkey, url,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/?]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query_string,
       regexp_extract(url, '[?&]seg=([^&]*)', 1) AS seg_param
FROM u ORDER BY c_custkey
"""


QUERIES = {
    "recursive_month_spine": q_recursive_month_spine,
    "set_ops_multiset": q_set_ops_multiset,
    "rollup_grouping_id": q_rollup_grouping_id,
    "url_functions_suite": q_url_functions_suite,
}

ORACLES = {
    "recursive_month_spine": SQL_MONTH_SPINE,
    "set_ops_multiset": O_SET_OPS_MULTISET,
    "rollup_grouping_id": O_ROLLUP_GROUPING_ID,
    "url_functions_suite": O_URL_FUNCTIONS_SUITE,
}
