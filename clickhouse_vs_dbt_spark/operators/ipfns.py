"""IPv4 address function family (ClickHouse ``IPv4NumToString`` /
``IPv4StringToNum`` / ``isIPAddressInRange`` parity).

ClickHouse treats IPv4 as UInt32 with a dotted-quad string codec and
CIDR range predicates; Spark has no IP type, so the same vocabulary is
expressed as integer arithmetic + string ops — all Catalyst
expressions, codegen'd, exactly reproducible in any engine.  Addresses
are synthesized deterministically from ``c_custkey`` (a Knuth
multiplicative mix into the 10.0.0.0/8 block) so encode→decode→range
membership is fully value-checked end to end.

Scale shape: map-only projection plus one groupBy on /16 subnet — the
groupBy is the only shuffle and its key cardinality is bounded (≤ 2¹⁶),
so partial aggregation collapses almost everything map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

# 10.0.0.0/8 + 24-bit Knuth-mixed host part
_MIX = 2654435761


def q_ipv4_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per /16 subnet: member count, min/max dotted-quad string, and how
    many members fall inside 10.128.0.0/9 (CIDR membership as integer
    shift-compare — ClickHouse ``isIPAddressInRange``)."""
    c = load_table(spark, sf_dir, "customer")
    ip_num = (
        F.lit(10 * 2**24) + (F.col("c_custkey") * _MIX) % F.lit(2**24)
    ).cast("bigint")
    octet = lambda k: ((ip_num / F.lit(256**k)).cast("bigint") % 256).cast(
        "string"
    )
    ip_str = F.concat_ws(".", octet(3), octet(2), octet(1), octet(0))
    in_range = (
        (ip_num / F.lit(2**23)).cast("bigint")
        == F.lit((10 * 2**24 + 128 * 2**16) // 2**23)
    ).cast("bigint")
    subnet16 = (ip_num / F.lit(2**16)).cast("bigint")
    return (
        c.select(
            subnet16.alias("subnet16"),
            ip_str.alias("ip"),
            in_range.alias("in_10_128_0_0_9"),
        )
        .groupBy("subnet16")
        .agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.min("ip").alias("ip_min"),
            F.max("ip").alias("ip_max"),
            F.sum("in_10_128_0_0_9").alias("n_in_range"),
        )
        .orderBy("subnet16")
    )


O_IPV4_FUNCTIONS_SUITE = f"""
WITH ips AS (
  SELECT CAST(10*16777216 + (c_custkey * {_MIX}) % 16777216 AS BIGINT) AS ip_num
  FROM customer),
s AS (
  SELECT ip_num,
         CAST(ip_num // 65536 AS BIGINT) AS subnet16,
         CAST(ip_num // 16777216 % 256 AS VARCHAR) || '.' ||
         CAST(ip_num // 65536 % 256 AS VARCHAR) || '.' ||
         CAST(ip_num // 256 % 256 AS VARCHAR) || '.' ||
         CAST(ip_num % 256 AS VARCHAR) AS ip,
         CAST(CASE WHEN ip_num // 8388608 = {(10 * 2**24 + 128 * 2**16) // 2**23}
              THEN 1 ELSE 0 END AS BIGINT) AS in_range
  FROM ips)
SELECT subnet16, COUNT(*) AS n_hosts,
       MIN(ip) AS ip_min, MAX(ip) AS ip_max,
       CAST(SUM(in_range) AS BIGINT) AS n_in_range
FROM s GROUP BY subnet16 ORDER BY subnet16
"""


QUERIES = {"ipv4_functions_suite": q_ipv4_functions_suite}
ORACLES = {"ipv4_functions_suite": O_IPV4_FUNCTIONS_SUITE}
