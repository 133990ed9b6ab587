"""dbt schema tests — data-quality checks as a first-class operator.

The reference is a dbt project; dbt's test surface (``unique``,
``not_null``, ``accepted_values``, ``relationships`` in a model's YAML)
is part of "the capabilities a reference user runs today", even though
this particular project left testing as future work ("Ещё можно всё
покрыть тестами", reference README.md:440).  This module implements
those four checks Spark-natively and runs a representative suite over
the fixture warehouse in ONE job.

Scale shape: ALL column-local checks on one table (``unique``,
``not_null``, ``accepted_values``) lower into a SINGLE aggregate pass
over a single scan — ``not_null``/``accepted_values`` as conditional
counts, ``unique`` as the excess-row count ``count(col) −
count(DISTINCT col)`` (rows beyond the first per value; 0 iff unique —
the single-pass-fusible spelling of the uniqueness violation metric).
``relationships`` remains one left-anti join per FK.  This suite is
therefore 4 jobs (2 fused scans + 2 FK joins), not one job per check:
at 100 TB the dominant cost is table scans, and fusing k checks into
one scan is a k× saving.  Nothing is collected — the result is a tiny
(check, violations) relation.
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


def _scalar_expr(c: Check) -> F.Column:
    """Lower a column-local check to one aggregate expression (so all
    such checks on a table fuse into one scan — see module doc)."""
    col = F.col(c.column)
    if c.runner == "unique":
        return F.count(col) - F.count_distinct(col)
    if c.runner == "not_null":
        return F.count_if(col.isNull())
    if c.runner == "accepted_values":
        return F.count_if(~col.isin(*c.values))
    raise ValueError(f"not a scalar check: {c.runner!r}")  # pragma: no cover


def fused_scalar_checks(
    spark: SparkSession, sf_dir: str, table: str, checks: list[Check]
) -> DataFrame:
    """One aggregate pass over ``table`` computing every column-local
    check; the single-row result unpivots to (check, violations) via a
    map-explode (driver never sees data)."""
    t = load_table(spark, sf_dir, table)
    agg = t.agg(
        *[_scalar_expr(c).cast("long").alias(c.name) for c in checks]
    )
    pairs: list[F.Column] = []
    for c in checks:
        pairs += [F.lit(c.name), F.col(c.name)]
    return agg.select(
        F.explode(F.create_map(*pairs)).alias("check_name", "n_violations")
    )


def fk_violations(spark: SparkSession, sf_dir: str, c: Check) -> DataFrame:
    """relationships check: orphans = child keys with no parent, one
    left-anti join (broadcast or shuffle is Catalyst's call)."""
    t = load_table(spark, sf_dir, c.table)
    parent = load_table(spark, sf_dir, c.to_table).select(
        F.col(c.to_column).alias(c.column)
    )
    v = (
        t.select(c.column)
        .filter(F.col(c.column).isNotNull())
        .join(parent, on=c.column, how="left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return v.select(
        F.lit(c.name).alias("check_name"),
        F.col("n").cast("long").alias("n_violations"),
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
    the check logic itself is differentially tested.  Column-local
    checks fuse per table (module doc): this suite is 2 fused scans +
    2 FK joins, not 8 separate jobs."""
    by_table: dict[str, list[Check]] = {}
    fks: list[Check] = []
    for c in SUITE:
        if c.runner == "relationships":
            fks.append(c)
        else:
            by_table.setdefault(c.table, []).append(c)
    parts = [
        fused_scalar_checks(spark, sf_dir, table, checks)
        for table, checks in by_table.items()
    ] + [fk_violations(spark, sf_dir, c) for c in fks]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check_name")


O_DQ_CHECKS = """
SELECT check_name, n_violations FROM (
  SELECT 'orders_orderkey_unique' AS check_name,
         CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
           AS n_violations
  FROM orders
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
  SELECT 'customer_custkey_unique',
         CAST(COUNT(c_custkey) - COUNT(DISTINCT c_custkey) AS BIGINT)
  FROM customer
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
