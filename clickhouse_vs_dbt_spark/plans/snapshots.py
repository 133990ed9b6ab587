"""dbt snapshots — SCD Type-2 change tracking, Spark-native.

dbt's ``snapshot`` blocks (check/timestamp strategy) version dimension
rows over time: when a tracked column changes, the current row is
closed out and a new version opened.  The reference project has no
snapshots, but they are core dbt surface for exactly the warehouse it
builds (slowly changing ``customer``/``supplier`` dimensions feeding a
star, SURVEY.md §1.1).  This is the ``check`` strategy (compare tracked
columns), with integer batch ids instead of wall-clock timestamps so
results are deterministic and oracle-checkable.

Physical shape per snapshot run: one full-outer-ish reconciliation of
the *current* slice of the snapshot against the incoming state — two
hash joins on the key plus two anti-joins, each key-partitioned, no
driver-side data.  At 100 TB the snapshot table is partitioned by
``is_current`` so the reconciliation scans only the current slice, and
closed history is never rewritten (append-only cold partitions).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

META = ("valid_from", "valid_to", "is_current")


def scd2_init(current: DataFrame, batch_id: int = 0) -> DataFrame:
    """First snapshot run: every source row opens version 1."""
    return current.select(
        "*",
        F.lit(batch_id).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    snapshot: DataFrame,
    current: DataFrame,
    key: Sequence[str],
    tracked: Sequence[str],
    batch_id: int,
) -> DataFrame:
    """Fold the source state at ``batch_id`` into an SCD2 snapshot.

    Semantics (dbt ``check`` strategy defaults):
    * tracked column changed  → close the open row (``valid_to``,
      ``is_current=False``) and insert a new current version.
    * unchanged               → row kept as-is.
    * key new in source       → insert first version.
    * key absent from source  → open row kept open (dbt's default;
      hard-delete invalidation would close it instead).

    Null-safe comparison throughout (NULL → 'x' is a change).
    """
    keys = list(key)
    closed = snapshot.filter(~F.col("is_current"))
    open_rows = snapshot.filter(F.col("is_current"))
    payload = [c for c in current.columns]

    e = open_rows.alias("e")
    s = current.alias("s")
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"e.{c}").eqNullSafe(F.col(f"s.{c}")) for c in tracked],
    )
    matched = e.join(s, on=[F.col(f"e.{k}") == F.col(f"s.{k}") for k in keys])

    unchanged = matched.filter(same).select("e.*")
    changed_closed = (
        matched.filter(~same)
        .select("e.*")
        .withColumn("valid_to", F.lit(batch_id))
        .withColumn("is_current", F.lit(False))
    )
    changed_new = scd2_init(matched.filter(~same).select("s.*"), batch_id)
    new_keys = scd2_init(
        s.join(e, on=[F.col(f"e.{k}") == F.col(f"s.{k}") for k in keys], how="left_anti")
        .select(*payload),
        batch_id,
    )
    dangling = e.join(
        s, on=[F.col(f"e.{k}") == F.col(f"s.{k}") for k in keys], how="left_anti"
    ).select(*snapshot.columns)

    parts = [closed, unchanged, changed_closed, changed_new, new_keys, dangling]
    return reduce(lambda a, b: a.unionByName(b), parts)


# --- driver-checkable proof over the customer dimension ---------------

SEGMENT_MOD = 50  # customers with custkey % 50 == 0 change segment in batch 1


def run_customer_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two snapshot runs over customer: initial state, then a batch in
    which every ``custkey % 50 == 0`` customer moves market segment."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    snap = scd2_init(customer, batch_id=0)
    moved = customer.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % SEGMENT_MOD == 0, F.lit("MOVED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    return scd2_merge(
        snap, moved, key=("c_custkey",), tracked=("c_mktsegment",), batch_id=1
    )


def q_scd2_customer_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_customer_snapshot(spark, sf_dir).orderBy(
        "c_custkey", "valid_from"
    )


# Expected SCD2 table is derivable in closed form from the fixture:
# moved keys carry a closed v0 row + an open MOVED row; others one open row.
O_SCD2 = f"""
SELECT * FROM (
  SELECT c_custkey, c_mktsegment, 0 AS valid_from,
         CASE WHEN c_custkey % {SEGMENT_MOD} = 0 THEN 1 END AS valid_to,
         (c_custkey % {SEGMENT_MOD} <> 0) AS is_current
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MOVED', 1, NULL, TRUE
  FROM customer WHERE c_custkey % {SEGMENT_MOD} = 0
)
ORDER BY c_custkey, valid_from
"""

QUERIES = {"scd2_customer_snapshot": q_scd2_customer_snapshot}
ORACLES = {"scd2_customer_snapshot": O_SCD2}
