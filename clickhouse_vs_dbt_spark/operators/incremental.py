"""Incremental model materialization — dbt's ``incremental`` strategy,
driven end-to-end through the ModelRunner (plans/models.py).

The reference materializes only views and one full table (reference
README.md:254-263, :350).  At 100 TB a daily full rebuild of the star
is not viable; the standard dbt answer is ``materialized='incremental'``
with a ``unique_key`` merge: each run folds only the new/changed batch
into the prior materialization.  This operator proves the Spark-native
runner implements those semantics exactly, with a differential oracle:

* batch 0: all orders strictly before a cutoff date (the "initial
  backfill").
* batch 1: all orders on/after the cutoff, PLUS a deterministic slice
  of pre-cutoff orders re-delivered unchanged (``o_orderkey % 97 = 0``
  — an at-least-once upstream re-sending old rows, the exact situation
  ``unique_key`` merge exists for).
* after run #2 the merged table must equal the full orders table — so
  the oracle is simply the same aggregate over ``orders``.  If merge
  double-counted re-delivered keys or dropped them, counts and sums
  diverge and the hash check fails.

The aggregate output (status × order-year rollup) keeps the compared
relation small and exercises the materialization, not the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.common import dsum, sql_dsum
from clickhouse_vs_dbt_spark.plans.models import (
    Materialization,
    Model,
    ModelRunner,
)

CUTOFF = "1997-01-01"
REDELIVER_MOD = 97


def run_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two incremental runs (backfill, then merge batch) of an orders
    model; returns the final materialized relation."""
    def orders_batch(spark: SparkSession, existing: DataFrame | None) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        if existing is None:  # first run: the historical backfill
            return orders.filter(F.col("o_orderdate") < CUTOFF)
        # later runs: the new slice + re-delivered old rows
        return orders.filter(
            (F.col("o_orderdate") >= CUTOFF)
            | (F.col("o_orderkey") % REDELIVER_MOD == 0)
        )

    runner = ModelRunner(spark)
    runner.add(
        Model(
            "orders_incr",
            orders_batch,
            materialization=Materialization.INCREMENTAL,
            unique_key=("o_orderkey",),
        )
    )
    runner.run()  # backfill
    out = runner.run()  # incremental merge
    return out["orders_incr"]


def q_incremental_orders_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = run_incremental_orders(spark, sf_dir)
    return (
        merged.groupBy(
            "o_orderstatus", F.year("o_orderdate").alias("order_year")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "order_year")
    )


# Merge-converged table == full orders table, so the oracle aggregates
# the fixture directly.
O_INCREMENTAL_MERGE = f"""
SELECT o_orderstatus,
       EXTRACT(year FROM o_orderdate)::INT AS order_year,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS total_price
FROM orders
GROUP BY o_orderstatus, order_year
ORDER BY o_orderstatus, order_year
"""

# --- incremental aggregate maintenance (materialized-view analog) ---

N_MV_BATCHES = 3
_DECSUM = "decimal(38,6)"


def run_incremental_agg_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse AggregatingMergeTree / materialized-view analog:
    maintain a per-event-type aggregate TABLE incrementally as event
    batches arrive, never re-scanning history.

    Each arriving batch is reduced to *partial aggregate state*
    (n, decimal sum, min/max) — the map-side-combine shape — and merged
    with the existing state by a keyed re-aggregate.  The merge is over
    |keys| rows, not |events|: at 100 TB each refresh costs
    O(batch + state), which is why the MV pattern exists.  State sums
    stay in exact decimal so batch arrival order cannot perturb the
    result (same property as operators/common.dsum).
    """
    ev = load_table(spark, sf_dir, "events")
    state: DataFrame | None = None
    for i in range(N_MV_BATCHES):
        batch = ev.filter(F.col("event_id") % N_MV_BATCHES == i)
        partial = batch.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast(_DECSUM).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        if state is None:
            state = partial
        else:
            state = (
                state.unionByName(partial)
                .groupBy("event_type")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("s").cast(_DECSUM).alias("s"),
                    F.min("mn").alias("mn"),
                    F.max("mx").alias("mx"),
                )
            )
    return state


def q_incremental_agg_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finalize the incrementally-maintained state; the oracle is the
    one-shot aggregate over all events — equality proves the partial
    states merged losslessly."""
    state = run_incremental_agg_mv(spark, sf_dir)
    return (
        state.select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.col("s").cast("double").alias("total_value"),
            F.col("mn").alias("min_value"),
            F.col("mx").alias("max_value"),
        )
        .orderBy("event_type")
    )


O_INCREMENTAL_AGG_MV = f"""
SELECT event_type, COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- insert_overwrite strategy (partition restatement) ---

RESTATE_FROM_YEAR = 1996
RESTATE_DELTA = 5.0  # exact IEEE addition — identical in both engines


def run_insert_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt's ``insert_overwrite`` incremental strategy: the batch
    rewrites exactly the partitions it contains, untouched partitions
    survive byte-for-byte.  Run 1 backfills all order-years; run 2
    delivers a RESTATED slice (years >= RESTATE_FROM_YEAR, price
    shifted) — dynamic partition overwrite must replace those year
    partitions and leave the rest alone.  Cost scales with the batch,
    not the table: the 100 TB daily-restatement path."""

    def batch(spark: SparkSession, existing: DataFrame | None) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )
        if existing is None:
            return orders
        return orders.filter(
            F.col("order_year") >= RESTATE_FROM_YEAR
        ).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(RESTATE_DELTA)
        )

    runner = ModelRunner(spark)
    runner.add(
        Model(
            "orders_restate",
            batch,
            materialization=Materialization.INCREMENTAL,
            partition_by=("order_year",),
        )
    )
    runner.run()  # backfill every partition
    out = runner.run()  # restatement batch overwrites only its years
    return out["orders_restate"]


def q_incremental_insert_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rollup of the restated table.  The oracle applies the
    restatement analytically: if overwrite had clobbered old partitions
    the pre-cutoff years vanish (row-count mismatch); if it appended
    instead of overwriting, restated years double-count (hash
    mismatch)."""
    restated = run_insert_overwrite(spark, sf_dir)
    return (
        restated.groupBy("order_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("order_year", "o_orderstatus")
    )


O_INSERT_OVERWRITE = f"""
SELECT EXTRACT(year FROM o_orderdate)::INT AS order_year,
       o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum(
           "CASE WHEN EXTRACT(year FROM o_orderdate) >= "
           f"{RESTATE_FROM_YEAR} THEN o_totalprice + {RESTATE_DELTA} "
           "ELSE o_totalprice END"
       )} AS total_price
FROM orders
GROUP BY order_year, o_orderstatus
ORDER BY order_year, o_orderstatus
"""


# --- time travel over the copy-on-write merge versions ---


def q_incremental_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation on the merge materialization: with
    ``keep_versions=2`` the v1 merge does NOT touch the v0 directory,
    so ``read_version(0)`` after both runs returns exactly the
    backfill state (pre-cutoff orders) — the ``VERSION AS OF``
    contract.  The oracle aggregates the fixture's pre-cutoff slice
    directly; any leakage of the merge batch into the old snapshot
    breaks the hash."""

    def orders_batch(
        spark: SparkSession, existing: DataFrame | None
    ) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        if existing is None:
            return orders.filter(F.col("o_orderdate") < CUTOFF)
        return orders.filter(
            (F.col("o_orderdate") >= CUTOFF)
            | (F.col("o_orderkey") % REDELIVER_MOD == 0)
        )

    runner = ModelRunner(spark)
    runner.add(
        Model(
            "orders_tt",
            orders_batch,
            materialization=Materialization.INCREMENTAL,
            unique_key=("o_orderkey",),
            keep_versions=2,
        )
    )
    runner.run()  # v0: backfill
    runner.run()  # v1: merge — v0 must remain byte-identical
    v0 = runner.read_version("orders_tt", 0)
    return (
        v0.groupBy(
            "o_orderstatus", F.year("o_orderdate").alias("order_year")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "order_year")
    )


O_TIME_TRAVEL = f"""
SELECT o_orderstatus,
       EXTRACT(year FROM o_orderdate)::INT AS order_year,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS total_price
FROM orders
WHERE o_orderdate < DATE '{CUTOFF}'
GROUP BY o_orderstatus, order_year
ORDER BY o_orderstatus, order_year
"""


# --- mutations (ALTER TABLE DELETE / UPDATE analog) + compaction ---

MUT_DELETE = "o_orderstatus = 'F' AND o_orderkey % 10 = 0"
MUT_SET = {"o_totalprice": "o_totalprice + 1.0"}  # exact IEEE addition
MUT_WHERE = "o_orderpriority = '1-URGENT'"


def _orders_full_model(spark: SparkSession, sf_dir: str, name: str) -> ModelRunner:
    def batch(s: SparkSession, existing: DataFrame | None) -> DataFrame:
        return load_table(s, sf_dir, "orders")

    runner = ModelRunner(spark)
    runner.add(
        Model(
            name,
            batch,
            materialization=Materialization.INCREMENTAL,
            unique_key=("o_orderkey",),
        )
    )
    runner.run()
    return runner


def q_mutation_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ALTER TABLE orders DELETE WHERE ... / UPDATE ...``
    via the copy-on-write mutation (plans/models.py `mutate`): deletes
    a key slice, bumps urgent orders' price by an exact IEEE +1.0.
    The oracle applies both mutations analytically over the fixture —
    a missed delete or a double-applied update breaks count or sum."""
    runner = _orders_full_model(spark, sf_dir, "orders_mut")
    mutated = runner.mutate(
        "orders_mut",
        delete_where=MUT_DELETE,
        set_exprs=MUT_SET,
        update_where=MUT_WHERE,
    )
    return (
        mutated.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


O_MUTATION = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum(
           "CASE WHEN o_orderpriority = '1-URGENT' "
           "THEN o_totalprice + 1.0 ELSE o_totalprice END"
       )} AS total_price
FROM orders
WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 0)
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""


def q_maintenance_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE TABLE analog: compaction is a pure layout rewrite — the
    post-compaction aggregate must hash identically to the plain
    fixture aggregate (content untouched), which is exactly what the
    oracle asserts."""
    runner = _orders_full_model(spark, sf_dir, "orders_opt")
    compacted = runner.compact("orders_opt", target_files=1)
    return (
        compacted.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


O_COMPACTION = f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS total_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES = {
    "incremental_orders_merge": q_incremental_orders_merge,
    "mutation_delete_update": q_mutation_delete_update,
    "maintenance_compaction": q_maintenance_compaction,
    "incremental_agg_mv": q_incremental_agg_mv,
    "incremental_insert_overwrite": q_incremental_insert_overwrite,
    "incremental_time_travel": q_incremental_time_travel,
}
ORACLES = {
    "incremental_orders_merge": O_INCREMENTAL_MERGE,
    "incremental_agg_mv": O_INCREMENTAL_AGG_MV,
    "incremental_insert_overwrite": O_INSERT_OVERWRITE,
    "incremental_time_travel": O_TIME_TRAVEL,
    "mutation_delete_update": O_MUTATION,
    "maintenance_compaction": O_COMPACTION,
}
