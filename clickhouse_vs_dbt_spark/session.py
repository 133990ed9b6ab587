"""SparkSession factory.

The reference provisions a managed ClickHouse cluster (reference
README.md:5-17); the Spark-native analog is a SparkSession.  Defaults are
tuned for the driver's local[N] harness but every knob is the one you
would also set on a 1000-executor cluster:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  — the direct analog of ClickHouse's adaptive pipeline.
* ``spark.sql.shuffle.partitions`` sized to the LOCAL BENCH DATA, not to
  cores: measured r10, local-mode task dispatch is ~serialized, so a
  32-reduce-partition shuffle of kilobytes costs ~0.4 s wall while the
  same shuffle at 8 partitions costs ~0.17 s — and AQE coalescing does
  not remove the cost because map tasks still write (and reducers still
  fetch) per-initial-partition buckets.  Measured across the 10 slowest
  headline queries at sf0.1: 8 initial partitions is 16% faster overall
  with zero regressions (pagerank −55%, retention −49%).  At 100 TB you
  invert this: set a high initial number (or
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``) and
  let AQE coalesce down — the env override below is that knob.
* ``coalescePartitions.parallelismFirst`` stays at Spark's default
  (true): the tuning-guide production setting (false) coalesces by
  BYTES, which serialized compute-heavy per-group folds into one task
  — measured r10, ``dialect_interval_sweeps`` (3 groups × ~50k-struct
  sweep folds behind a kilobyte-scale shuffle) ran 3.1 s under
  parallelism-first=false vs 1.2 s at the default.
* UTC session timezone so date/time semantics are engine-independent
  (and match the DuckDB correctness oracle).
* Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "clickhouse_vs_dbt_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``; on a real
    cluster you pass the cluster master / rely on spark-submit.
    """
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env and env.isdigit():
            shuffle_partitions = int(env)
        else:
            # data-scale default for the local harness (module doc):
            # 8, capped at the core count on smaller machines
            cores = int(cpus) if str(cpus).isdigit() else 32
            shuffle_partitions = max(min(cores, 8), 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # saveAsTable targets (bucketed models) land here, not in cwd
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
