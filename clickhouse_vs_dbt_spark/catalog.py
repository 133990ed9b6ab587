"""Catalog: logical table name → typed reader → session views.

The reference's dbt ``sources:`` block maps logical names to physical
identifiers with docs/tags (reference README.md:269-292, operator S4 in
SURVEY.md §2.1); its staging layer registers pass-through views
(README.md:296-326, operator S3).  The Spark-native equivalent is the
session catalog: each fixture table gets a typed DataFrame reader and a
temp view, so both the DataFrame API and ``spark.sql`` resolve the same
relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver fixture tables (TESTDATA.md): one parquet file per table.
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join these against facts so
# the fact side never shuffles (SURVEY.md §4: at 100 TB the lineitem scan
# stays shuffle-free when every dim ships to the executors).
DIMENSION_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """External-table semantics: lazy parquet scan, re-planned per query
    (the analog of the reference's S3-engine re-scan, README.md:158-222,
    but columnar so Catalyst pushes filters/projection into the scan)."""
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {FIXTURE_TABLES}")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) parquet in some
        # fixture generations (Spark's reader rejects nanos unless told
        # to surface them as int64) and as micros TIMESTAMP in others.
        # Read with nanosAsLong on, then convert only if we actually got
        # the raw int64 nanos (DuckDB truncates nanos→micros identically,
        # verified in tests/test_timeseries.py).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes)["ts"] == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # micros TIMESTAMP_NTZ fixture → session-tz timestamp (UTC
            # session, so the cast is identity on the stored micros and
            # every downstream unix_micros/window/watermark op sees the
            # same TimestampType either way).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES) -> None:
    """Register every fixture table as a temp view (operator S4)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
