"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``clickhouse_vs_dbt_spark/``; this module only
aggregates the per-operator QUERIES/ORACLES registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_vs_dbt_spark import compat, ddl, dialect
from clickhouse_vs_dbt_spark.operators import (
    aggfns,
    zorder,
    bloomjoin,
    boilerplate,
    chfuncs,
    components,
    corpus,
    curation,
    dedup,
    funcsuite,
    fuzzy,
    geo,
    hll,
    ipfns,
    jsonfns,
    maps,
    mergetree,
    mlinfer,
    incremental,
    kmeans,
    multimodal,
    pagerank,
    pipeline,
    relational,
    similarity,
    skew,
    sqlbreadth,
    stats,
    quality,
    sampling,
    scalarbreadth,
    ssb_queries,
    text,
    timeseries,
    tpch,
    tpch_ps,
    windowfns,
)
from clickhouse_vs_dbt_spark.plans import bucketing, models as plan_models, snapshots
from clickhouse_vs_dbt_spark.sources import (
    binfile,
    evolution,
    jsonl,
    objectstore,
    orc_src,
    parquet_part,
    ssb_csv,
)
from clickhouse_vs_dbt_spark.streaming import (
    events_stream,
    kafka_source,
    stateful_sessions,
    stream_dedup,
    stream_enrich,
    stream_join,
    stream_late,
    stream_mv,
    stream_retract,
    stream_upsert,
)

_MODULES = [
    ssb_queries,
    compat,
    dialect,
    ddl,
    bloomjoin,
    chfuncs,
    aggfns,
    zorder,
    windowfns,
    boilerplate,
    sqlbreadth,
    stats,
    relational,
    tpch,
    tpch_ps,
    funcsuite,
    scalarbreadth,
    maps,
    fuzzy,
    geo,
    ipfns,
    jsonfns,
    hll,
    dedup,
    components,
    curation,
    similarity,
    kmeans,
    mergetree,
    mlinfer,
    text,
    corpus,
    timeseries,
    multimodal,
    pagerank,
    pipeline,
    incremental,
    quality,
    snapshots,
    bucketing,
    plan_models,
    sampling,
    skew,
    ssb_csv,
    jsonl,
    objectstore,
    orc_src,
    parquet_part,
    evolution,
    binfile,
    events_stream,
    kafka_source,
    stateful_sessions,
    stream_join,
    stream_dedup,
    stream_enrich,
    stream_late,
    stream_mv,
    stream_retract,
    stream_upsert,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: SSB Q1.1 semantics over
    the star join (reference README.md:415-417)."""
    return ssb_queries.q1_1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
