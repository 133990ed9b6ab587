"""JSON function-family depth: semi-structured access beyond the
single-key extract in operators/timeseries.py.

* ``variant_json_suite`` — Spark 4's VariantType (``parse_json`` →
  ``variant_get``), the engine-native open-schema path (ClickHouse's
  ``JSON``/``Object`` type analog): parse once, access many, no
  per-access re-parse.  The oracle uses DuckDB's ``json_extract``;
  both typed extractions agree exactly.
* ``json_roundtrip_suite`` — ``to_json(struct(...))`` →
  ``from_json(...)`` round-trip (toJSONString / JSONExtract parity):
  values re-extracted from the serialized form must equal the source
  columns, proving serialization loses nothing.  The comparison is on
  the *parsed-back values*, never the JSON text, so engine formatting
  differences (whitespace, key order) cannot leak into the gate.

Both are map-only projections + one keyed aggregate — scan-bound at
any scale; Variant parse is JVM-side (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats over ``variant_get(parse_json(props), '$.k')`` —
    parse the JSON once into a Variant, extract typed values."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


O_VARIANT_JSON = """
SELECT event_type,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize (lang, source, n_chars) to JSON text per document,
    parse it back, aggregate the parsed values — a lossless-roundtrip
    proof whose oracle reads the original columns directly."""
    d = load_table(spark, sf_dir, "documents")
    js = d.select(
        "doc_id",
        F.to_json(F.struct("lang", "source", "n_chars")).alias("payload"),
    )
    parsed = js.select(
        "doc_id",
        F.from_json(
            "payload", "lang STRING, source STRING, n_chars BIGINT"
        ).alias("p"),
    ).select("doc_id", "p.lang", "p.source", "p.n_chars")
    return (
        parsed.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("lang", "source")
    )


O_JSON_ROUNDTRIP = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


QUERIES = {
    "variant_json_suite": q_variant_json,
    "json_roundtrip_suite": q_json_roundtrip,
}

ORACLES = {
    "variant_json_suite": O_VARIANT_JSON,
    "json_roundtrip_suite": O_JSON_ROUNDTRIP,
}
