"""Scalar-function breadth, round 2: string search, datetime
truncation, and conditional/null vocabularies.

The reference's scalar surface is three date functions and one multiply
(SURVEY.md §2.1 D1-D3, E1; reference README.md:415-417, 424-426,
433-436); funcsuite.py covers the everyday string/math/array families.
This module adds the remaining vocabularies a ClickHouse user reaches
for daily:

* string *search* — position/like/match/multiSearchAny/countSubstrings
  analogs (ClickHouse string-search family) as Catalyst expressions.
* toStartOf* — ClickHouse's toStartOfMonth/Week/Quarter/Day truncation
  family via ``date_trunc`` + calendar part extraction.
* multiIf/transform/ifNull/nullIf — the conditional family as CASE
  expressions.

Everything is a single scan + map (+ one keyed aggregate where noted):
zero extra shuffles, fully whole-stage-codegen, so these shapes are
scan-bound at any scale.  All functions chosen have engine-exact
semantics (integer/string/calendar — no libm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.common import dsum, sql_dsum


# --- string search family (ClickHouse position/multiSearchAny/...) ---

SEARCH_TERMS = ("data", "model", "learn")


def q_string_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document search scalars over ``documents.text``:

    * ``pos_data``        — position() analog (1-based, 0 = absent)
    * ``has_the``         — like '%the%'
    * ``starts_upper``    — match('^[A-Z]') analog (regexp)
    * ``n_digit_runs``    — countMatches of ``[0-9]+``
    * ``n_the``           — countSubstrings('the') via length arithmetic
    * ``multi_any``       — multiSearchAny(text, [terms])
    * ``first_word``      — extract('^\\S+')
    """
    d = load_table(spark, sf_dir, "documents")
    multi_any = F.lit(False)
    for t in SEARCH_TERMS:
        multi_any = multi_any | F.col("text").contains(t)
    return d.select(
        "doc_id",
        F.instr(F.col("text"), "data").cast("long").alias("pos_data"),
        F.col("text").like("%the%").alias("has_the"),
        F.col("text").rlike("^[A-Z]").alias("starts_upper"),
        F.regexp_count(F.col("text"), F.lit("[0-9]+")).cast("long").alias(
            "n_digit_runs"
        ),
        (
            (F.length("text") - F.length(F.regexp_replace("text", "the", "")))
            / F.lit(3)
        )
        .cast("long")
        .alias("n_the"),
        multi_any.alias("multi_any"),
        F.regexp_extract(F.col("text"), r"^(\S+)", 1).alias("first_word"),
    ).orderBy("doc_id")


O_STRING_SEARCH = f"""
SELECT doc_id,
       CAST(strpos(text, 'data') AS BIGINT) AS pos_data,
       text LIKE '%the%' AS has_the,
       regexp_matches(text, '^[A-Z]') AS starts_upper,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
       CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
         AS n_the,
       ({" OR ".join(f"contains(text, '{t}')" for t in SEARCH_TERMS)})
         AS multi_any,
       coalesce(regexp_extract(text, '^(\\S+)', 1), '') AS first_word
FROM documents ORDER BY doc_id
"""


# --- toStartOf* truncation family ---

def q_datetime_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse toStartOfMonth/Week/Quarter/Day + toHour/toDayOfWeek
    parity: truncate every event timestamp to its calendar buckets, then
    one keyed aggregate per month.  ``weekday`` is 0=Monday (ClickHouse
    toDayOfWeek − 1; DuckDB isodow − 1).  Weeks are ISO Monday-start in
    both engines.  Dates are emitted as DATE (timezone-free) so the
    value hash is representation-stable."""
    ev = load_table(spark, sf_dir, "events")
    per_row = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.date_trunc("month", "ts").cast("date").alias("month_start"),
        F.date_trunc("week", "ts").cast("date").alias("week_start"),
        F.date_trunc("quarter", "ts").cast("date").alias("quarter_start"),
        F.hour("ts").cast("long").alias("hour_of_day"),
        F.weekday("ts").cast("long").alias("weekday"),
        F.dayofyear("ts").cast("long").alias("doy"),
        "value",
    )
    return (
        per_row.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("month_start").alias("month_start"),
            F.min("week_start").alias("week_start"),
            F.min("quarter_start").alias("quarter_start"),
            F.countDistinct("hour_of_day").alias("n_hours"),
            F.sum("hour_of_day").alias("sum_hours"),
            F.min("weekday").alias("weekday"),
            F.min("doy").alias("doy"),
            dsum(F.col("value")).alias("total_value"),
        )
        .orderBy("day")
    )


O_DATETIME_TRUNC = f"""
SELECT CAST(ts AS DATE) AS day,
       COUNT(*) AS n_events,
       MIN(CAST(date_trunc('month', ts) AS DATE)) AS month_start,
       MIN(CAST(date_trunc('week', ts) AS DATE)) AS week_start,
       MIN(CAST(date_trunc('quarter', ts) AS DATE)) AS quarter_start,
       COUNT(DISTINCT hour(ts)) AS n_hours,
       CAST(SUM(hour(ts)) AS BIGINT) AS sum_hours,
       CAST(MIN(isodow(ts) - 1) AS BIGINT) AS weekday,
       CAST(MIN(dayofyear(ts)) AS BIGINT) AS doy,
       {sql_dsum('value')} AS total_value
FROM events GROUP BY 1 ORDER BY day
"""


# --- conditional / null-handling family ---

def q_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse multiIf/transform/if/nullIf/ifNull parity over
    ``orders``: price banding (multiIf), status decoding (transform),
    priority null-punching (nullIf → ifNull round-trip), then counts and
    an exact-decimal sum per (band, status) cell."""
    o = load_table(spark, sf_dir, "orders")
    banded = o.select(
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "filled")
        .when(F.col("o_orderstatus") == "P", "pending")
        .otherwise("other")
        .alias("status_decoded"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")),
            F.lit("(medium)"),
        ).alias("priority_or_default"),
        "o_totalprice",
    )
    return (
        banded.groupBy("price_band", "status_decoded")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("priority_or_default").alias("n_priorities"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("price_band", "status_decoded")
    )


O_CONDITIONAL_NULL = f"""
SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       CASE o_orderstatus WHEN 'O' THEN 'open'
                          WHEN 'F' THEN 'filled'
                          WHEN 'P' THEN 'pending'
                          ELSE 'other' END AS status_decoded,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT coalesce(nullif(o_orderpriority, '3-MEDIUM'),
                               '(medium)')) AS n_priorities,
       {sql_dsum('o_totalprice')} AS sum_price
FROM orders GROUP BY 1, 2 ORDER BY price_band, status_decoded
"""


# --- codec family (base64/hex — ClickHouse base64Encode/hex analogs) ---

def q_codec_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding vocabulary over ``supplier``: base64 of the name (and
    its decode-roundtrip length), lowercase hex of the UTF-8 bytes, and
    md5 hex — all byte-exact, engine-portable scalars."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.base64(F.col("s_name").cast("binary")).alias("name_b64"),
        F.length(F.unbase64(F.base64(F.col("s_name").cast("binary"))))
        .cast("long")
        .alias("roundtrip_len"),
        F.lower(F.hex(F.col("s_name").cast("binary"))).alias("name_hex"),
        F.md5(F.col("s_name").cast("binary")).alias("name_md5"),
    ).orderBy("s_suppkey")


O_CODEC_SUITE = """
SELECT s_suppkey,
       base64(encode(s_name)) AS name_b64,
       CAST(octet_length(from_base64(base64(encode(s_name)))) AS BIGINT)
         AS roundtrip_len,
       lower(to_hex(encode(s_name))) AS name_hex,
       md5(s_name) AS name_md5
FROM supplier ORDER BY s_suppkey
"""


QUERIES = {
    "string_search_suite": q_string_search,
    "codec_suite": q_codec_suite,
    "datetime_trunc_suite": q_datetime_trunc,
    "conditional_null_suite": q_conditional_null,
}

ORACLES = {
    "string_search_suite": O_STRING_SEARCH,
    "codec_suite": O_CODEC_SUITE,
    "datetime_trunc_suite": O_DATETIME_TRUNC,
    "conditional_null_suite": O_CONDITIONAL_NULL,
}
