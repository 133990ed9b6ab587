"""Tests for the ClickHouse DDL transpiler (ddl.py)."""

from __future__ import annotations

import pytest

from clickhouse_vs_dbt_spark.ddl import (
    DialectError,
    convert_type,
    transpile_ddl,
)

TYPES = [
    ("UInt32", "BIGINT"),
    ("UInt8", "SMALLINT"),
    ("Int64", "BIGINT"),
    ("Float64", "DOUBLE"),
    ("String", "STRING"),
    ("LowCardinality(String)", "STRING"),
    ("Nullable(Int32)", "INT"),
    ("Nullable(LowCardinality(String))", "STRING"),
    ("Date", "DATE"),
    ("DateTime", "TIMESTAMP"),
    ("DateTime64(3)", "TIMESTAMP"),
    ("Decimal(18, 6)", "DECIMAL(18, 6)"),
    ("Decimal64(4)", "DECIMAL(18, 4)"),
    ("FixedString(16)", "STRING"),
    ("Enum8('a' = 1, 'b' = 2)", "STRING"),
    ("Array(Nullable(Float64))", "ARRAY<DOUBLE>"),
    ("Map(String, UInt64)", "MAP<STRING, BIGINT>"),
    ("Tuple(a UInt8, b String)", "STRUCT<a: SMALLINT, b: STRING>"),
    ("Array(Array(UInt8))", "ARRAY<ARRAY<SMALLINT>>"),
]


@pytest.mark.parametrize("ch,spark_t", TYPES, ids=[t for t, _ in TYPES])
def test_convert_type(ch, spark_t):
    assert convert_type(ch) == spark_t


def test_unknown_type_raises():
    # r7: self-merging AggregateFunction types map to the value type
    # (the -State/-Merge contract); genuinely unknown names still raise
    assert convert_type("AggregateFunction(sum, UInt64)") == "BIGINT"
    with pytest.raises(DialectError):
        convert_type("SomeMadeUpType(42)")


def test_mergetree_ddl_maps_to_parquet_with_partition():
    out = transpile_ddl(
        "CREATE TABLE IF NOT EXISTS t (d Date, k UInt32, v Float64) "
        "ENGINE = MergeTree PARTITION BY k ORDER BY (d, k) "
        "SETTINGS index_granularity = 8192"
    )
    assert "USING parquet" in out
    assert "PARTITIONED BY (k)" in out
    assert "IF NOT EXISTS" in out
    assert "ORDER BY" not in out and "SETTINGS" not in out


def test_expression_partition_is_dropped():
    out = transpile_ddl(
        "CREATE TABLE t (d Date, v UInt32) ENGINE = MergeTree "
        "PARTITION BY toYYYYMM(d) ORDER BY d"
    )
    assert "PARTITIONED BY" not in out


def test_stop_keyword_inside_string_literal_does_not_cut():
    """An Enum value (or any string) containing DEFAULT/ALIAS must not
    truncate the type expression (round-4 review finding)."""
    out = transpile_ddl(
        "CREATE TABLE t (s Enum8('DEFAULT' = 1, 'ALIAS' = 2), "
        "n UInt8 DEFAULT 7) ENGINE = MergeTree ORDER BY n"
    )
    assert "s STRING" in out and "n SMALLINT" in out
    assert "DEFAULT" not in out


def test_column_suffixes_dropped():
    out = transpile_ddl(
        "CREATE TABLE t (a UInt32 DEFAULT 0, b String CODEC(ZSTD), "
        "c Date COMMENT 'x') ENGINE = MergeTree ORDER BY a"
    )
    assert "a BIGINT" in out and "b STRING" in out and "c DATE" in out
    assert "DEFAULT" not in out and "CODEC" not in out


# reference README.md:172-193 character-for-character (placeholder
# database prefix substituted as the reference instructs)
LINEORDER_DDL = """CREATE TABLE src_lineorder
        (
            LO_ORDERKEY             UInt32,
            LO_LINENUMBER           UInt8,
            LO_CUSTKEY              UInt32,
            LO_PARTKEY              UInt32,
            LO_SUPPKEY              UInt32,
            LO_ORDERDATE            Date,
            LO_ORDERPRIORITY        LowCardinality(String),
            LO_SHIPPRIORITY         UInt8,
            LO_QUANTITY             UInt8,
            LO_EXTENDEDPRICE        UInt32,
            LO_ORDTOTALPRICE        UInt32,
            LO_DISCOUNT             UInt8,
            LO_REVENUE              UInt32,
            LO_SUPPLYCOST           UInt32,
            LO_TAX                  UInt8,
            LO_COMMITDATE           Date,
            LO_SHIPMODE             LowCardinality(String)
        )
        ENGINE = S3('https://storage.yandexcloud.net/<my-bucket-name>/<my-folder-name>/lineorder.tbl', 'CSV')
        ;"""


def test_reference_lineorder_ddl_creates_table(spark, tmp_path):
    """The reference's 17-column lineorder DDL, verbatim, becomes a
    live external csv table with the SURVEY §1.2 type mapping."""
    tbl = tmp_path / "lineorder.tbl"
    tbl.write_text(
        "1|1|7|3|2|1995-03-04|1-URGENT|0|17|1200|2400|4|1152|800|2|"
        "1995-04-01|TRUCK\n"
        "2|1|8|4|3|1996-07-15|5-LOW|0|22|3300|3300|0|3300|1000|1|"
        "1996-08-01|MAIL\n"
    )
    spark.sql("DROP TABLE IF EXISTS src_lineorder")
    spark.sql(
        transpile_ddl(
            LINEORDER_DDL, path_override=str(tbl), options={"sep": "|"}
        )
    )
    rows = spark.sql(
        "SELECT LO_ORDERKEY, LO_ORDERDATE, LO_REVENUE, LO_SHIPMODE "
        "FROM src_lineorder ORDER BY LO_ORDERKEY"
    ).collect()
    assert len(rows) == 2
    assert rows[0].LO_REVENUE == 1152 and rows[1].LO_SHIPMODE == "MAIL"
    assert str(rows[0].LO_ORDERDATE) == "1995-03-04"
    dtypes = dict(spark.table("src_lineorder").dtypes)
    assert dtypes["LO_ORDERKEY"] == "bigint"  # UInt32 → BIGINT
    assert dtypes["LO_QUANTITY"] == "smallint"  # UInt8 → SMALLINT
    assert dtypes["LO_ORDERDATE"] == "date"
    spark.sql("DROP TABLE src_lineorder")


def test_datetime_timezone_refuses():
    """DateTime('tz') / DateTime64(p,'tz') must refuse, not silently
    drop the zone (round-4 advice): a dropped zone shifts timestamp
    interpretation relative to the ClickHouse table."""
    import pytest

    from clickhouse_vs_dbt_spark.ddl import DialectError, convert_type

    assert convert_type("DateTime") == "TIMESTAMP"
    assert convert_type("DateTime64(3)") == "TIMESTAMP"
    for t in ("DateTime('Europe/Moscow')", "DateTime64(3, 'UTC')"):
        with pytest.raises(DialectError, match="timezone"):
            convert_type(t)


def test_materialized_view_transpile_shapes():
    import pytest

    from clickhouse_vs_dbt_spark.ddl import (
        DialectError,
        transpile_materialized_view,
    )

    mv = transpile_materialized_view(
        "CREATE MATERIALIZED VIEW mv1 ENGINE = AggregatingMergeTree "
        "ORDER BY k AS SELECT k, count() AS n, sum(v) AS s "
        "FROM src WHERE v > 0 GROUP BY k"
    )
    assert mv.name == "mv1" and mv.source == "src"
    assert mv.keys == ["k"]
    assert mv.aggs == [("n", "sum"), ("s", "sum")]
    assert "WHERE v > 0" in mv.select_sql and "{src}" in mv.select_sql
    # avg decomposes to sum+count state with a ratio read view (r8)
    mva = transpile_materialized_view(
        "CREATE MATERIALIZED VIEW m AS SELECT k, avg(v) AS a "
        "FROM src GROUP BY k"
    )
    assert mva.aggs == [("a__s", "sum"), ("a__c", "sum")]
    assert mva.read_items[-1].endswith("AS a")
    with pytest.raises(DialectError, match="DISTINCT"):
        transpile_materialized_view(
            "CREATE MATERIALIZED VIEW m AS SELECT k, "
            "avg(DISTINCT v) AS a FROM src GROUP BY k"
        )
    # uniq/uniqExact decompose to set-union state columns (r8)
    mvu = transpile_materialized_view(
        "CREATE MATERIALIZED VIEW m AS SELECT k, "
        "uniqExact(u) AS nu, uniq(u) AS nh FROM src GROUP BY k"
    )
    assert mvu.aggs == [("nu__st", "set_union"), ("nh__st", "set_union")]
    assert mvu.read_items[1].startswith("CAST(size(nu__st)")
    # quantileExact decomposes to the sorted-multiset state (r8);
    # the sampling quantile (→ percentile_approx) refuses rather than
    # falling through to the group-key path
    mvq = transpile_materialized_view(
        "CREATE MATERIALIZED VIEW m AS SELECT k, "
        "quantileExact(0.5)(u) AS q FROM src GROUP BY k"
    )
    assert mvq.aggs == [("q__st", "sorted_union")]
    with pytest.raises(DialectError, match="-State"):
        transpile_materialized_view(
            "CREATE MATERIALIZED VIEW m AS SELECT k, "
            "quantile(0.5)(u) AS q FROM src GROUP BY k"
        )
    with pytest.raises(DialectError, match="level must be"):
        transpile_materialized_view(
            "CREATE MATERIALIZED VIEW m AS SELECT k, "
            "quantileExact(lv)(u) AS q FROM src GROUP BY k"
        )


def test_mv_state_aggs_batch_order_invariant(spark):
    """avg / uniq / uniqExact / quantileExact state maintenance is
    batch-ORDER invariant: folding the same three batches in two
    different orders yields identical read-view rows, and both equal
    the one-shot aggregate (exact-decimal sums, set unions, and
    sorted multisets are all associative+commutative)."""
    from pyspark.sql import functions as F

    from clickhouse_vs_dbt_spark.ddl import transpile_materialized_view

    df = spark.range(400).select(
        (F.col("id") % 5).alias("k"),
        (F.col("id") % 17).cast("double").alias("v"),
        (F.col("id") % 23).alias("u"),
        F.col("id").alias("event_id"),
    )
    df.createOrReplaceTempView("mv_src_o")
    ddl = (
        "CREATE MATERIALIZED VIEW mv_o{n} AS SELECT k, "
        "avg(v) AS a, uniq(u) AS nh, uniqExact(u) AS ne, "
        "quantileExact(0.5)(v) AS med FROM mv_src_o GROUP BY k"
    )

    def run(order, n):
        mv = transpile_materialized_view(ddl.format(n=n))
        for i in order:
            mv.apply_batch(
                spark, df.filter(F.col("event_id") % 3 == i)
            )
        return {
            r["k"]: (round(r["a"], 10), r["nh"], r["ne"],
                     round(r["med"], 10))
            for r in spark.table(f"mv_o{n}").collect()
        }

    got1 = run([0, 1, 2], 1)
    got2 = run([2, 0, 1], 2)
    assert got1 == got2
    want = {
        r["k"]: (round(r["a"], 10), r["ne"], round(r["med"], 10))
        for r in df.groupBy("k")
        .agg(
            F.avg("v").alias("a"),
            F.count_distinct("u").alias("ne"),
            F.expr("percentile(v, 0.5)").alias("med"),
        )
        .collect()
    }
    for k, (a, nh, ne, med) in got1.items():
        wa, wne, wmed = want[k]
        assert (a, ne, med) == (wa, wne, wmed)
        # uniq is the HLL sketch: linear-counting range here, but a
        # bucket collision can still shave a count — bound the error
        assert abs(nh - wne) <= max(1, 0.05 * wne)


def test_materialized_view_batch_merge_equals_full(spark):
    """Three-batch incremental maintenance == one-shot aggregate."""
    from pyspark.sql import functions as F

    from clickhouse_vs_dbt_spark.ddl import transpile_materialized_view

    df = spark.range(300).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
        F.col("id").alias("event_id"),
    )
    df.createOrReplaceTempView("mv_src_t")
    mv = transpile_materialized_view(
        "CREATE MATERIALIZED VIEW mv_t AS SELECT k, count() AS n, "
        "sum(toDecimal64(v, 2)) AS s, min(v) AS mn, max(v) AS mx "
        "FROM mv_src_t GROUP BY k"
    )
    for i in range(3):
        mv.apply_batch(spark, df.filter(F.col("event_id") % 3 == i))
    got = {
        r["k"]: (r["n"], float(r["s"]), r["mn"], r["mx"])
        for r in spark.table("mv_t").collect()
    }
    want = {
        r["k"]: (r["n"], float(r["s"]), r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_engine_info_registered_and_final_rewrites():
    from clickhouse_vs_dbt_spark.ddl import (
        ENGINE_INFO,
        transpile_ddl,
    )
    from clickhouse_vs_dbt_spark.dialect import transpile

    transpile_ddl(
        "CREATE TABLE db.tv (k UInt64, v Float64, ver UInt8) "
        "ENGINE = ReplacingMergeTree(ver) ORDER BY (k)"
    )
    from clickhouse_vs_dbt_spark.ddl import lookup_engine_info

    info = lookup_engine_info("tv")  # bare lookup → unique qualified hit
    assert info.engine == "ReplacingMergeTree"
    assert info.keys == ("k",) and info.version == "ver"
    assert ENGINE_INFO["db.tv"] is info  # keyed as written, no bare alias
    out = transpile(
        "SELECT k, v FROM tv FINAL",
        resolve_columns=lambda n: ["k", "v", "ver"] if "tv" in n else None,
        engine_info=lookup_engine_info,
    )
    assert "FINAL" not in out
    assert "max_by(struct(v, ver), struct(ver, v))" in out
    assert "GROUP BY k" in out
    # unknown table / non-Replacing engine still refuses
    import pytest

    from clickhouse_vs_dbt_spark.dialect import DialectError

    with pytest.raises(DialectError, match="FINAL"):
        transpile("SELECT a FROM unknown_t FINAL")
    # plain Collapsing rewrites inline now (r6): sign-sum survivor
    # gate + lexicographic-max state-row pick
    transpile_ddl(
        "CREATE TABLE cm (k UInt64, v Float64, s Int8) "
        "ENGINE = CollapsingMergeTree(s) ORDER BY (k)"
    )
    out = transpile(
        "SELECT k, v FROM cm FINAL",
        resolve_columns=lambda n: ["k", "v", "s"],
        engine_info=lambda n: ENGINE_INFO.get(n),
    )
    assert "FINAL" not in out
    assert "sum(s) AS __f_net" in out and "__f_net > 0" in out
    assert "CASE WHEN s = 1 THEN struct(v, s) END" in out


def test_versioned_collapsing_final_rewrites():
    from clickhouse_vs_dbt_spark.ddl import ENGINE_INFO, transpile_ddl
    from clickhouse_vs_dbt_spark.dialect import transpile

    transpile_ddl(
        "CREATE TABLE vc (k UInt64, v Float64, sign Int8, ver UInt32) "
        "ENGINE = VersionedCollapsingMergeTree(sign, ver) ORDER BY (k)"
    )
    info = ENGINE_INFO["vc"]
    assert info.sign == "sign" and info.version == "ver"
    out = transpile(
        "SELECT k, v FROM vc FINAL",
        resolve_columns=lambda n: ["k", "v", "sign", "ver"],
        engine_info=lambda n: ENGINE_INFO.get(n),
    )
    assert "FINAL" not in out
    assert "sum(sign) AS __f_net" in out and "__f_net > 0" in out
    assert "max_by(__f_s0, ver)" in out


def test_summing_final_rewrites(spark):
    """SummingMergeTree FINAL: numeric non-key columns sum, strings
    take the deterministic min representative; the explicit
    Summing(col) arg restricts the summed set."""
    from clickhouse_vs_dbt_spark.ddl import ENGINE_INFO, transpile_ddl
    from clickhouse_vs_dbt_spark.dialect import transpile

    transpile_ddl(
        "CREATE TABLE smt (k UInt64, a Int64, b Float64, t String) "
        "ENGINE = SummingMergeTree ORDER BY k"
    )
    resolve = lambda rel: ["k", "a", "b", "t"]  # noqa: E731
    resolve.dtypes = lambda rel: [
        ("k", "bigint"), ("a", "bigint"), ("b", "double"), ("t", "string")
    ]
    out = transpile(
        "SELECT k, a FROM smt FINAL",
        resolve_columns=resolve,
        engine_info=lambda n: ENGINE_INFO.get(n),
    )
    assert "sum(a) AS a" in out and "sum(b) AS b" in out
    assert "min(t) AS t" in out and "GROUP BY k" in out
    transpile_ddl(
        "CREATE TABLE smt2 (k UInt64, a Int64, b Float64) "
        "ENGINE = SummingMergeTree(a) ORDER BY k"
    )
    out = transpile(
        "SELECT k FROM smt2 FINAL",
        resolve_columns=resolve,
        engine_info=lambda n: ENGINE_INFO.get("smt2"),
    )
    assert "sum(a) AS a" in out and "min(b) AS b" in out


def test_engine_info_qualified_keying_and_invalidation():
    """ADVICE r5: ENGINE_INFO must not silently serve db2.t's metadata
    for db1.t through a shared bare-name alias, and DROP must
    invalidate."""
    import pytest

    from clickhouse_vs_dbt_spark.ddl import (
        lookup_engine_info,
        transpile_ddl,
        unregister_engine_info,
    )
    from clickhouse_vs_dbt_spark.dialect import DialectError

    transpile_ddl(
        "CREATE TABLE dbx.amb (k UInt64, v UInt32) "
        "ENGINE = ReplacingMergeTree(v) ORDER BY k"
    )
    transpile_ddl(
        "CREATE TABLE dby.amb (k UInt64, s Int8) "
        "ENGINE = CollapsingMergeTree(s) ORDER BY k"
    )
    # qualified lookups resolve independently
    assert lookup_engine_info("dbx.amb").engine == "ReplacingMergeTree"
    assert lookup_engine_info("dby.amb").engine == "CollapsingMergeTree"
    # bare lookup across two qualified registrations refuses to guess
    with pytest.raises(DialectError, match="ambiguous"):
        lookup_engine_info("amb")
    unregister_engine_info("dby.amb")
    assert lookup_engine_info("amb").engine == "ReplacingMergeTree"
    # bare unregister clears the remaining qualified entry too
    unregister_engine_info("amb")
    assert lookup_engine_info("amb") is None
    # qualified lookup of a bare-registered table falls back
    transpile_ddl(
        "CREATE TABLE amb (k UInt64, v UInt32) "
        "ENGINE = ReplacingMergeTree(v) ORDER BY k"
    )
    assert lookup_engine_info("default.amb").engine == "ReplacingMergeTree"
    unregister_engine_info("amb")


def test_script_create_table_existence_semantics(spark, tmp_path):
    """ADVICE r5: plain CREATE TABLE on an existing table raises (no
    silent drop-and-recreate); IF NOT EXISTS keeps the existing table;
    overwrite_existing=True restores the runbook drop+recreate."""
    import pytest

    from clickhouse_vs_dbt_spark.dialect import (
        DialectError,
        run_clickhouse_script,
    )

    spark.sql("DROP TABLE IF EXISTS sem_t")
    # managed table (no path override): Spark DROP removes the data,
    # matching ClickHouse DROP semantics; external path-backed tables
    # keep their files per Spark's external-table contract
    ddl = (
        "CREATE TABLE sem_t (k UInt64, v Float64) "
        "ENGINE = MergeTree ORDER BY k"
    )
    run_clickhouse_script(spark, ddl + ";")
    spark.sql("INSERT INTO sem_t VALUES (1, 1.0)")
    # IF NOT EXISTS keeps the table (row survives)
    run_clickhouse_script(
        spark,
        "CREATE TABLE IF NOT EXISTS sem_t (k UInt64, v Float64) "
        "ENGINE = MergeTree ORDER BY k;",
    )
    assert spark.table("sem_t").count() == 1
    # plain CREATE on an existing table raises
    with pytest.raises(DialectError, match="already exists"):
        run_clickhouse_script(spark, ddl + ";")
    # the explicit opt-in drops and recreates (row gone)
    run_clickhouse_script(spark, ddl + ";", overwrite_existing=True)
    assert spark.table("sem_t").count() == 0
    # DROP TABLE without IF EXISTS on a missing table raises
    run_clickhouse_script(spark, "DROP TABLE sem_t;")
    with pytest.raises(DialectError, match="does not exist"):
        run_clickhouse_script(spark, "DROP TABLE sem_t;")
    run_clickhouse_script(spark, "DROP TABLE IF EXISTS sem_t;")


def test_ddl_drops_index_projection_constraint(spark, tmp_path):
    """r7: table-level INDEX (data-skipping), PROJECTION, and
    CONSTRAINT entries are layout/engine concerns — dropped, with the
    column list preserved and the table readable."""
    from clickhouse_vs_dbt_spark.ddl import transpile_ddl

    src = tmp_path / "skip_t"
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").write.mode(
        "overwrite"
    ).parquet(str(src))
    out = transpile_ddl(
        """CREATE TABLE skip_t (
  id UInt64,
  s String,
  INDEX idx_s s TYPE bloom_filter GRANULARITY 4,
  INDEX idx_id id TYPE minmax GRANULARITY 1,
  PROJECTION p_agg (SELECT s, count() GROUP BY s),
  CONSTRAINT c_pos CHECK id > 0
) ENGINE = MergeTree ORDER BY id""",
        path_override=str(src),
    )
    assert "INDEX" not in out and "PROJECTION" not in out
    assert "CONSTRAINT" not in out
    spark.sql("DROP TABLE IF EXISTS skip_t")
    spark.sql(out)
    assert spark.table("skip_t").count() == 2
    assert spark.table("skip_t").columns == ["id", "s"]
    spark.sql("DROP TABLE IF EXISTS skip_t")


def test_replicated_engine_args_strip(spark, tmp_path):
    """r7: Replicated* engines carry (zk_path, replica) as leading
    engine args — they must strip so the version/sign columns parse,
    and FROM t FINAL collapses on the REAL version column."""
    from clickhouse_vs_dbt_spark.ddl import lookup_engine_info
    from clickhouse_vs_dbt_spark.dialect import run_clickhouse_script

    src = tmp_path / "rfin"
    spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "x", 1)],
        "k long, v string, ver long",
    ).write.mode("overwrite").parquet(str(src))
    res = run_clickhouse_script(
        spark,
        """
CREATE TABLE rfin (k UInt64, v String, ver UInt64)
ENGINE = ReplicatedReplacingMergeTree('/ch/rfin', '{replica}', ver)
ORDER BY k;
SELECT k, v FROM rfin FINAL ORDER BY k;
""",
        path_overrides={"rfin": str(src)},
        overwrite_existing=True,
    )
    info = lookup_engine_info("rfin")
    assert info.engine == "ReplacingMergeTree" and info.version == "ver"
    assert [tuple(r) for r in res[-1][1].collect()] == [(1, "b"), (2, "x")]


def test_aggregate_function_column_types():
    """r7: AggregateFunction columns — self-merging tier maps to the
    value type (the -State/-Merge contract), registers refuse."""
    import pytest

    from clickhouse_vs_dbt_spark.ddl import DialectError, transpile_ddl

    out = transpile_ddl(
        "CREATE TABLE afc (k UInt64, s AggregateFunction(sum, UInt64), "
        "c AggregateFunction(count), mx SimpleAggregateFunction(max, "
        "Float64)) ENGINE = AggregatingMergeTree ORDER BY k"
    )
    assert "s BIGINT" in out and "c BIGINT" in out and "mx DOUBLE" in out
    with pytest.raises(DialectError, match="sumState"):
        transpile_ddl(
            "CREATE TABLE bad (u AggregateFunction(uniq, UInt64)) "
            "ENGINE = AggregatingMergeTree ORDER BY tuple()"
        )


def test_engine_whitelist_refuses_and_maps():
    """r8: non-table engines must not silently map to parquet
    (VERDICT r7 "What's wrong" #2).  Distributed resolves to a view
    over its underlying table; Kafka/Buffer/unknown refuse with
    pointers; MergeTree family + Memory/Log still transpile."""
    # Distributed(cluster, db, table[, key]) -> identity view: Spark
    # tables are already cluster-distributed
    out = transpile_ddl(
        "CREATE TABLE orders_all (o_orderkey UInt64) "
        "ENGINE = Distributed('main', 'default', orders, o_orderkey)"
    )
    assert out.strip() == "CREATE VIEW orders_all AS SELECT * FROM orders"
    out = transpile_ddl(
        "CREATE TABLE IF NOT EXISTS t_all (k UInt64) "
        "ENGINE = Distributed('c', 'db', 't')"
    )
    assert "CREATE VIEW IF NOT EXISTS t_all" in out
    with pytest.raises(DialectError, match="Distributed needs"):
        transpile_ddl(
            "CREATE TABLE bad (k UInt64) ENGINE = Distributed('c')"
        )
    # Kafka maps to a registered readStream source (r9) — no batch
    # DDL, metadata captured for streaming.kafka_source
    from clickhouse_vs_dbt_spark.ddl import (
        lookup_kafka_info,
        unregister_kafka_info,
    )

    out = transpile_ddl(
        "CREATE TABLE q (k UInt64) "
        "ENGINE = Kafka('broker:9092', 'topic', 'grp', 'JSONEachRow')"
    )
    assert out == ""
    ki = lookup_kafka_info("q")
    assert (ki.brokers, ki.topic, ki.group, ki.fmt) == (
        "broker:9092", "topic", "grp", "JSONEachRow",
    )
    assert "BIGINT" in ki.schema_ddl.upper()
    unregister_kafka_info("q")
    # the SETTINGS spelling parses too and overrides positionals
    transpile_ddl(
        "CREATE TABLE q2 (k UInt64) ENGINE = Kafka "
        "SETTINGS kafka_broker_list = 'h:9092', "
        "kafka_topic_list = 'tp', kafka_group_name = 'g2', "
        "kafka_format = 'CSV'"
    )
    ki2 = lookup_kafka_info("q2")
    assert (ki2.brokers, ki2.topic, ki2.fmt) == ("h:9092", "tp", "CSV")
    unregister_kafka_info("q2")
    with pytest.raises(DialectError, match="Kafka needs broker"):
        transpile_ddl("CREATE TABLE q3 (k UInt64) ENGINE = Kafka")
    with pytest.raises(DialectError, match="no Spark value parser"):
        transpile_ddl(
            "CREATE TABLE q4 (k UInt64) "
            "ENGINE = Kafka('h:9092', 't', 'g', 'Avro')"
        )
    with pytest.raises(DialectError, match="foreachBatch"):
        transpile_ddl(
            "CREATE TABLE b (k UInt64) "
            "ENGINE = Buffer(default, t, 16, 10, 100, 10000, 1000000, "
            "10000000, 100000000)"
        )
    with pytest.raises(DialectError, match="no Spark table mapping"):
        transpile_ddl(
            "CREATE TABLE u (k UInt64) ENGINE = URL('http://x', CSV)"
        )
    # whitelisted families still transpile to parquet tables
    for eng in ("MergeTree", "ReplacingMergeTree(ver)",
                "ReplicatedMergeTree('/p', 'r')", "Memory", "TinyLog"):
        out = transpile_ddl(
            f"CREATE TABLE wl (k UInt64, ver UInt64) ENGINE = {eng} "
            "ORDER BY k"
        )
        assert "USING parquet" in out


def test_r8_operational_statements(spark, tmp_path):
    """r8: EXCHANGE TABLES (blue/green swap), SET (perf no-op /
    semantic refuse), SYSTEM maintenance no-ops, CHECK TABLE,
    ATTACH/DETACH and KILL refusals through the script runner."""
    from clickhouse_vs_dbt_spark.dialect import run_clickhouse_script

    spark.sql("DROP TABLE IF EXISTS ex_live")
    spark.sql("DROP TABLE IF EXISTS ex_stage")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for n in ("ex_live", "ex_stage", "__exchange_tmp_ex_live"):
        shutil.rmtree(f"{wh}/{n}", ignore_errors=True)
    res = run_clickhouse_script(
        spark,
        """
CREATE TABLE ex_live (k UInt64) ENGINE = MergeTree ORDER BY k;
CREATE TABLE ex_stage (k UInt64) ENGINE = MergeTree ORDER BY k;
INSERT INTO ex_live VALUES (1);
INSERT INTO ex_stage VALUES (2), (3);
EXCHANGE TABLES ex_live AND ex_stage;
SET max_threads = 8;
SYSTEM FLUSH LOGS;
CHECK TABLE ex_live;
SELECT count() AS n FROM ex_live;
""",
        overwrite_existing=True,
    )
    kinds = [k for k, _ in res]
    assert "exchange" in kinds and "set_noop" in kinds
    assert "system_noop" in kinds and "check" in kinds
    # the swap: live now holds the staged rows
    assert res[-1][1].collect()[0].n == 2
    assert spark.table("ex_stage").count() == 1
    check_df = [v for k, v in res if k == "check"][0]
    row = check_df.collect()[0]
    assert row.result == 1 and row.n_rows == 2
    # semantic settings refuse
    with pytest.raises(DialectError, match="change query results"):
        run_clickhouse_script(spark, "SET join_use_nulls = 1;")
    with pytest.raises(DialectError, match="server internals"):
        run_clickhouse_script(spark, "SYSTEM STOP MERGES;")
    # bare DETACH/ATTACH TABLE map since r12 (park-and-restore,
    # test_r12_detach_attach_table); the non-table object kinds keep
    # a refusal
    with pytest.raises(DialectError, match="front door"):
        run_clickhouse_script(spark, "DETACH VIEW ex_live;")
    with pytest.raises(DialectError, match="KILL"):
        run_clickhouse_script(spark, "KILL QUERY WHERE query_id = 'x';")
    with pytest.raises(DialectError, match="does not exist"):
        run_clickhouse_script(
            spark, "EXCHANGE TABLES ex_live AND nope_t;"
        )


def test_r8_drop_partition_and_soft_delete(spark, tmp_path):
    """r8: ALTER TABLE ... DROP PARTITION (metadata partition drop on
    the DDL-captured PARTITION BY column), projection/index ALTER
    no-ops, and ReplacingMergeTree(ver, is_deleted) soft-delete
    FINAL."""
    import shutil

    from clickhouse_vs_dbt_spark.dialect import run_clickhouse_script

    spark.sql("DROP TABLE IF EXISTS part_t")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/part_t", ignore_errors=True)
    res = run_clickhouse_script(
        spark,
        """
CREATE TABLE part_t (k UInt64, v Float64, y UInt16)
ENGINE = MergeTree PARTITION BY y ORDER BY k;
INSERT INTO part_t VALUES (1, 1.0, 2023), (2, 2.0, 2024), (3, 3.0, 2024);
ALTER TABLE part_t ADD PROJECTION p1 (SELECT k, v ORDER BY v);
ALTER TABLE part_t DROP PARTITION 2023;
SELECT count() AS n, min(y) AS miny FROM part_t;
""",
        overwrite_existing=True,
    )
    kinds = [k for k, _ in res]
    assert "drop_partition" in kinds and "layout_noop" in kinds
    row = res[-1][1].collect()[0]
    assert row.n == 2 and row.miny == 2024
    # DETACH parks the partition dir (invisible), ATTACH restores it
    # (r8); re-detaching a missing partition and non-partitioned
    # tables refuse
    run_clickhouse_script(
        spark, "ALTER TABLE part_t DETACH PARTITION 2024;"
    )
    assert spark.table("part_t").count() == 0  # 2023 already dropped
    import os

    assert os.path.isdir(f"{wh}/part_t/.detached/y=2024")
    with pytest.raises(DialectError, match="no live directory"):
        run_clickhouse_script(
            spark, "ALTER TABLE part_t DETACH PARTITION 2024;"
        )
    run_clickhouse_script(
        spark, "ALTER TABLE part_t ATTACH PARTITION 2024;"
    )
    rows = spark.table("part_t").collect()
    assert len(rows) == 2 and all(r.y == 2024 for r in rows)
    with pytest.raises(DialectError, match="no detached directory"):
        run_clickhouse_script(
            spark, "ALTER TABLE part_t ATTACH PARTITION 2024;"
        )
    with pytest.raises(DialectError, match="PARTITION BY"):
        run_clickhouse_script(
            spark, "ALTER TABLE nopart_t DROP PARTITION 2024;"
        )
    # cross-table partition ops (r8): copy keeps the source, move
    # drains it; append-attach into an occupied partition and
    # mismatched structures refuse
    shutil.rmtree(f"{wh}/part_u", ignore_errors=True)
    run_clickhouse_script(
        spark,
        """
CREATE TABLE part_u (k UInt64, v Float64, y UInt16)
ENGINE = MergeTree PARTITION BY y ORDER BY k;
ALTER TABLE part_u ATTACH PARTITION 2024 FROM part_t;
""",
        overwrite_existing=True,
    )
    assert spark.table("part_u").count() == 2
    assert spark.table("part_t").count() == 2  # copy, not move
    with pytest.raises(DialectError, match="already has partition"):
        run_clickhouse_script(
            spark,
            "ALTER TABLE part_u ATTACH PARTITION 2024 FROM part_t;",
        )
    run_clickhouse_script(
        spark,
        "ALTER TABLE part_u REPLACE PARTITION 2024 FROM part_t;",
    )
    assert spark.table("part_u").count() == 2
    shutil.rmtree(f"{wh}/part_v", ignore_errors=True)
    run_clickhouse_script(
        spark,
        """
CREATE TABLE part_v (k UInt64, v Float64, y UInt16)
ENGINE = MergeTree PARTITION BY y ORDER BY k;
ALTER TABLE part_t MOVE PARTITION 2024 TO TABLE part_v;
""",
        overwrite_existing=True,
    )
    assert spark.table("part_v").count() == 2
    assert spark.table("part_t").count() == 0  # move drains the source
    # FREEZE snapshots partition dirs into .shadow/<n> (r8); FETCH
    # refuses with the replica pointer; reads are unaffected
    res_fz = run_clickhouse_script(
        spark, "ALTER TABLE part_v FREEZE PARTITION 2024;"
    )
    assert res_fz[0][0] == "freeze"
    assert os.path.isdir(f"{wh}/part_v/.shadow/0/y=2024")
    assert spark.table("part_v").count() == 2
    with pytest.raises(DialectError, match="replica"):
        run_clickhouse_script(
            spark,
            "ALTER TABLE part_v FETCH PARTITION 2024 FROM '/ch/x';",
        )
    # IN PARTITION mutations rewrite one partition dir only (r8)
    run_clickhouse_script(
        spark,
        "ALTER TABLE part_v UPDATE v = v + 100 "
        "IN PARTITION 2024 WHERE k = 2;",
    )
    got = {r.k: r.v for r in spark.table("part_v").collect()}
    assert got == {2: 102.0, 3: 3.0}
    run_clickhouse_script(
        spark,
        "ALTER TABLE part_v DELETE IN PARTITION 2024 WHERE k = 3;",
    )
    assert [r.k for r in spark.table("part_v").collect()] == [2]
    with pytest.raises(DialectError, match="plain-column"):
        run_clickhouse_script(
            spark,
            "ALTER TABLE nopart_t DELETE IN PARTITION 1 WHERE k = 1;",
        )
    # CLEAR COLUMN type-defaults the column in one partition (r8)
    run_clickhouse_script(
        spark,
        "ALTER TABLE part_v CLEAR COLUMN v IN PARTITION 2024;",
    )
    assert [(r.k, r.v) for r in spark.table("part_v").collect()] == [
        (2, 0.0)
    ]
    with pytest.raises(DialectError, match="partition column"):
        run_clickhouse_script(
            spark,
            "ALTER TABLE part_v CLEAR COLUMN y IN PARTITION 2024;",
        )
    with pytest.raises(DialectError, match="different structures"):
        run_clickhouse_script(
            spark,
            """
CREATE TABLE part_w (k UInt64, y UInt16)
ENGINE = MergeTree PARTITION BY y ORDER BY k;
ALTER TABLE part_w ATTACH PARTITION 2024 FROM part_t;
""",
            overwrite_existing=True,
        )
    # ReplacingMergeTree(ver, is_deleted): FINAL drops keys whose
    # latest version carries the delete marker
    src = tmp_path / "softdel"
    spark.createDataFrame(
        [
            (1, "a", 1, 0), (1, "b", 2, 0),        # survives as b
            (2, "x", 1, 0), (2, "x", 2, 1),        # deleted at v2
            (3, "y", 2, 1), (3, "z", 3, 0),        # re-inserted at v3
        ],
        "k long, v string, ver long, is_deleted int",
    ).write.mode("overwrite").parquet(str(src))
    res = run_clickhouse_script(
        spark,
        """
CREATE TABLE softdel (k UInt64, v String, ver UInt64, is_deleted UInt8)
ENGINE = ReplacingMergeTree(ver, is_deleted) ORDER BY k;
SELECT k, v FROM softdel FINAL ORDER BY k;
""",
        path_overrides={"softdel": str(src)},
        overwrite_existing=True,
    )
    assert [tuple(r) for r in res[-1][1].collect()] == [
        (1, "b"), (3, "z"),
    ]


def test_mv_argmax_incremental(spark, tmp_path):
    """argMax/argMin in MV position (r9): the extremal (value, arg)
    struct state merges losslessly across batches — including a value
    tie that straddles a batch boundary, where a naive max_by-of-
    partial-args would pick arbitrarily."""
    from clickhouse_vs_dbt_spark.ddl import transpile_materialized_view

    mv = transpile_materialized_view(
        """CREATE MATERIALIZED VIEW mv_am_test
ENGINE = AggregatingMergeTree
ORDER BY g
AS SELECT g, argMax(a, v) AS top_a, argMin(a, v) AS low_a
FROM src GROUP BY g;""",
        target_path=str(tmp_path / "state"),
    )
    b0 = spark.createDataFrame(
        [("x", 10.0, "p"), ("x", 3.0, "q"), ("y", 1.0, "m")],
        "g string, v double, a string",
    )
    # the v=10 tie arrives in a LATER batch with a larger arg: the
    # struct merge must flip top_a to 'z' (value-major, arg tiebreak)
    b1 = spark.createDataFrame(
        [("x", 10.0, "z"), ("x", 0.5, "w"), ("y", 2.0, "n")],
        "g string, v double, a string",
    )
    mv.apply_batch(spark, b0)
    mv.apply_batch(spark, b1)
    got = {
        r.g: (r.top_a, r.low_a)
        for r in spark.sql(
            "SELECT g, top_a, low_a FROM mv_am_test"
        ).collect()
    }
    assert got == {"x": ("z", "w"), "y": ("n", "m")}


def test_r12_detach_attach_table(spark, sf_dir):
    """VERDICT r11 item 5: DETACH TABLE parks the data directory and
    drops the catalog entry (data survives, name unresolvable);
    ATTACH TABLE re-creates from the captured DDL and swaps the data
    back — managed, so a later DROP keeps ClickHouse's
    drop-removes-data contract.  Unknown names and full-definition
    ATTACH refuse with pointers."""
    import shutil

    from clickhouse_vs_dbt_spark.dialect import (
        DialectError,
        _DETACHED_TABLES,
        run_clickhouse_script,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in ("da_t",):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        shutil.rmtree(f"{wh}/{t}.detached", ignore_errors=True)
        _DETACHED_TABLES.pop(t, None)
    run_clickhouse_script(
        spark,
        """
CREATE TABLE da_t (k Int64, y Int32)
ENGINE = MergeTree PARTITION BY y ORDER BY k;
INSERT INTO da_t SELECT number, toInt32(number % 3) FROM numbers(30);
DETACH TABLE da_t;
""",
        overwrite_existing=True,
    )
    assert not spark.catalog.tableExists("da_t")
    import os

    assert os.path.isdir(f"{wh}/da_t.detached")  # data survived
    # double DETACH refuses; ATTACH of a never-detached name refuses
    with pytest.raises(DialectError, match="no table"):
        run_clickhouse_script(spark, "DETACH TABLE da_t;")
    with pytest.raises(DialectError, match="detached image"):
        run_clickhouse_script(spark, "ATTACH TABLE nope_t;")
    res = run_clickhouse_script(
        spark,
        "ATTACH TABLE da_t;\n"
        "SELECT y, count() AS n FROM da_t GROUP BY y ORDER BY y;",
    )
    rows = {r.y: r.n for r in res[-1][1].collect()}
    assert rows == {0: 10, 1: 10, 2: 10}
    # managed drop semantics survive the round trip: DROP removes
    # the storage again
    spark.sql("DROP TABLE da_t")
    assert not os.path.isdir(f"{wh}/da_t")
    # other object kinds keep the refusal (full-definition ATTACH
    # TABLE maps since r13 — test_r13_attach_table_full_definition)
    with pytest.raises(DialectError, match="front door"):
        run_clickhouse_script(spark, "DETACH DATABASE d;")
    # IF EXISTS / IF NOT EXISTS no-op instead of aborting the script
    # (code-review r12a: idempotent CH runbooks)
    r = run_clickhouse_script(
        spark, "DETACH TABLE IF EXISTS never_made;"
    )
    assert r[-1][0] == "detach_table_noop"
    run_clickhouse_script(
        spark,
        "CREATE TABLE da_t2 (k Int64) ENGINE = MergeTree ORDER BY k;",
        overwrite_existing=True,
    )
    r2 = run_clickhouse_script(
        spark, "ATTACH TABLE IF NOT EXISTS da_t2;"
    )
    assert r2[-1][0] == "attach_table_noop"
    spark.sql("DROP TABLE IF EXISTS da_t2")


def test_r13_attach_table_full_definition(spark):
    """VERDICT r12 item 5: `ATTACH TABLE t (cols…) ENGINE = …`
    composes CREATE-from-inline-DDL with the parked-directory
    adoption — the backup/restore runbook spelling.  Data survives
    the DETACH → full-definition ATTACH round trip; with no parked
    image the statement degrades to an empty CREATE (CH's
    attach-over-empty-directory); attaching over a live name refuses
    unless IF NOT EXISTS."""
    import os
    import shutil

    import pyspark.sql.utils  # noqa: F401

    from clickhouse_vs_dbt_spark.dialect import (
        DialectError,
        _DETACHED_TABLES,
        run_clickhouse_script,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in ("daf_t", "daf_fresh"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        shutil.rmtree(f"{wh}/{t}.detached", ignore_errors=True)
        _DETACHED_TABLES.pop(t, None)
    run_clickhouse_script(
        spark,
        """
CREATE TABLE daf_t (k Int64, y Int32)
ENGINE = MergeTree PARTITION BY y ORDER BY k;
INSERT INTO daf_t SELECT number, toInt32(number % 3) FROM numbers(30);
DETACH TABLE daf_t;
""",
        overwrite_existing=True,
    )
    assert not spark.catalog.tableExists("daf_t")
    res = run_clickhouse_script(
        spark,
        """
ATTACH TABLE daf_t (k Int64, y Int32)
ENGINE = MergeTree PARTITION BY y ORDER BY k;
SELECT y, count() AS n FROM daf_t GROUP BY y ORDER BY y;
""",
    )
    assert res[-2][0] == "attach_table_full"
    rows = {r.y: r.n for r in res[-1][1].collect()}
    assert rows == {0: 10, 1: 10, 2: 10}
    assert "daf_t" not in _DETACHED_TABLES
    # attaching over the now-live name refuses; IF NOT EXISTS no-ops
    with pytest.raises(DialectError, match="already exists"):
        run_clickhouse_script(
            spark,
            "ATTACH TABLE daf_t (k Int64, y Int32) "
            "ENGINE = MergeTree PARTITION BY y ORDER BY k;",
        )
    r2 = run_clickhouse_script(
        spark,
        "ATTACH TABLE IF NOT EXISTS daf_t (k Int64, y Int32) "
        "ENGINE = MergeTree PARTITION BY y ORDER BY k;",
    )
    assert r2[-1][0] == "attach_table_noop"
    spark.sql("DROP TABLE daf_t")
    assert not os.path.isdir(f"{wh}/daf_t")  # managed-drop contract
    # no parked image: degrades to the empty CREATE (CH semantics)
    r3 = run_clickhouse_script(
        spark,
        "ATTACH TABLE daf_fresh (k Int64) "
        "ENGINE = MergeTree ORDER BY k;\n"
        "SELECT count() AS n FROM daf_fresh;",
    )
    assert r3[-2][0] == "attach_table_full"
    assert r3[-1][1].collect()[0].n == 0
    spark.sql("DROP TABLE IF EXISTS daf_fresh")
    # CROSS-SESSION restore (code-review r13a): an on-disk
    # '<loc>.detached' directory with NO in-process stash entry
    # (restart simulation) is adopted, not shadowed by an empty
    # create
    run_clickhouse_script(
        spark,
        """
CREATE TABLE daf_x (k Int64) ENGINE = MergeTree ORDER BY k;
INSERT INTO daf_x SELECT number FROM numbers(7);
DETACH TABLE daf_x;
""",
        overwrite_existing=True,
    )
    _DETACHED_TABLES.pop("daf_x", None)  # simulate a new session
    r4 = run_clickhouse_script(
        spark,
        "ATTACH TABLE daf_x (k Int64) "
        "ENGINE = MergeTree ORDER BY k;\n"
        "SELECT count() AS n FROM daf_x;",
    )
    assert r4[-1][1].collect()[0].n == 7
    spark.sql("DROP TABLE IF EXISTS daf_x")


def test_r13_attach_missing_parked_refuses(spark):
    """ADVICE r12: ATTACH of a table whose parked '.detached'
    directory vanished (removed externally) refuses instead of
    silently attaching the CREATE's empty skeleton over the data
    loss; the stash entry survives so the failure stays
    re-diagnosable."""
    import os
    import shutil

    from clickhouse_vs_dbt_spark.dialect import (
        DialectError,
        _DETACHED_TABLES,
        run_clickhouse_script,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    spark.sql("DROP TABLE IF EXISTS da_gone")
    shutil.rmtree(f"{wh}/da_gone", ignore_errors=True)
    shutil.rmtree(f"{wh}/da_gone.detached", ignore_errors=True)
    _DETACHED_TABLES.pop("da_gone", None)
    run_clickhouse_script(
        spark,
        """
CREATE TABLE da_gone (k Int64) ENGINE = MergeTree ORDER BY k;
INSERT INTO da_gone SELECT number FROM numbers(5);
DETACH TABLE da_gone;
""",
        overwrite_existing=True,
    )
    shutil.rmtree(f"{wh}/da_gone.detached")
    with pytest.raises(DialectError, match="missing"):
        run_clickhouse_script(spark, "ATTACH TABLE da_gone;")
    assert "da_gone" in _DETACHED_TABLES  # stash survives the refuse
    assert not os.path.isdir(f"{wh}/da_gone")  # no empty skeleton
    _DETACHED_TABLES.pop("da_gone", None)
