"""Structured Streaming tumbling window must equal the batch operator
row-for-row (one window-semantics definition, two execution modes)."""

from __future__ import annotations

from clickhouse_vs_dbt_spark.operators.timeseries import q_events_tumbling
from clickhouse_vs_dbt_spark.streaming.events_stream import run_tumbling_stream


def test_stream_equals_batch(spark, sf_dir):
    batch = q_events_tumbling(spark, sf_dir).collect()
    stream = run_tumbling_stream(spark, sf_dir).collect()
    assert len(stream) == len(batch)
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))


def test_stream_dedup_removes_duplicate_delivery(spark, sf_dir):
    """The dual-delivery replay really carries 2x rows; dedup collapses
    them back to exactly the fixture."""
    import pyspark.sql.functions as F

    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.streaming.stream_dedup import (
        _as_duplicated_stream_dir,
        q_events_stream_dedup,
    )

    n_fixture = load_table(spark, sf_dir, "events").count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(_as_duplicated_stream_dir(sf_dir))
    assert raw.count() == 2 * n_fixture  # duplicates really arrive

    deduped = q_events_stream_dedup(spark, sf_dir)
    assert deduped.count() == n_fixture
    assert deduped.select("event_id").distinct().count() == n_fixture
    assert deduped.filter(F.col("value_dec").isNull()).count() == 0


def test_stream_upsert_converges_across_micro_batches(spark, sf_dir):
    """One file per trigger → the duplicate delivery lands in a LATER
    batch and must be merged out by the cross-batch anti-join path."""
    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.streaming.stream_upsert import (
        q_events_stream_upsert,
    )

    final = q_events_stream_upsert(spark, sf_dir, max_files_per_trigger=1)
    n_fixture = load_table(spark, sf_dir, "events").count()
    assert final.count() == n_fixture
    assert final.select("event_id").distinct().count() == n_fixture


def test_stream_late_drop_drops_and_withholds(spark, sf_dir):
    """Append-mode watermark semantics: the 3-batch replay must emit
    strictly fewer (window, type) groups than the unrestricted batch
    tumbling aggregate — stragglers into finalized windows are dropped
    and the final horizon is withheld."""
    from clickhouse_vs_dbt_spark.operators.timeseries import q_events_tumbling
    from clickhouse_vs_dbt_spark.streaming.stream_late import (
        run_late_drop_stream,
    )

    streamed = run_late_drop_stream(spark, sf_dir)
    batch_groups = q_events_tumbling(spark, sf_dir).count()
    n = streamed.count()
    assert 0 < n < batch_groups
    # emitted groups are a subset of the batch result's keys
    batch_keys = {
        (r.window_start, r.event_type)
        for r in q_events_tumbling(spark, sf_dir).collect()
    }
    for r in streamed.collect():
        assert (r.window_start, r.event_type) in batch_keys


def test_retract_stream_equals_batch_collapse(spark, sf_dir):
    """The foreachBatch retract fold, replayed over three orderkey-
    striped triggers (so +1/-1 pairs split across batches and state
    carries partial nets), must finalize to exactly the one-shot batch
    CollapsingMergeTree read."""
    from clickhouse_vs_dbt_spark.operators.mergetree import (
        q_mergetree_collapsing,
    )
    from clickhouse_vs_dbt_spark.streaming.stream_retract import (
        q_events_stream_retract,
    )

    got = q_events_stream_retract(spark, sf_dir).collect()
    want = q_mergetree_collapsing(spark, sf_dir).collect()
    # the batch read carries no presentation ORDER BY — compare as sets
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)


def test_retract_fold_replays_are_noops(spark, tmp_path):
    """foreachBatch re-delivers a batch_id after failure/restart; the
    fold must key committed state by batch_id so a replay never
    double-counts (the exactly-once sink contract)."""
    from clickhouse_vs_dbt_spark.streaming.stream_retract import (
        make_fold_batch,
    )

    base = str(tmp_path / "state")
    state = {"last_committed": -1}
    fold = make_fold_batch(base, state)
    b0 = spark.createDataFrame(
        [(1, 1, 100.0, 1), (1, 2, 50.0, 1)],
        "o_orderkey long, o_custkey long, amount double, sign int",
    )
    b1 = spark.createDataFrame(
        [(2, 1, 100.0, -1), (2, 1, 90.0, 1)],
        "o_orderkey long, o_custkey long, amount double, sign int",
    )
    fold(b0, 0)
    fold(b0, 0)  # post-commit replay of the same batch_id: no-op
    fold(b1, 1)
    fold(b0, 0)  # late replay of an old batch_id: no-op
    assert state["last_committed"] == 1
    final = {
        r.o_custkey: (r.net_rows, float(r.net_amount_dec))
        for r in spark.read.parquet(f"{base}/v1").collect()
    }
    # cust 1: +100 -100 +90 = 90 net over 1 row; cust 2: +50
    assert final == {1: (1, 90.0), 2: (1, 50.0)}


def test_kafka_engine_end_to_end(spark, sf_dir):
    """ENGINE = Kafka through the script runner (r9): the queue DDL
    registers a readStream source instead of refusing, the attached
    MV folds the replayed envelope batches, and the state converges
    to the one-shot batch aggregate."""
    from clickhouse_vs_dbt_spark.ddl import lookup_kafka_info
    from clickhouse_vs_dbt_spark.streaming.kafka_source import (
        q_ddl_kafka_stream,
    )
    from clickhouse_vs_dbt_spark.catalog import load_table
    from pyspark.sql import functions as F

    got = {tuple(r) for r in q_ddl_kafka_stream(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {
        tuple(r)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("value") > 10, 1)).alias("n_hot"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()
    }
    assert got == want
    # the queue stays registered (metadata) but never becomes a table
    assert lookup_kafka_info("events_queue") is not None
    assert not spark.catalog.tableExists("events_queue")


def test_kafka_value_parse_csv_and_drop(spark):
    """The CSV wire format parses through from_csv, and DROP TABLE of
    a Kafka queue detaches the registered source."""
    from clickhouse_vs_dbt_spark.ddl import (
        lookup_kafka_info,
        transpile_ddl,
    )
    from clickhouse_vs_dbt_spark.dialect import run_clickhouse_script
    from clickhouse_vs_dbt_spark.streaming.kafka_source import (
        parse_kafka_value,
    )

    transpile_ddl(
        "CREATE TABLE csv_q (k Int64, name String, v Float64) "
        "ENGINE = Kafka('h:9092', 't', 'g', 'CSV')"
    )
    raw = spark.createDataFrame(
        [(b"1", b"7,foo,1.5"), (b"2", b"8,bar,2.5")],
        "key binary, value binary",
    )
    got = sorted(tuple(r) for r in parse_kafka_value(raw, "csv_q").collect())
    assert got == [(7, "foo", 1.5), (8, "bar", 2.5)]
    run_clickhouse_script(spark, "DROP TABLE csv_q;")
    assert lookup_kafka_info("csv_q") is None


def test_kafka_value_parse_csv_with_names(spark):
    """CSVWithNames: each Kafka message is a BLOCK — header line first,
    data lines after (CH input_format_with_names_use_header).  The
    parser drops the header, explodes the data lines, and a
    header-only or trailing-newline message yields no phantom rows
    (ADVICE r9: the DDL whitelisted the format but the parser raised)."""
    from clickhouse_vs_dbt_spark.ddl import transpile_ddl, unregister_kafka_info
    from clickhouse_vs_dbt_spark.streaming.kafka_source import (
        parse_kafka_value,
    )

    transpile_ddl(
        "CREATE TABLE csvn_q (k Int64, name String, v Float64) "
        "ENGINE = Kafka('h:9092', 't', 'g', 'CSVWithNames')"
    )
    try:
        raw = spark.createDataFrame(
            [
                # two data rows + trailing newline
                (b"1", b"k,name,v\n7,foo,1.5\n8,bar,2.5\n"),
                # single data row, no trailing newline
                (b"2", b"k,name,v\n9,baz,3.5"),
                # header-only message → no rows
                (b"3", b"k,name,v"),
            ],
            "key binary, value binary",
        )
        got = sorted(
            tuple(r) for r in parse_kafka_value(raw, "csvn_q").collect()
        )
        assert got == [(7, "foo", 1.5), (8, "bar", 2.5), (9, "baz", 3.5)]
        # a REORDERED header maps BY NAME, exactly like ClickHouse's
        # input_format_with_names_use_header=1 (ADVICE r10: the old
        # positional contract silently emitted all-NULL rows here)
        perm = spark.createDataFrame(
            [(b"4", b"v,name,k\n1.5,foo,7")],
            "key binary, value binary",
        )
        rows = parse_kafka_value(perm, "csvn_q").collect()
        assert len(rows) == 1 and tuple(rows[0]) == (7, "foo", 1.5)
        # spaced / quoted header names normalize before matching
        spaced = spark.createDataFrame(
            [(b"5", b' k , "name" ,v\n7,foo,1.5')],
            "key binary, value binary",
        )
        rows = parse_kafka_value(spaced, "csvn_q").collect()
        assert len(rows) == 1 and tuple(rows[0]) == (7, "foo", 1.5)
        # quoting survives the by-name re-serialization round-trip
        quoted = spark.createDataFrame(
            [(b"6", b'name,k,v\n"a,b",7,1.5')],
            "key binary, value binary",
        )
        rows = parse_kafka_value(quoted, "csvn_q").collect()
        assert len(rows) == 1 and tuple(rows[0]) == (7, "a,b", 1.5)
        # an unknown / non-permutation header fails LOUDLY — never
        # silent NULL data rows
        bad = spark.createDataFrame(
            [(b"7", b"k,nope,v\n7,foo,1.5")],
            "key binary, value binary",
        )
        import pytest

        with pytest.raises(Exception, match="does not match"):
            parse_kafka_value(bad, "csvn_q").collect()
        # a quoted header name containing a comma parses as ONE field
        # (code-review r11: the raw comma split mis-split it); it is
        # not a declared name, so the loud rejection fires — and an
        # over-wide header rejects despite from_csv dropping extras
        for payload in (b'"a,b",k,v\n1,2,3', b"k,name,v,extra\n7,foo,1.5,9"):
            widebad = spark.createDataFrame(
                [(b"8", payload)], "key binary, value binary"
            )
            with pytest.raises(Exception, match="does not match"):
                parse_kafka_value(widebad, "csvn_q").collect()
    finally:
        unregister_kafka_info("csvn_q")


def test_kafka_queue_batch_access_refuses(spark):
    """Batch access to a Kafka queue refuses with the contract
    instead of an opaque table-not-found: direct SELECT consumes in
    CH (query the MV instead), INSERT produces to the broker."""
    import pytest

    from clickhouse_vs_dbt_spark.ddl import (
        DialectError,
        transpile_ddl,
        unregister_kafka_info,
    )
    from clickhouse_vs_dbt_spark.dialect import run_clickhouse_script

    transpile_ddl(
        "CREATE TABLE guard_q (k Int64) "
        "ENGINE = Kafka('h:9092', 't', 'g', 'JSONEachRow')"
    )
    try:
        with pytest.raises(DialectError, match="streaming consumer"):
            run_clickhouse_script(spark, "SELECT count() FROM guard_q;")
        with pytest.raises(DialectError, match="topic producer"):
            run_clickhouse_script(
                spark, "INSERT INTO guard_q SELECT 1;"
            )
        # the guard is TABLE-position only (ADVICE r9): a column alias
        # or string that collides with the queue name must not refuse
        [(got,)] = run_clickhouse_script(
            spark, "SELECT 1 AS guard_q;"
        )[0][1].collect()
        assert got == 1
        [(got,)] = run_clickhouse_script(
            spark, "SELECT length('guard_q') AS n;"
        )[0][1].collect()
        assert got == 7
        # ...but table position includes comma-separated FROM lists
        # and the last component of dotted names (code-review r10)
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW other_t AS SELECT 1 AS a"
        )
        with pytest.raises(DialectError, match="streaming consumer"):
            run_clickhouse_script(
                spark, "SELECT * FROM other_t, guard_q;"
            )
        with pytest.raises(DialectError, match="streaming consumer"):
            run_clickhouse_script(
                spark, "SELECT count() FROM db.guard_q;"
            )
        # ...and relations at ANY paren depth: a queue inside a
        # subquery or CTE body must refuse too (ADVICE r10)
        with pytest.raises(DialectError, match="streaming consumer"):
            run_clickhouse_script(
                spark,
                "SELECT * FROM (SELECT * FROM guard_q);",
            )
        with pytest.raises(DialectError, match="streaming consumer"):
            run_clickhouse_script(
                spark,
                "WITH c AS (SELECT k FROM guard_q) "
                "SELECT count() FROM c;",
            )
        # while a colliding alias inside a subquery still passes
        [(got,)] = run_clickhouse_script(
            spark,
            "SELECT guard_q FROM (SELECT 1 AS guard_q);",
        )[0][1].collect()
        assert got == 1
        # and a subquery's alias is not relation position
        [(got,)] = run_clickhouse_script(
            spark,
            "SELECT a FROM (SELECT 1 AS a) other_t;",
        )[0][1].collect()
        assert got == 1
        # the FROM inside extract()/substring()/trim() keyword syntax
        # is NOT relation position (code-review r11): a colliding
        # column name must not refuse
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW guard_col_t AS "
            "SELECT DATE '2024-03-15' AS guard_q, ' x ' AS sp"
        )
        [(got,)] = run_clickhouse_script(
            spark,
            "SELECT extract(YEAR FROM guard_q) AS y FROM guard_col_t;",
        )[0][1].collect()
        assert got == 2024
        [(got,)] = run_clickhouse_script(
            spark,
            "SELECT trim(BOTH ' ' FROM sp) AS v FROM guard_col_t;",
        )[0][1].collect()
        assert got == "x"
        # ...while a queue inside a FROM-position subquery of a call
        # argument still refuses
        with pytest.raises(DialectError, match="streaming consumer"):
            run_clickhouse_script(
                spark,
                "SELECT length((SELECT CAST(count(*) AS STRING) "
                "FROM guard_q));",
            )
    finally:
        unregister_kafka_info("guard_q")
