"""SSB .tbl CSV source (operators S1/T1; reference README.md:158-222)."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError as SparkException

from clickhouse_vs_dbt_spark.sources import SSB_SCHEMAS, read_ssb_csv

SUPPLIER_ROWS = [
    "1|Supplier#000000001|addr one|CITY0|NATION0|REGION0|555-0001|",
    "2|Supplier#000000002|addr two|CITY1|NATION1|REGION1|555-0002|",
]


def test_reads_trailing_pipe_tbl(spark, tmp_path):
    p = tmp_path / "supplier.tbl"
    p.write_text("\n".join(SUPPLIER_ROWS) + "\n")
    df = read_ssb_csv(spark, str(p), "supplier")
    assert df.columns == [f.name for f in SSB_SCHEMAS["supplier"].fields]
    rows = sorted(df.collect(), key=lambda r: r.S_SUPPKEY)
    assert rows[0].S_SUPPKEY == 1 and rows[0].S_NAME == "Supplier#000000001"
    assert len(rows) == 2


def test_lineorder_types(spark, tmp_path):
    p = tmp_path / "lineorder.tbl"
    p.write_text(
        "1|1|10|20|30|1993-01-04|1-URGENT|0|17|2116823|17366547|4|2032150|74711|2|1993-02-22|TRUCK|\n"
    )
    df = read_ssb_csv(spark, str(p), "lineorder")
    r = df.collect()[0]
    assert r.LO_ORDERDATE.isoformat() == "1993-01-04"
    assert r.LO_EXTENDEDPRICE == 2116823 and isinstance(r.LO_EXTENDEDPRICE, int)
    # UInt8 columns land in Short
    assert df.schema["LO_QUANTITY"].dataType.simpleString() == "smallint"
    # money columns are 64-bit so sum(price*discount) cannot overflow
    assert df.schema["LO_EXTENDEDPRICE"].dataType.simpleString() == "bigint"


def test_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.tbl"
    p.write_text("notanint|Supplier#1|a|b|c|d|e|\n")
    with pytest.raises(SparkException):
        read_ssb_csv(spark, str(p), "supplier").collect()


def test_unknown_table(spark):
    with pytest.raises(KeyError):
        read_ssb_csv(spark, "/tmp/x", "nope")


def test_jsonl_roundtrip_preserves_rows_and_types(spark, sf_dir, tmp_path):
    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.sources.jsonl import (
        DOCUMENTS_SCHEMA,
        read_jsonl,
        write_jsonl,
    )

    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(d, path)
    back = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    assert back.count() == d.count()
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in DOCUMENTS_SCHEMA.fields
    ]
    # content equality, order-insensitive
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_parquet_partitioned_prunes(spark, sf_dir):
    from clickhouse_vs_dbt_spark.sources import parquet_part

    df = parquet_part.pruned_read(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    langs = {r.lang for r in df.select("lang").distinct().collect()}
    assert langs <= set(parquet_part.PRUNE_LANGS)


def test_parquet_roundtrip_lossless(spark, sf_dir):
    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.sources import parquet_part
    from pyspark.sql import functions as F

    back = parquet_part.pruned_read(spark, sf_dir)
    orig = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin(*parquet_part.PRUNE_LANGS)
    )
    assert back.count() == orig.count()
    assert sorted(back.columns) == sorted(orig.columns)


def test_orc_roundtrip_lossless(spark, sf_dir):
    import os
    import tempfile

    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.sources.orc_src import read_orc, write_orc

    e = load_table(spark, sf_dir, "events")
    path = os.path.join(tempfile.mkdtemp(prefix="orc_test_"), "events_orc")
    write_orc(e, path)
    back = read_orc(spark, path)
    assert back.schema == e.schema  # exact type preservation both ways
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, e.collect()))


def test_tbl_read_via_scheme_qualified_uri(spark, tmp_path):
    """Sources take Hadoop filesystem URIs, not bare paths — the
    object-store posture (s3a://...) with file:// standing in for the
    scheme (no object store in this sandbox; same URI plumbing)."""
    from clickhouse_vs_dbt_spark.sources.ssb_csv import read_ssb_csv

    p = tmp_path / "supplier.tbl"
    p.write_text(
        "1|Supplier#1|addr|CITY_0|NATION_0|REGION_0|555-1|\n"
        "2|Supplier#2|addr|CITY_1|NATION_1|REGION_1|555-2|\n"
    )
    out = read_ssb_csv(spark, f"file://{p}", "supplier").collect()
    assert [r.S_SUPPKEY for r in out] == [1, 2]
    assert out[0].S_NATION == "NATION_0"


def test_objectstore_scan_routes_through_viewfs(spark, sf_dir):
    """The read must actually plan against the mounted viewfs:// scheme
    (not silently resolve to file:), with the price predicate pushed
    into the parquet scan through the mounted FileSystem."""
    from clickhouse_vs_dbt_spark.sources.objectstore import (
        CUTOFF_PRICE,
        _mount_name,
        mount,
    )
    from pyspark.sql import functions as F

    name = _mount_name(sf_dir)
    mount(spark, name, "tables", sf_dir)
    df = spark.read.parquet(f"viewfs://{name}/tables/orders.parquet").filter(
        F.col("o_totalprice") > CUTOFF_PRICE
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert f"viewfs://{name}" in plan
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan
    assert df.count() > 0


def test_rechunk_splits_by_bytes_not_row_groups(spark, tmp_path):
    """r17: a large single FILE scans as ceil(size/maxPartitionBytes)
    tasks no matter how many row groups it has — the fixture
    normalizer must rewrite whenever the byte-range split count
    leaves cores idle, and skip only when the file already splits
    wide enough (the sf1 scaling-probe regression: a 108 MB
    ten-row-group lineitem scanned single-task)."""
    import pyspark.sql.functions as F

    from clickhouse_vs_dbt_spark import catalog as cat

    src_dir = str(tmp_path)
    # ~1.2 MB incompressible file so it passes _CHUNK_MIN_BYTES
    spark.range(40_000).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("a"),
        F.sha2(F.col("id").cast("string"), 256).alias("b"),
    ).coalesce(1).write.mode("overwrite").parquet(src_dir + "/_tmp")
    import glob
    import os
    import shutil

    part = glob.glob(src_dir + "/_tmp/part-*.parquet")[0]
    shutil.move(part, src_dir + "/orders.parquet")
    assert os.path.getsize(src_dir + "/orders.parquet") > cat._CHUNK_MIN_BYTES

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # wide-enough case: tiny advisory split -> no rewrite
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        cat._CHUNK_CACHE.pop((src_dir, "orders"), None)
        assert cat._rechunk(spark, src_dir, "orders") is None
        # single-split case: default 128 MB -> rewrite to n chunks
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", "134217728"
        )
        cat._CHUNK_CACHE.pop((src_dir, "orders"), None)
        path = cat._rechunk(spark, src_dir, "orders")
        assert path is not None
        n = spark.sparkContext.defaultParallelism
        assert len(glob.glob(path + "/part-*.parquet")) == n
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        cat._CHUNK_CACHE.pop((src_dir, "orders"), None)
