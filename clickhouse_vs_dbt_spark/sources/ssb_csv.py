"""Reference-faithful SSB ``.tbl`` CSV source (operators S1 + T1).

The reference declares four external tables ``ENGINE = S3(url, 'CSV')``
with explicit column lists (reference README.md:158-170 customer,
:172-193 lineorder, :195-208 part, :210-221 supplier) over headerless
``|``-delimited ssb-dbgen output.  The Spark-native equivalent is a lazy
``spark.read.csv`` with an explicit StructType — same external-table
semantics (re-scanned per action), strict parse (FAILFAST ≈ ClickHouse's
CSV coercion errors), explicit separator (the reference leaves the
``.tbl``-vs-'CSV' delimiter ambiguity unstated, SURVEY.md §1.3).

Type mapping per SURVEY.md §1.2: UInt32→Long (no unsigned ints in Spark;
sums overflow 2^32 — golden value 446_031_203_850 at README.md:419),
UInt8→Short, LowCardinality(String)→String (dictionary encoding is a
physical concern Parquet handles), Date→Date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, False) for n, t in fields])


SSB_SCHEMAS: dict[str, T.StructType] = {
    # reference README.md:158-170
    "customer": _st(
        ("C_CUSTKEY", T.LongType()),
        ("C_NAME", T.StringType()),
        ("C_ADDRESS", T.StringType()),
        ("C_CITY", T.StringType()),
        ("C_NATION", T.StringType()),
        ("C_REGION", T.StringType()),
        ("C_PHONE", T.StringType()),
        ("C_MKTSEGMENT", T.StringType()),
    ),
    # reference README.md:172-193
    "lineorder": _st(
        ("LO_ORDERKEY", T.LongType()),
        ("LO_LINENUMBER", T.ShortType()),
        ("LO_CUSTKEY", T.LongType()),
        ("LO_PARTKEY", T.LongType()),
        ("LO_SUPPKEY", T.LongType()),
        ("LO_ORDERDATE", T.DateType()),
        ("LO_ORDERPRIORITY", T.StringType()),
        ("LO_SHIPPRIORITY", T.ShortType()),
        ("LO_QUANTITY", T.ShortType()),
        ("LO_EXTENDEDPRICE", T.LongType()),
        ("LO_ORDTOTALPRICE", T.LongType()),
        ("LO_DISCOUNT", T.ShortType()),
        ("LO_REVENUE", T.LongType()),
        ("LO_SUPPLYCOST", T.LongType()),
        ("LO_TAX", T.ShortType()),
        ("LO_COMMITDATE", T.DateType()),
        ("LO_SHIPMODE", T.StringType()),
    ),
    # reference README.md:195-208
    "part": _st(
        ("P_PARTKEY", T.LongType()),
        ("P_NAME", T.StringType()),
        ("P_MFGR", T.StringType()),
        ("P_CATEGORY", T.StringType()),
        ("P_BRAND", T.StringType()),
        ("P_COLOR", T.StringType()),
        ("P_TYPE", T.StringType()),
        ("P_SIZE", T.ShortType()),
        ("P_CONTAINER", T.StringType()),
    ),
    # reference README.md:210-221
    "supplier": _st(
        ("S_SUPPKEY", T.LongType()),
        ("S_NAME", T.StringType()),
        ("S_ADDRESS", T.StringType()),
        ("S_CITY", T.StringType()),
        ("S_NATION", T.StringType()),
        ("S_REGION", T.StringType()),
        ("S_PHONE", T.StringType()),
    ),
}


def read_ssb_csv(
    spark: SparkSession,
    path: str,
    table: str,
    sep: str = "|",
    date_format: str = "yyyy-MM-dd",
    strict: bool = True,
) -> DataFrame:
    """Read an ssb-dbgen ``.tbl`` file with the declared schema.

    ssb-dbgen terminates every record with a trailing ``|`` — Spark's CSV
    reader sees that as one extra empty column, so the schema gains a
    throwaway tail column which is dropped after parse.
    """
    if table not in SSB_SCHEMAS:
        raise KeyError(f"unknown SSB table {table!r}")
    schema = SSB_SCHEMAS[table]
    padded = T.StructType(
        list(schema.fields) + [T.StructField("_trailing", T.StringType(), True)]
    )
    df = (
        spark.read.schema(padded)
        .options(
            sep=sep,
            header=False,
            dateFormat=date_format,
            mode="FAILFAST" if strict else "PERMISSIVE",
        )
        .csv(path)
    )
    return df.select(*[f.name for f in schema.fields])
