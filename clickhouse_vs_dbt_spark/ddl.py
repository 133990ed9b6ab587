"""ClickHouse DDL → Spark DDL transpiler.

The reference defines its entire source layer as ClickHouse ``CREATE
TABLE ... ENGINE = S3(url, 'CSV')`` DDL (reference README.md:155-222);
a migrating user's first artifact IS a stack of such statements.
:func:`transpile_ddl` rewrites one into the Spark-native equivalent:

* the **type system** maps per SURVEY.md §1.2 — ``UInt32``→``BIGINT``
  (Spark has no unsigned; INT would overflow above 2³¹−1),
  ``LowCardinality(X)``→``X`` (dictionary encoding is a physical
  concern parquet handles automatically), ``Nullable(X)``→``X``
  (Spark columns are nullable by default), containers recurse
  (``Array``/``Map``/``Tuple``), ``Enum8/16``→``STRING``,
  ``DateTime64``→``TIMESTAMP``, ``Decimal(p,s)`` passes through;
* ``ENGINE = S3(url, fmt)`` → ``USING csv OPTIONS (path ...)`` — an
  **external datasource table**, re-scanned per query, exactly the
  reference's source-table semantics (README.md §1.1); the URL passes
  through verbatim (s3a/https/file all resolve via the Hadoop
  FileSystem layer — see sources/objectstore.py);
* ``ENGINE = MergeTree/Replacing.../Summing...`` → ``USING parquet``.
  The engine's MERGE semantics are not a storage option in Spark —
  they are the explicit reads in operators/mergetree.py (see
  MIGRATION.md); the DDL-level mapping is the storage format;
* ``PARTITION BY <bare column>`` → ``PARTITIONED BY (col)``; an
  expression partition (``toYYYYMM(d)``) has no direct Spark DDL form
  and is DROPPED — materialize the expression as a column instead
  (the star table's ``order_year`` pattern, plans/star.py);
* ``ORDER BY`` / ``PRIMARY KEY`` / ``SAMPLE BY`` / ``TTL`` /
  ``SETTINGS`` / ``ON CLUSTER`` are layout/cluster concerns with no
  Spark-DDL equivalent and are dropped (sort-order locality →
  operators/zorder.py or bucketed writes, plans/bucketing.py; TTL →
  mergetree_ttl_rollup; sampling → clickhouse_sample_clause).

Column-level ``DEFAULT``/``MATERIALIZED``/``CODEC``/``COMMENT``
suffixes are dropped (codec/compression is a parquet writer option;
defaults belong to the ingest pipeline).  The test suite runs the
reference's own DDL blocks character-for-character (modulo the
placeholder substitutions the reference itself instructs) and reads
rows back through the created table.
"""

from __future__ import annotations

import re

from clickhouse_vs_dbt_spark.dialect import DialectError

_SCALAR = {
    "UInt8": "SMALLINT",
    "UInt16": "INT",
    "UInt32": "BIGINT",
    "UInt64": "BIGINT",  # documented narrowing: no unsigned 64-bit
    "Int8": "TINYINT",
    "Int16": "SMALLINT",
    "Int32": "INT",
    "Int64": "BIGINT",
    "Float32": "FLOAT",
    "Float64": "DOUBLE",
    "String": "STRING",
    "UUID": "STRING",
    "Date": "DATE",
    "Date32": "DATE",
    "DateTime": "TIMESTAMP",
    "Bool": "BOOLEAN",
    "IPv4": "STRING",
    "IPv6": "STRING",
}

_TYPE_RE = re.compile(r"\s*([A-Za-z0-9_]+)\s*(\((.*)\))?\s*\Z", re.DOTALL)


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (parens and quotes protected)."""
    out, depth, start, i, n = [], 0, 0, 0, len(s)
    in_str = False
    while i < n:
        c = s[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def convert_type(ch: str) -> str:
    """Convert one ClickHouse type expression to Spark SQL DDL."""
    m = _TYPE_RE.match(ch)
    if not m:
        raise DialectError(f"unparseable ClickHouse type: {ch!r}")
    name, _, inner = m.groups()
    if name in _SCALAR:
        return _SCALAR[name]
    if name in ("LowCardinality", "Nullable"):
        return convert_type(inner)
    if name == "FixedString":
        return "STRING"
    if name in ("Enum8", "Enum16"):
        return "STRING"
    if name == "DateTime" or name == "DateTime64":
        return "TIMESTAMP"
    if name == "Decimal":
        p, s = (x.strip() for x in inner.split(","))
        return f"DECIMAL({p}, {s})"
    if name in ("Decimal32", "Decimal64", "Decimal128"):
        prec = {"Decimal32": 9, "Decimal64": 18, "Decimal128": 38}[name]
        return f"DECIMAL({prec}, {inner.strip()})"
    if name == "Array":
        return f"ARRAY<{convert_type(inner)}>"
    if name == "Map":
        k, v = _split_top(inner)
        return f"MAP<{convert_type(k)}, {convert_type(v)}>"
    if name == "Tuple":
        fields = []
        for i, f in enumerate(_split_top(inner)):
            parts = f.split(None, 1)
            if len(parts) == 2 and _TYPE_RE.match(parts[1]):
                fields.append(f"{parts[0]}: {convert_type(parts[1])}")
            else:
                fields.append(f"_{i + 1}: {convert_type(f)}")
        return f"STRUCT<{', '.join(fields)}>"
    raise DialectError(f"unsupported ClickHouse type: {name!r}")


_COL_STOP = frozenset(
    ("DEFAULT", "MATERIALIZED", "ALIAS", "CODEC", "COMMENT", "TTL")
)


def _convert_coldef(d: str) -> str:
    parts = d.split(None, 1)
    if len(parts) != 2:
        raise DialectError(f"unparseable column definition: {d!r}")
    name, rest = parts
    # cut the type expression at the first suffix keyword — scanning
    # OUTSIDE quotes and parens, so an Enum value or default string
    # literally containing DEFAULT/ALIAS/... never truncates the type
    cut = len(rest)
    depth = 0
    in_str = False
    i = 0
    while i < len(rest):
        c = rest[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0 and (c.isalpha() or c == "_"):
            j = i
            while j < len(rest) and (rest[j].isalnum() or rest[j] == "_"):
                j += 1
            if rest[i:j].upper() in _COL_STOP and i > 0:
                cut = i
                break
            i = j
            continue
        i += 1
    return f"{name} {convert_type(rest[:cut].strip())}"


_DDL_RE = re.compile(
    r"""CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?
        (?P<name>[^\s(]+)\s*
        (?:ON\s+CLUSTER\s+\S+\s*)?
        \((?P<cols>.*)\)\s*
        ENGINE\s*=\s*(?P<engine>[A-Za-z0-9_]+)\s*(?:\((?P<eargs>.*?)\))?
        (?P<tail>.*?)\s*;?\s*\Z
    """,
    re.VERBOSE | re.DOTALL | re.IGNORECASE,
)


def transpile_ddl(
    sql: str,
    path_override: str | None = None,
    options: dict[str, str] | None = None,
) -> str:
    """Rewrite one ClickHouse CREATE TABLE into Spark DDL (module doc).

    ``path_override`` replaces the S3 URL (local testing / relocation);
    ``options`` adds datasource options (e.g. ``{"sep": "|"}`` for
    pipe-separated .tbl files).
    """
    # find the column list by balancing parens from the first '('
    m = _DDL_RE.match(sql.strip())
    if not m:
        raise DialectError("unrecognized CREATE TABLE shape")
    name = m.group("name")
    cols = ",\n  ".join(_convert_coldef(c) for c in _split_top(m.group("cols")))
    engine = m.group("engine")
    eargs = _split_top(m.group("eargs") or "")
    tail = m.group("tail") or ""

    opts = dict(options or {})
    if engine.upper() == "S3":
        if not eargs:
            raise DialectError("ENGINE = S3 needs (url[, format]) args")
        url = eargs[0].strip().strip("'")
        fmt = (eargs[1].strip().strip("'") if len(eargs) > 1 else "CSV")
        using = {"CSV": "csv", "PARQUET": "parquet", "JSONEACHROW": "json",
                 "TSV": "csv", "ORC": "orc"}.get(fmt.upper())
        if using is None:
            raise DialectError(f"unsupported S3 source format {fmt!r}")
        if fmt.upper() == "TSV":
            opts.setdefault("sep", "\\t")
        opts["path"] = path_override or url
    else:
        using = "parquet"  # MergeTree family: storage format mapping

    part = ""
    pm = re.search(r"PARTITION\s+BY\s+([A-Za-z_][A-Za-z0-9_]*)\b(?!\s*\()",
                   tail, re.IGNORECASE)
    if pm:
        part = f"\nPARTITIONED BY ({pm.group(1)})"

    opt_sql = ""
    if opts:
        kv = ", ".join(f"{k} '{v}'" for k, v in opts.items())
        opt_sql = f"\nOPTIONS ({kv})"
    ine = "IF NOT EXISTS " if m.group("ine") else ""
    return (
        f"CREATE TABLE {ine}{name} (\n  {cols}\n)\n"
        f"USING {using}{opt_sql}{part}"
    )


# --- gated proof: the reference's own src_customer DDL, verbatim ---

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clickhouse_vs_dbt_spark.catalog import load_table  # noqa: E402

# reference README.md:158-170 character-for-character, with the two
# placeholder substitutions the reference itself instructs the user to
# make (<my_db_name> → database, bucket/folder → their storage path).
REFERENCE_CUSTOMER_DDL = """CREATE TABLE src_customer
        (
                C_CUSTKEY       UInt32,
                C_NAME          String,
                C_ADDRESS       String,
                C_CITY          LowCardinality(String),
                C_NATION        LowCardinality(String),
                C_REGION        LowCardinality(String),
                C_PHONE         String,
                C_MKTSEGMENT    LowCardinality(String)
        )
        ENGINE = S3('https://storage.example.net/bucket/folder/customer.tbl', 'CSV')
        ;"""


def _write_customer_tbl(spark: SparkSession, sf_dir: str) -> str:
    """Derive an 8-column SSB customer .tbl (pipe-separated, headerless)
    deterministically from the customer fixture — the missing SSB
    columns are pure functions of the fixture keys, reproduced
    identically by the oracle SQL."""
    import tempfile

    c = load_table(spark, sf_dir, "customer")
    out = c.select(
        F.col("c_custkey").alias("C_CUSTKEY"),
        F.col("c_name").alias("C_NAME"),
        F.concat(F.lit("ADDR_"), F.col("c_custkey")).alias("C_ADDRESS"),
        F.concat(F.lit("CITY_"), F.col("c_nationkey") % 10).alias("C_CITY"),
        F.concat(F.lit("NATION_"), F.col("c_nationkey")).alias("C_NATION"),
        F.concat(F.lit("REGION_"), F.col("c_nationkey") % 5).alias("C_REGION"),
        F.concat(F.lit("PH_"), F.col("c_custkey") % 100).alias("C_PHONE"),
        F.col("c_mktsegment").alias("C_MKTSEGMENT"),
    )
    path = tempfile.mkdtemp(prefix="ddl_customer_tbl_")
    out.write.mode("overwrite").option("sep", "|").option(
        "header", "false"
    ).csv(path)
    return path


def q_ddl_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: the reference's verbatim src_customer DDL is
    transpiled, executed (external csv datasource table — re-scanned
    per query, the reference's source-table semantics), and queried.
    Only the storage path is overridden, exactly as a migrating user
    would point the DDL at their own bucket."""
    path = _write_customer_tbl(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS src_customer")
    spark.sql(
        transpile_ddl(
            REFERENCE_CUSTOMER_DDL,
            path_override=path,
            options={"sep": "|"},
        )
    )
    return spark.sql(
        """
        SELECT C_MKTSEGMENT,
               COUNT(*) AS n_customers,
               COUNT(DISTINCT C_NATION) AS n_nations,
               COUNT(DISTINCT C_CITY) AS n_cities,
               MIN(C_PHONE) AS min_phone,
               MAX(C_ADDRESS) AS max_address
        FROM src_customer
        GROUP BY C_MKTSEGMENT
        """
    )


O_DDL_SOURCE_ROUNDTRIP = """
SELECT c_mktsegment AS C_MKTSEGMENT,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT 'NATION_' || c_nationkey) AS n_nations,
       COUNT(DISTINCT 'CITY_' || (c_nationkey % 10)) AS n_cities,
       MIN('PH_' || (c_custkey % 100)) AS min_phone,
       MAX('ADDR_' || c_custkey) AS max_address
FROM customer
GROUP BY c_mktsegment
"""

QUERIES = {"ddl_source_roundtrip": q_ddl_source_roundtrip}
ORACLES = {"ddl_source_roundtrip": O_DDL_SOURCE_ROUNDTRIP}

__all__ = ["transpile_ddl", "convert_type", "DialectError"]
