"""Z-order (Morton) multi-dimensional clustering — the data-layout
technique for pruning on TWO columns at once.

A table sorted by one column prunes row groups only for predicates on
that column; the star's year-partitioned, date-sorted layout
(operators/common.py) is blind to ``o_custkey`` ranges.  Interleaving
the bits of two key columns into one Morton key and range-sorting by it
gives every file a tight min/max envelope in BOTH dimensions, so 2-D
range predicates skip most files — the standard lakehouse ``OPTIMIZE
ZORDER BY`` layout, built here from first principles as pure Catalyst
integer expressions (no UDF, runs at codegen speed).

* :func:`zvalue_expr` — the bit-interleave as one SQL expression:
  ``Σᵢ ((x≫i & 1) ≪ 2i) + ((y≫i & 1) ≪ (2i+1))`` unrolled over
  ``ZBITS`` bit positions.  Exact int64 arithmetic — the identical
  expression text runs on DuckDB, so the whole key computation
  value-checks.
* ``zorder_key_orders`` (gated) — Morton keys for orders over
  (custkey, orderdate-day-number), plus the de-interleaved halves
  recovered FROM the key (``xback``/``yback``) — the query proves
  in-engine that the encoding is bijective on every row.
* :func:`write_zordered` — the layout step: range-repartition +
  sort-within-partitions by the Morton key, so parquet min/max stats
  are tight in both dimensions.  ``tests/test_zorder.py`` measures the
  envelope-volume shrink vs a 1-D sort on the same files.

At 100 TB: compute the key at write time (map-only), cluster once per
partition roll-over; readers need no awareness — 2-D predicates prune
via ordinary row-group stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import register_views

ZBITS = 16  # bits kept per dimension (32-bit Morton key total)


def zvalue_expr(x: str, y: str, bits: int = ZBITS) -> str:
    """Morton interleave of two non-negative int expressions as one SQL
    expression string (valid in Spark SQL and DuckDB alike)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def unzvalue_expr(z: str, even: bool, bits: int = ZBITS) -> str:
    """De-interleave: recover the even- (x) or odd- (y) position bits."""
    off = 0 if even else 1
    terms = [
        f"((({z} >> {2 * i + off}) & 1) << {i})" for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


# day-number keeps the date dimension integral; epoch chosen below any
# fixture date so the value is non-negative
Z_EPOCH = "DATE '1990-01-01'"
_X = f"(o_custkey % {1 << ZBITS})"
_Y_SPARK = f"(datediff(CAST(o_orderdate AS DATE), {Z_EPOCH}) % {1 << ZBITS})"
_Y_DUCK = f"(datediff('day', {Z_EPOCH}, CAST(o_orderdate AS DATE)) % {1 << ZBITS})"


def _zorder_sql(dialect: str) -> str:
    y = _Y_SPARK if dialect == "spark" else _Y_DUCK
    z = zvalue_expr(f"CAST({_X} AS BIGINT)", f"CAST({y} AS BIGINT)")
    return f"""
WITH keyed AS (
  SELECT o_orderkey,
         CAST({_X} AS BIGINT) AS xdim,
         CAST({y} AS BIGINT) AS ydim,
         CAST({z} AS BIGINT) AS zval
  FROM orders)
SELECT o_orderkey, xdim, ydim, zval,
       CAST({unzvalue_expr('zval', True)} AS BIGINT) AS xback,
       CAST({unzvalue_expr('zval', False)} AS BIGINT) AS yback
FROM keyed ORDER BY o_orderkey
"""


def q_zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys + in-query de-interleave proof (see module doc)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_zorder_sql("spark"))


def hilbert_expr(x: str, y: str, bits: int = 32) -> str:
    """2-D Hilbert-curve index (VERDICT r10 item 6) as one Spark SQL
    expression: the classic per-bit fold (Wikipedia ``xy2d``) over the
    levels high→low with an (x, y, d) struct accumulator — quadrant
    ``(3·rx) XOR ry`` appended as a 2-bit field (disjoint fields, so
    ``|`` assembles d with no overflow semantics), then the
    conditional reflect+swap rotation.  Pure Catalyst: one
    ``aggregate`` HOF, codegen'd, no UDF — the mortonEncode precedent
    one curve up.  ClickHouse's convention (doc example
    ``hilbertEncode(3, 4) = 31``) is this classic fold with the
    ARGUMENT ORDER swapped, which the dialect mapping applies."""
    rx = f"((__h.x >> __i) & 1)"
    ry = f"((__h.y >> __i) & 1)"
    s1 = "shiftleft(CAST(1 AS BIGINT), __i)"
    return (
        f"aggregate(sequence({bits - 1}, 0, -1), "
        f"named_struct('x', CAST({x} AS BIGINT), "
        f"'y', CAST({y} AS BIGINT), 'd', CAST(0 AS BIGINT)), "
        f"(__h, __i) -> named_struct("
        f"'x', CASE WHEN {ry} = 1 THEN __h.x "
        f"WHEN {rx} = 1 THEN {s1} - 1 - __h.y ELSE __h.y END, "
        f"'y', CASE WHEN {ry} = 1 THEN __h.y "
        f"WHEN {rx} = 1 THEN {s1} - 1 - __h.x ELSE __h.x END, "
        f"'d', __h.d | shiftleft((3 * {rx}) ^ {ry}, 2 * __i)), "
        "__h -> __h.d)"
    )


def unhilbert_expr(d: str, first: bool, bits: int = 32) -> str:
    """Hilbert inverse (``d2xy``): recover one coordinate of the
    2-D point — levels low→high, rotate-then-add fold.  ``first``
    selects the classic x output; bit extraction reads the CODE (not
    fold state) via shiftrightunsigned, so sign-bit codes decode
    correctly."""
    rx = f"((shiftrightunsigned({d}, 2 * __i + 1)) & 1)"
    ry = f"(((shiftrightunsigned({d}, 2 * __i)) & 1) ^ {rx})"
    s1 = "shiftleft(CAST(1 AS BIGINT), __i)"
    return (
        f"aggregate(sequence(0, {bits - 1}), "
        "named_struct('x', CAST(0 AS BIGINT), 'y', CAST(0 AS BIGINT)), "
        f"(__h, __i) -> named_struct("
        f"'x', (CASE WHEN {ry} = 1 THEN __h.x "
        f"WHEN {rx} = 1 THEN {s1} - 1 - __h.y ELSE __h.y END) "
        f"+ shiftleft({rx}, __i), "
        f"'y', (CASE WHEN {ry} = 1 THEN __h.y "
        f"WHEN {rx} = 1 THEN {s1} - 1 - __h.x ELSE __h.x END) "
        f"+ shiftleft({ry}, __i)), "
        f"__h -> __h.{'x' if first else 'y'})"
    )


def write_zordered(
    df: DataFrame, zcol, path: str, n_files: int = 8
) -> None:
    """Cluster ``df`` into ``n_files`` files range-sorted by the Morton
    key: each output file covers a contiguous z-range, i.e. a tight
    rectangle in (x, y) — the layout that makes 2-D predicates prune."""
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


QUERIES = {"zorder_key_orders": q_zorder_key_orders}
ORACLES = {"zorder_key_orders": _zorder_sql("duckdb")}
