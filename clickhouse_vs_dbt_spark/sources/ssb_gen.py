"""Deterministic SSB-convention lineorder generator + the reference's
golden-value validation style.

The reference validates its pipeline by running SSB Q1.1–Q1.3 against
*published golden constants* on ssb-dbgen data (reference
README.md:413-438: 446031203850 / 98714004603 / 26110729246 at sf=1).
ssb-dbgen itself is not available in this environment, so the driver
fixtures are TPC-H-ish (fractional discount) and those literal
constants are unreachable.  This module closes the faithfulness gap the
same way the reference does — deterministic data, pinned goldens:

* :func:`gen_lineorder` synthesizes a lineorder-shaped relation with
  **SSB conventions**: ``LO_DISCOUNT`` is an integer percent 0–10 (not
  a fraction), ``LO_QUANTITY`` 1–50, money columns are integer cents,
  dates span 1992-01-01 .. 1998-12-31 — the exact column semantics the
  reference's DDL declares (README.md:172-193).
* Generation is **pure Catalyst integer arithmetic** over
  ``spark.range``: every column derives from ``xxhash64(id, seed)``
  (a fixed, version-stable hash), so the relation is bit-identical on
  any executor count, partitioning, or session — the property that
  makes golden values meaningful (ssb-dbgen at a fixed scale factor is
  deterministic for the same reason).
* ``tests/test_ssb_golden.py`` pins the Q1.1/Q1.2/Q1.3 revenue analogs
  (reference query text, README.md:415-436, with the reference's
  integer-percent revenue formula ``sum(LO_EXTENDEDPRICE *
  LO_DISCOUNT)`` — no ÷100) and asserts partitioning-independence.

At 100 TB the same generator shape (range → map-only hash columns) is
how you synthesize benchmark corpora in place: zero shuffle, linear
scan speed, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SSB_EPOCH = "1992-01-01"   # ssb-dbgen date range start (7 years)
SSB_DAYS = 2556            # 1992-01-01 .. 1998-12-31
GOLDEN_ROWS = 60_000       # ~sf0.01 of SSB's 6M-row sf1 lineorder


def _h(seed: int) -> F.Column:
    """Deterministic non-negative 64-bit stream derived from the row id:
    fixed xxhash64 keyed by a per-column seed."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed)))


def gen_lineorder(spark: SparkSession, n_rows: int = GOLDEN_ROWS) -> DataFrame:
    """SSB-convention lineorder analog (the Q1-flight column subset plus
    keys), deterministic and partitioning-independent."""
    return spark.range(n_rows).select(
        F.col("id").alias("LO_ORDERKEY"),
        (_h(1) % 30_000).alias("LO_CUSTKEY"),
        (_h(2) % 20_000).alias("LO_PARTKEY"),
        (_h(3) % 2_000).alias("LO_SUPPKEY"),
        F.date_add(F.lit(SSB_EPOCH).cast("date"), (_h(4) % SSB_DAYS).cast("int"))
        .alias("LO_ORDERDATE"),
        (1 + _h(5) % 50).cast("int").alias("LO_QUANTITY"),
        # integer cents, ~90k..10.09M like dbgen's price domain
        (90_000 + _h(6) % 10_000_000).alias("LO_EXTENDEDPRICE"),
        (_h(7) % 11).cast("int").alias("LO_DISCOUNT"),  # integer percent 0..10
        (_h(8) % 9).cast("int").alias("LO_TAX"),
    )


def q1_1_golden(lo: DataFrame) -> DataFrame:
    """Reference Q1.1 verbatim semantics (README.md:415-417):
    ``sum(LO_EXTENDEDPRICE * LO_DISCOUNT)`` — integer percent, no ÷100 —
    for year 1993, discount 1–3, quantity < 25."""
    return (
        lo.filter(
            (F.year("LO_ORDERDATE") == 1993)
            & F.col("LO_DISCOUNT").between(1, 3)
            & (F.col("LO_QUANTITY") < 25)
        )
        .agg(F.sum(F.col("LO_EXTENDEDPRICE") * F.col("LO_DISCOUNT")).alias("revenue"))
    )


def q1_2_golden(lo: DataFrame) -> DataFrame:
    """Reference Q1.2 (README.md:424-426): toYYYYMM = 199401,
    discount 4–6, quantity 26–35."""
    return (
        lo.filter(
            (F.year("LO_ORDERDATE") * 100 + F.month("LO_ORDERDATE") == 199401)
            & F.col("LO_DISCOUNT").between(4, 6)
            & F.col("LO_QUANTITY").between(26, 35)
        )
        .agg(F.sum(F.col("LO_EXTENDEDPRICE") * F.col("LO_DISCOUNT")).alias("revenue"))
    )


def q1_3_golden(lo: DataFrame) -> DataFrame:
    """Reference Q1.3 (README.md:433-436): ISO week 6 paired with
    *calendar* year 1994 (the reference's subtle conjunction),
    discount 5–7, quantity 26–35."""
    return (
        lo.filter(
            (F.weekofyear("LO_ORDERDATE") == 6)
            & (F.year("LO_ORDERDATE") == 1994)
            & F.col("LO_DISCOUNT").between(5, 7)
            & F.col("LO_QUANTITY").between(26, 35)
        )
        .agg(F.sum(F.col("LO_EXTENDEDPRICE") * F.col("LO_DISCOUNT")).alias("revenue"))
    )
