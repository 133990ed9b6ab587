"""Reference-style golden-value validation (reference README.md:413-438):
deterministic SSB-convention data, three pinned Q1 revenue constants,
and the partitioning-independence that makes goldens meaningful.

The pinned values play the role of the reference's published constants
(446031203850 / 98714004603 / 26110729246 at ssb-dbgen sf=1): they were
computed once from the seeded generator and must never drift.  Q1.1's
golden exceeds 2^32 — the same 64-bit-aggregation proof the reference's
own golden carries (SURVEY.md §1.2).
"""

from __future__ import annotations

from clickhouse_vs_dbt_spark.sources import ssb_gen as g

GOLDENS = {
    "q1_1": 10_856_320_819,  # > 2^32: int64 aggregation is load-bearing
    "q1_2": 1_041_471_160,
    "q1_3": 388_886_288,
}


def test_q1_flight_goldens(spark):
    lo = g.gen_lineorder(spark)
    assert g.q1_1_golden(lo).collect()[0].revenue == GOLDENS["q1_1"]
    assert g.q1_2_golden(lo).collect()[0].revenue == GOLDENS["q1_2"]
    assert g.q1_3_golden(lo).collect()[0].revenue == GOLDENS["q1_3"]


def test_goldens_partitioning_independent(spark):
    """Same constants at 1 partition and 32 — the generator and the
    integer aggregation are both order- and partitioning-free."""
    for parts in (1, 32):
        lo = g.gen_lineorder(spark).repartition(parts)
        assert g.q1_1_golden(lo).collect()[0].revenue == GOLDENS["q1_1"]


def test_ssb_conventions(spark):
    """The generated relation carries SSB semantics: integer-percent
    discount 0..10, quantity 1..50, integer money, 1992-1998 dates."""
    from pyspark.sql import functions as F

    row = (
        g.gen_lineorder(spark, 20_000)
        .agg(
            F.min("LO_DISCOUNT").alias("dmin"),
            F.max("LO_DISCOUNT").alias("dmax"),
            F.min("LO_QUANTITY").alias("qmin"),
            F.max("LO_QUANTITY").alias("qmax"),
            F.min(F.year("LO_ORDERDATE")).alias("ymin"),
            F.max(F.year("LO_ORDERDATE")).alias("ymax"),
        )
        .collect()[0]
    )
    assert (row.dmin, row.dmax) == (0, 10)
    assert (row.qmin, row.qmax) == (1, 50)
    assert (row.ymin, row.ymax) == (1992, 1998)
    dtypes = dict(g.gen_lineorder(spark, 10).dtypes)
    assert dtypes["LO_EXTENDEDPRICE"] == "bigint"
    assert dtypes["LO_DISCOUNT"] == "int"
