"""Date functions D1-D3 (reference README.md:417, 426, 435).

ISO-week boundary cases are the likeliest semantic divergence between
engines (SURVEY.md §7 risk list) — pin them.
"""

from __future__ import annotations

import datetime

from clickhouse_vs_dbt_spark.functions.datefns import to_iso_week, to_year, to_yyyymm

BOUNDARIES = {
    "1994-02-07": 6,  # the reference's Q1.3 week (README.md:435)
    "1993-01-01": 53,  # belongs to ISO year 1992
    "1994-01-01": 52,  # belongs to ISO year 1993
    "1995-01-01": 52,
    "1996-01-01": 1,
    "1992-12-28": 53,
}


def test_iso_week_boundaries(spark):
    df = spark.createDataFrame(
        [(datetime.date.fromisoformat(d),) for d in BOUNDARIES], "d date"
    )
    got = {r.d.isoformat(): r.w for r in df.select("d", to_iso_week("d").alias("w")).collect()}
    assert got == BOUNDARIES


def test_year_and_yyyymm(spark):
    df = spark.createDataFrame([(datetime.date(1994, 1, 31),)], "d date")
    r = df.select(
        to_year("d").alias("y"), to_yyyymm("d").alias("ym")
    ).collect()[0]
    assert (r.y, r.ym) == (1994, 199401)
