"""Date scalar functions used by the reference's query flight
(operators D1-D3, SURVEY.md §2.1).

ClickHouse → Spark mapping, each an exact semantic match:

* ``toYear(d)``    → ``F.year``            (reference README.md:417, 435)
* ``toYYYYMM(d)``  → ``year*100 + month``  (reference README.md:426)
* ``toISOWeek(d)`` → ``F.weekofyear``      (reference README.md:435) —
  Spark's weekofyear IS ISO-8601 week-of-year; parity with DuckDB
  ``week()`` verified on year-boundary dates (SURVEY.md §2.1 D3).
  NB the reference's Q1.3 pairs ISO week with *calendar* year — keep
  that pairing, it matters near Dec/Jan boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_year(col: Column | str) -> Column:
    return F.year(col)


def to_yyyymm(col: Column | str) -> Column:
    return (F.year(col) * F.lit(100) + F.month(col)).cast("int")


def to_iso_week(col: Column | str) -> Column:
    return F.weekofyear(col)
