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


def year_range(col: Column | str, year: int) -> Column:
    """Scan-pushable twin of ``to_year(col) == year``.

    ``year(d) = Y`` is a function predicate — Parquet cannot use it to
    skip row groups (and, on a date-partitioned 100 TB table, cannot
    prune partitions).  The equivalent half-open raw-range CAN be pushed
    (shows up under ``PushedFilters`` in ``.explain``).  Conjoin it with
    the semantic predicate: same rows, pruned scan.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c >= F.lit(f"{year}-01-01")) & (c < F.lit(f"{year + 1}-01-01"))


def yyyymm_range(col: Column | str, yyyymm: int) -> Column:
    """Scan-pushable twin of ``to_yyyymm(col) == yyyymm`` (see
    :func:`year_range`)."""
    y, m = divmod(yyyymm, 100)
    ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
    c = F.col(col) if isinstance(col, str) else col
    return (c >= F.lit(f"{y}-{m:02d}-01")) & (c < F.lit(f"{ny}-{nm:02d}-01"))
