"""Vector column-expression helpers for ``array<float>`` embedding
columns — dot product, norm, cosine — as Catalyst higher-order
functions (``zip_with`` + ``aggregate``), no UDFs.

Elements are cast to double before arithmetic so both engines (and any
partitioning) see identical IEEE operations; outputs that feed oracle
comparisons are rounded to 6 decimals to absorb the sub-ulp differences
engine-internal summation order could introduce.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: str) -> str:
    return f"transform({col}, x -> CAST(x AS DOUBLE))"


def dot(a: str, b: str) -> Column:
    """Sequential left-fold dot product of two array columns."""
    return F.expr(
        f"aggregate(zip_with({as_double(a)}, {as_double(b)}, (x, y) -> x * y), "
        f"0D, (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
