"""Text column-expression helpers (whitespace tokens, word shingles,
portable rolling hash).

Everything here is a Catalyst expression (JVM-side, codegen) — no Python
UDFs — so text pipelines stay on the fast path at 100 TB.  The rolling
hash is a polynomial mod-prime hash expressible identically in DuckDB
SQL, which keeps fingerprinting oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(F.col(col)), r"\s+")


def word_shingles(tokens_expr: str, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces.

    Short docs (< n tokens) produce an empty set — the ``greatest`` guard
    keeps ``sequence`` from a negative bound.
    """
    return F.expr(
        f"CASE WHEN size({tokens_expr}) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size({tokens_expr})-{n}), "
        f"i -> concat_ws(' ', slice({tokens_expr}, i+1, {n})))) END"
    )


def rolling_hash(col: str = "text") -> Column:
    """Polynomial rolling hash over characters:
    ``h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) % 1e9+7)``.

    Deterministic, engine-portable (DuckDB twin in sql_rolling_hash),
    and codegen'd via the ``aggregate`` higher-order function.
    """
    return F.expr(
        f"aggregate(split({col}, ''), 0L, "
        f"(acc, c) -> (acc * {FP_BASE} + ascii(c)) % {FP_MOD})"
    )


def sql_rolling_hash(col: str = "text") -> str:
    """DuckDB twin of :func:`rolling_hash`.

    DuckDB's ``string_split(s, '')`` yields the same char list as
    Spark's ``split(s, '')``; ``list_reduce`` seeds with the first
    element, so prepend a zero sentinel to match Spark's explicit seed
    (ascii('0'||...) of the first char must fold like Spark's).
    """
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({col}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})"
    )
