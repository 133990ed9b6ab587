"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding).  Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def value_repr(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(value_repr(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "|".join(value_repr(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from clickhouse_vs_dbt_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in os_:
            print(f"{name:32s} rows={len(srows):7d} (rows-only, no oracle) spark={t1-t0:.1f}s")
            if len(srows) == 0:
                failures.append((name, "zero rows (rows-only check)"))
            continue
        try:
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as ex:
            failures.append((name, f"oracle error: {ex}"))
            print(f"{name:32s} ORACLE ERROR: {ex}")
            continue
        t2 = time.time()
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        print(
            f"{name:32s} {status}  rows {len(srows)}/{len(orows)}"
            f" cols={'ok' if ok_cols else f'{sorted(scols)}!={sorted(ocols)}'}"
            f" hash={'ok' if ok_hash else f'{sh}!={oh}'}"
            f" spark={t1-t0:.1f}s duck={t2-t1:.1f}s"
        )
        if status != "OK":
            failures.append((name, f"rows {len(srows)}/{len(orows)} cols_ok={ok_cols} hash_ok={ok_hash}"))
    print()
    if failures:
        print("FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        return 1
    print("all checked queries OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
