"""Dump ``explain('formatted')`` for named queries into plans/r17/.

Usage: python tools/dump_r17_plan.py <suffix> q1 [q2 ...]
   -> plans/r17/<query>_<suffix>.txt  (suffix: before | after)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from clickhouse_vs_dbt_spark.session import get_spark

    spark = get_spark("dump_r17_plan")
    qs = e.queries()
    os.makedirs("/root/repo/plans/r17", exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"/root/repo/plans/r17/{name}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
