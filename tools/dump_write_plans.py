"""Dump the EXECUTED plan of every SQL execution a query triggers —
including write jobs, whose REBALANCE exchanges never appear in
``df.explain`` of the returned SELECT (VERDICT r16 item 8: the r16
write-path plan dumps captured only the returned relation, leaving the
rebalance evidence to A/B timings and file counts).

Runs the named ``queries()`` entries, then reads the session's
SQLAppStatusStore and writes each execution's physicalPlanDescription
(the post-AQE executed plan) to ``plans/r17/<query>_writes.txt``.

Usage: python tools/dump_write_plans.py q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from clickhouse_vs_dbt_spark.session import get_spark

    spark = get_spark("dump_write_plans")
    qs = e.queries()
    os.makedirs("/root/repo/plans/r17", exist_ok=True)
    store = spark._jsparkSession.sharedState().statusStore()
    for name in names:
        start = store.executionsList().size()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        lst = store.executionsList()
        out = f"/root/repo/plans/r17/{name}_writes.txt"
        with open(out, "w") as f:
            for i in range(start, lst.size()):
                ex = lst.apply(i)
                f.write(
                    f"=== execution {i}: {ex.description()}\n"
                )
                f.write(ex.physicalPlanDescription())
                f.write("\n\n")
        print(f"wrote {out} ({lst.size() - start} executions)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
