"""Checks for the engine-portable HyperLogLog."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from clickhouse_vs_dbt_spark.operators import hll


def _md5p(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hll_matches_python_reference_exactly(spark, sf_dir):
    rows = hll.q_hll_distinct_users(spark, sf_dir).collect()
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "user_id")
        .collect()
    )
    regs = defaultdict(dict)
    exact = defaultdict(set)
    for r in events:
        hv = _md5p(str(r.user_id))
        b, w = hv % hll.M, hv // hll.M
        rank = 53 if w == 0 else 53 - w.bit_length()
        regs[r.event_type][b] = max(regs[r.event_type].get(b, 0), rank)
        exact[r.event_type].add(r.user_id)
    assert len(rows) == len(regs)
    for r in rows:
        reg = regs[r.event_type]
        s = sum(1 << (53 - rank) for rank in reg.values())
        denom = s + (hll.M - len(reg)) * (1 << 53)
        est = hll._ALPHA * hll.M * hll.M * float(1 << 53) / denom
        if est <= 2.5 * hll.M and len(reg) < hll.M:
            est = hll.M * math.log(hll.M / (hll.M - len(reg)))
        assert r.n_exact == len(exact[r.event_type])
        assert math.isclose(r.hll_estimate, round(est, 3), abs_tol=2e-3)
        # p=8 → typical error ~6.5%; generous bound that still proves
        # the estimate tracks the exact count
        assert abs(r.rel_err) < 0.25
        assert math.isclose(
            r.rel_err, round((est - r.n_exact) / r.n_exact, 6), abs_tol=2e-6
        )


def test_hll_merge_is_lossless(spark, sf_dir):
    from clickhouse_vs_dbt_spark.operators import hll

    r = hll.q_hll_merge_global(spark, sf_dir).first()
    # MAX-merge of per-type registers must equal the direct global sketch
    assert r.merge_is_lossless
    # p=8 → ~6.5% standard error; allow 4 sigma
    assert abs(r.merged_estimate - r.n_exact) / r.n_exact < 0.26
