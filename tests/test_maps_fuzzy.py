"""Semantic checks for the map-vocabulary and fuzzy-match suites."""

from __future__ import annotations

from collections import Counter, defaultdict

from clickhouse_vs_dbt_spark.operators import fuzzy, maps


def test_map_suite_totals_consistent(spark, sf_dir):
    rows = maps.q_map_functions_suite(spark, sf_dir).collect()
    by_cust = defaultdict(dict)
    for r in rows:
        by_cust[r.o_custkey][r.status] = r
    orders = Counter(
        (r.o_custkey, r.o_orderstatus)
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    )
    truth_tot = Counter()
    truth_statuses = defaultdict(set)
    for (ck, st), n in orders.items():
        truth_tot[ck] += n
        truth_statuses[ck].add(st)
    for ck, st_rows in by_cust.items():
        assert "ALL" in st_rows
        assert st_rows["ALL"].n == truth_tot[ck]
        assert st_rows["ALL"].n_statuses == len(truth_statuses[ck])
        for st, r in st_rows.items():
            if st != "ALL":
                assert orders[(ck, st)] == r.n >= 2
        # every status with >=2 orders is present
        for (ck2, st), n in orders.items():
            if ck2 == ck and n >= 2:
                assert st in st_rows


def test_dict_lookup_broadcasts(spark, sf_dir):
    df = maps.q_dict_lookup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    for r in rows:
        assert r.seg_priority == maps.SEG_PRIORITY[r.segment]
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.n_customers for r in rows) == n_cust


def test_fuzzy_pairs_symmetric_and_thresholded(spark, sf_dir):
    rows = fuzzy.q_fuzzy_part_pairs(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.key_a < r.key_b
        assert 0 <= r.dist <= fuzzy.MAX_DIST
        assert (r.key_a, r.key_b) not in seen
        seen.add((r.key_a, r.key_b))
        if r.dist == 0:
            assert r.name_a == r.name_b
        else:
            assert r.name_a != r.name_b


def test_fuzzy_broadcast_gate(spark, sf_dir):
    """ADVICE r11: the PassJoin probe-leg broadcast hint is gated on
    the measured distinct-name size vs autoBroadcastJoinThreshold —
    an oversized dictionary degrades to the shuffle join with the
    SAME result set instead of OOMing on an unconditional hint."""
    base = {
        (r.key_a, r.key_b, r.dist)
        for r in fuzzy.q_fuzzy_part_pairs(spark, sf_dir).collect()
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert fuzzy._broadcast_threshold_bytes(spark) == 0
        gated = {
            (r.key_a, r.key_b, r.dist)
            for r in fuzzy.q_fuzzy_part_pairs(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert gated == base
    # unit parse: Spark-style suffixed values and plain bytes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
    try:
        assert fuzzy._broadcast_threshold_bytes(spark) == 10 * 1024**2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
