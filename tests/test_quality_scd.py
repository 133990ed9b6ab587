"""dbt-parity surfaces: schema data-quality tests + SCD2 snapshots."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.plans.snapshots import scd2_init, scd2_merge


def test_dq_checks_catch_real_violations(spark, tmp_path, monkeypatch):
    """unique / not_null / accepted_values / relationships each count
    actual violations on a corpus constructed to contain them."""
    import clickhouse_vs_dbt_spark.operators.quality as q

    bad_orders = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=10, o_orderstatus="P"),
            Row(o_orderkey=1, o_custkey=11, o_orderstatus="O"),  # dup key
            Row(o_orderkey=2, o_custkey=None, o_orderstatus="X"),  # bad status
            Row(o_orderkey=None, o_custkey=99, o_orderstatus="F"),  # null key, orphan fk
        ]
    )
    customers = spark.createDataFrame([Row(c_custkey=10), Row(c_custkey=11)])
    tables = {"orders": bad_orders, "customer": customers}
    monkeypatch.setattr(q, "load_table", lambda s, d, name: tables[name])

    checks = [
        q.Check("u", "orders", "unique", "o_orderkey"),
        q.Check("nn", "orders", "not_null", "o_orderkey"),
        q.Check("av", "orders", "accepted_values", "o_orderstatus",
                values=("P", "O", "F")),
    ]
    got = {
        r.check_name: r.n_violations
        for r in q.fused_scalar_checks(spark, "", "orders", checks).collect()
    }
    # unique = excess rows beyond the first per value: key 1 has one
    # excess row (3 non-null keys, 2 distinct)
    assert got == {"u": 1, "nn": 1, "av": 1}

    # null FK is not an orphan (matches dbt); 99 is
    fk = q.fk_violations(
        spark, "",
        q.Check("fk", "orders", "relationships", "o_custkey",
                to_table="customer", to_column="c_custkey"),
    ).collect()[0]
    assert fk.n_violations == 1


def _snap_rows(df):
    return sorted(
        ((r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in df.collect()),
        key=lambda t: (t[0], t[2]),
    )


def test_scd2_three_batches_full_lifecycle(spark):
    """change → second change → delete → re-appear, across 3 merges."""
    b0 = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="x")])
    snap = scd2_init(b0, 0)

    # batch 1: k=1 changes, k=2 deleted, k=3 appears
    b1 = spark.createDataFrame([Row(k=1, v="b"), Row(k=3, v="n")])
    snap = scd2_merge(snap, b1, key=("k",), tracked=("v",), batch_id=1)
    assert _snap_rows(snap) == [
        (1, "a", 0, 1, False),
        (1, "b", 1, None, True),
        (2, "x", 0, None, True),  # delete keeps the row open (dbt default)
        (3, "n", 1, None, True),
    ]

    # batch 2: k=1 changes again → three versions, one current
    b2 = spark.createDataFrame([Row(k=1, v="c"), Row(k=2, v="x"), Row(k=3, v="n")])
    snap = scd2_merge(snap, b2, key=("k",), tracked=("v",), batch_id=2)
    k1 = [r for r in _snap_rows(snap) if r[0] == 1]
    assert k1 == [(1, "a", 0, 1, False), (1, "b", 1, 2, False), (1, "c", 2, None, True)]
    assert sum(1 for r in _snap_rows(snap) if r[4]) == 3  # one current per key


def test_scd2_null_safe_change_detection(spark):
    schema = "k int, v string"
    snap = scd2_init(spark.createDataFrame([(1, None)], schema), 0)
    nxt = spark.createDataFrame([(1, "now-set")], schema)
    snap = scd2_merge(snap, nxt, key=("k",), tracked=("v",), batch_id=1)
    assert _snap_rows(snap) == [(1, None, 0, 1, False), (1, "now-set", 1, None, True)]
    # and NULL == NULL is "unchanged", not a new version
    again = scd2_merge(
        scd2_init(spark.createDataFrame([(1, None)], schema), 0),
        spark.createDataFrame([(1, None)], schema),
        key=("k",),
        tracked=("v",),
        batch_id=1,
    )
    assert _snap_rows(again) == [(1, None, 0, None, True)]


def test_scd2_snapshot_fixture_counts(spark, sf_dir):
    from clickhouse_vs_dbt_spark.catalog import load_table
    from clickhouse_vs_dbt_spark.plans.snapshots import (
        SEGMENT_MOD,
        run_customer_snapshot,
    )

    snap = run_customer_snapshot(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    n_all = customer.count()
    n_moved = customer.filter(F.col("c_custkey") % SEGMENT_MOD == 0).count()
    assert snap.count() == n_all + n_moved
    assert snap.filter(F.col("is_current")).count() == n_all
    assert snap.filter(~F.col("is_current")).count() == n_moved
