"""Property-based checks (hypothesis) for load-bearing primitives.

Few examples, deterministic seeds — each example runs Spark jobs, so
these trade example count for breadth of structure (duplicates, ties,
boundary-adjacent timestamps, negative/zero values).
"""

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators.common import dsum
from clickhouse_vs_dbt_spark.operators.timeseries import range_self_join

WIDTH = 1000  # µs window for the property-scale range join

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # user_id (collisions likely)
        st.integers(min_value=0, max_value=5000),  # ts_us (boundary-dense)
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=events_strategy)
def test_range_self_join_matches_bruteforce(spark, evs):
    rows = [(i, u, ts) for i, (u, ts) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long"
    ) if rows else spark.createDataFrame([], "event_id long, user_id long, ts_us long")
    got = sorted((r.id_a, r.id_b) for r in range_self_join(df, WIDTH).collect())
    want = sorted(
        (a[0], b[0])
        for a in rows
        for b in rows
        if a[1] == b[1] and a[0] < b[0] and abs(a[2] - b[2]) <= WIDTH
    )
    assert got == want


money_strategy = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=money_strategy)
def test_dsum_is_exact_decimal_sum(spark, vals):
    """dsum must equal exact DECIMAL(18,6) accumulation (same quantize
    rule), independent of partitioning/order."""
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(7)
    got = df.agg(dsum(F.col("v")).alias("s")).first()["s"]
    q = Decimal("0.000001")
    want = float(
        sum(Decimal(repr(v)).quantize(q, rounding=ROUND_HALF_UP) for v in vals)
    )
    assert got == want


intervals_strategy = st.lists(
    st.integers(min_value=0, max_value=2000),  # start times, overlap-dense
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(starts=intervals_strategy)
def test_interval_union_matches_bruteforce(spark, starts):
    """The prev-max-end sweep must equal the brute-force union length of
    [st, st+W) intervals for any overlap structure."""
    import datetime

    from clickhouse_vs_dbt_spark.operators import aggfns

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(microseconds=s), 1, "a", 0.0)
        for i, s in enumerate(starts)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).createOrReplaceTempView("events")
    got = spark.sql(aggfns._interval_length_sql("spark")).collect()[0].covered_us

    # reference implementation: classic sorted interval merge
    ivs = sorted((s, s + aggfns.INTERVAL_US) for s in starts)
    total, cur_lo, cur_hi = 0, None, None
    for lo, hi in ivs:
        if cur_hi is None or lo > cur_hi:
            if cur_hi is not None:
                total += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
        else:
            cur_hi = max(cur_hi, hi)
    total += cur_hi - cur_lo
    assert got == total


@settings(max_examples=25, deadline=None)
@given(
    x=st.integers(min_value=0, max_value=(1 << 16) - 1),
    y=st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_morton_interleave_bijective(x, y):
    """zvalue/unzvalue expression algebra mirrored in Python: interleave
    then de-interleave is the identity for all 16-bit inputs."""
    from clickhouse_vs_dbt_spark.operators import zorder

    z = 0
    for i in range(zorder.ZBITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    xb = sum((((z >> (2 * i)) & 1) << i) for i in range(zorder.ZBITS))
    yb = sum((((z >> (2 * i + 1)) & 1) << i) for i in range(zorder.ZBITS))
    assert (xb, yb) == (x, y)
