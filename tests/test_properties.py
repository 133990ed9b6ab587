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
