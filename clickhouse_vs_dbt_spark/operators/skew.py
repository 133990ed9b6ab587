"""Skew-mitigation utilities: salted equi-join.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime, but it cannot split a single hot KEY whose hash bucket
overloads one task in a shuffle join.  The classic fix is salting:

* large side — extend the join key with a deterministic salt in
  [0, R): ``pmod(xxhash64(tiebreak_col), R)`` (a hash of a high-
  cardinality column, NOT rand(), so retries/speculative tasks and
  the correctness oracle see identical rows);
* small side — replicate each row R times, one per salt value;
* join on (key, salt): the hot key's rows now spread over R tasks.

Semantically identical to the plain join (every large-side row still
meets its key's small-side rows exactly once) — which is what makes it
oracle-checkable here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

SALT_BUCKETS = 8


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    tiebreak: Column,
    buckets: int = SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on``, salted ``buckets``
    ways using ``tiebreak`` (any roughly-uniform column of the large
    side) to spread each key's rows."""
    salted_large = large.withColumn("_salt", F.pmod(F.xxhash64(tiebreak), F.lit(buckets)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_large.join(salted_small, [on, "_salt"], how).drop("_salt")


def q_skew_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its user's total event count via a
    salted join (counts = small side, replicated ×8; events = large
    side, salted by hash(event_id)).  Identical to the plain join —
    the oracle is the plain join."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_total_events"))
    return (
        salted_join(e, counts, on="user_id", tiebreak=F.col("event_id"))
        .select("event_id", "user_id", "event_type", "user_total_events")
        .orderBy("event_id")
    )


O_SKEW_SALTED = """
WITH counts AS (SELECT user_id, COUNT(*) AS user_total_events
                FROM events GROUP BY user_id)
SELECT e.event_id, e.user_id, e.event_type, c.user_total_events
FROM events e JOIN counts c USING (user_id)
ORDER BY e.event_id
"""

QUERIES = {"skew_salted_enrich": q_skew_salted_enrich}
ORACLES = {"skew_salted_enrich": O_SKEW_SALTED}
