"""ClickHouse analytics-function parity: funnel, retention, sequence
match, groupArray, bit aggregates, and the ``-If`` combinator family.

The reference delegates execution to ClickHouse (SURVEY.md §2 intro),
whose signature analytics surface — ``windowFunnel``, ``retention``,
``sequenceMatch``, ``groupArray``/``arrayJoin``, ``groupBitAnd/Or/Xor``,
``countIf``/``sumIf``/``avgIf`` — a drop-in replacement engine must
cover.  Each operator here is the Spark-native reformulation over the
``events`` fixture, value-checked against a DuckDB oracle.

Scale shape: every operator is one or two keyed shuffles on ``user_id``
(or ``event_type``), with map-side partial aggregation; the multi-stage
funnel/sequence operators reuse the same user_id partitioning across
stages, so the second aggregation is a cheap co-partitioned join, not a
second full shuffle of the fact table.  Nothing here collects to the
driver or leaves whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.operators.common import davg, dsum, sql_davg, sql_dsum

FUNNEL_WINDOW_HOURS = 24


def q_events_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(86400)(ts, view, click, purchase)``
    analog: per user, the deepest step of view → click → purchase
    reached inside 24 h of the user's *first view* (adaptation: the
    chain is anchored at the first step-1 event; the anchored variant
    is the deterministic, oracle-checkable form).  Output: funnel
    level × user count, including level 0 (no view at all).

    Spark shape — the same shape ClickHouse itself uses: one keyed
    shuffle, then a per-user SEQUENCE FOLD.  Events collect per user
    as a sorted (ts, type) array and a codegen'd ``aggregate()`` HOF
    runs the three-step automaton over it — (t1, t2, t3) state
    updated per event, all JVM-side, no Python.  The anchored
    automaton only ever inspects the three chain types, so the fold
    input is PRE-FILTERED to view/click/purchase before the
    ``collect_list`` — the per-user arrays and the keyed shuffle
    carry only chain events (~60% of the stream in the fixture mix;
    the saving compounds at 100×).  Level-0 users (no chain events at
    all) are recovered from the distinct-user relation — a keyed,
    metadata-narrow left join that shares the user_id partitioning.
    (The strict_order variant below deliberately keeps the full
    stream: there, interleaving non-chain events ABORT the attempt,
    so they are semantic input.)  Differentially tested: the DuckDB
    oracle keeps the per-step join spelling, so fold ≡ joins is
    checked by the gate hash."""
    win_us = FUNNEL_WINDOW_HOURS * 3600 * 1_000_000
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    chain = e.filter(F.col("event_type").isin("view", "click", "purchase"))
    per_user = chain.groupBy("user_id").agg(
        F.expr(
            "sort_array(collect_list(struct(unix_micros(ts) AS ts, "
            "event_type AS et)))"
        ).alias("evs")
    )
    null_state = (
        "named_struct('t1', CAST(NULL AS BIGINT), 't2', "
        "CAST(NULL AS BIGINT), 't3', CAST(NULL AS BIGINT))"
    )
    fold = f"""
    aggregate(evs, {null_state},
      (acc, e) -> CASE
        WHEN e.et = 'view' AND acc.t1 IS NULL
          THEN named_struct('t1', e.ts, 't2', acc.t2, 't3', acc.t3)
        WHEN e.et = 'click' AND acc.t1 IS NOT NULL AND acc.t2 IS NULL
             AND e.ts > acc.t1 AND e.ts <= acc.t1 + {win_us}
          THEN named_struct('t1', acc.t1, 't2', e.ts, 't3', acc.t3)
        WHEN e.et = 'purchase' AND acc.t2 IS NOT NULL AND acc.t3 IS NULL
             AND e.ts > acc.t2 AND e.ts <= acc.t1 + {win_us}
          THEN named_struct('t1', acc.t1, 't2', acc.t2, 't3', e.ts)
        ELSE acc END,
      acc -> CASE WHEN acc.t3 IS NOT NULL THEN 3
                  WHEN acc.t2 IS NOT NULL THEN 2
                  WHEN acc.t1 IS NOT NULL THEN 1
                  ELSE 0 END)
    """
    chain_levels = per_user.select(
        "user_id", F.expr(fold).alias("level")
    )
    return (
        users.join(chain_levels, "user_id", "left")
        .select(F.coalesce("level", F.lit(0)).alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("level")
    )


O_FUNNEL_WINDOW = f"""
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2, MIN(t1.t1) AS t1
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
    AND e.ts <= t1.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
    AND e.ts <= t2.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id),
users AS (SELECT DISTINCT user_id FROM events),
lv AS (
  SELECT CASE WHEN t3.t3 IS NOT NULL THEN 3
              WHEN t2.t2 IS NOT NULL THEN 2
              WHEN t1.t1 IS NOT NULL THEN 1
              ELSE 0 END AS level
  FROM users
  LEFT JOIN t1 ON users.user_id = t1.user_id
  LEFT JOIN t2 ON users.user_id = t2.user_id
  LEFT JOIN t3 ON users.user_id = t3.user_id)
SELECT level, COUNT(*) AS n_users FROM lv GROUP BY level ORDER BY level
"""


RETENTION_OFFSETS = (0, 1, 7)


def q_events_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(day0, day1, day7)`` analog as a cohort
    matrix: cohort = the user's first-seen date; for each cohort date,
    how many of its users were active again exactly 0/1/7 days later.

    Two aggregations: per-user first date (keyed on user), then the
    (cohort, offset) rollup over the distinct user-day relation — the
    user-day dedup and the first-date aggregate share the user_id
    shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    cohort = days.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    return (
        days.join(cohort, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_date"))
        .filter(F.col("day_offset").isin(*RETENTION_OFFSETS))
        .groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_date", "day_offset")
    )


O_RETENTION_MATRIX = f"""
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
cohort AS (SELECT user_id, MIN(d) AS cohort_date FROM days GROUP BY user_id)
SELECT cohort.cohort_date, date_diff('day', cohort.cohort_date, days.d) AS day_offset,
       COUNT(*) AS n_users
FROM days JOIN cohort ON days.user_id = cohort.user_id
WHERE date_diff('day', cohort.cohort_date, days.d) IN {RETENTION_OFFSETS}
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)')`` /
    ``'(?1).*(?2).*(?3)'`` analog, per user: does a view precede a
    purchase (``has_vp``), and does a view precede a click that
    precedes a purchase (``has_vcp``)?  The two-step flag is a pure
    conditional aggregate (min view < max purchase); the three-step
    flag anchors at the first view, takes the first click after it,
    and asks for any later purchase — same two-stage shape as the
    funnel but unbounded in time.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_purchase"),
    )
    first_click = (
        e.filter(F.col("event_type") == "click")
        .join(base.select("user_id", "first_view"), "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click_after"))
    )
    return (
        base.join(first_click, "user_id", "left")
        .select(
            "user_id",
            F.coalesce(
                (
                    F.col("first_view").isNotNull()
                    & (F.col("last_purchase") > F.col("first_view"))
                ).cast("int"),
                F.lit(0),
            ).alias("has_vp"),
            F.coalesce(
                (
                    F.col("first_click_after").isNotNull()
                    & (F.col("last_purchase") > F.col("first_click_after"))
                ).cast("int"),
                F.lit(0),
            ).alias("has_vcp"),
        )
        .orderBy("user_id")
    )


O_SEQUENCE_MATCH = """
WITH base AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
  FROM events GROUP BY user_id),
fc AS (
  SELECT e.user_id, MIN(e.ts) AS first_click_after
  FROM events e JOIN base ON e.user_id = base.user_id
  WHERE e.event_type = 'click' AND e.ts > base.first_view
  GROUP BY e.user_id)
SELECT base.user_id,
       COALESCE(CAST(base.first_view IS NOT NULL
            AND base.last_purchase > base.first_view AS INTEGER), 0) AS has_vp,
       COALESCE(CAST(fc.first_click_after IS NOT NULL
            AND base.last_purchase > fc.first_click_after AS INTEGER), 0) AS has_vcp
FROM base LEFT JOIN fc ON base.user_id = fc.user_id
ORDER BY base.user_id
"""


GROUP_ARRAY_K = 5


def q_events_group_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArray`` + ``arraySlice`` +
    ``arrayStringConcat`` analog: per user, the first 5 event types in
    time order, emitted as one comma-joined string (engine-portable —
    no array column reaches the gate).  Order ties broken by event_id,
    so the array is deterministic under any partitioning.

    ``sort_array(collect_list(struct(...)))`` is the Spark idiom for an
    order-preserving groupArray: collect is partial-aggregated
    map-side, the sort is per-group over small arrays — no Window, no
    per-partition global sort.
    """
    e = load_table(spark, sf_dir, "events")
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.concat_ws(
                ",",
                F.slice(F.transform(arr, lambda x: x["event_type"]), 1, GROUP_ARRAY_K),
            ).alias("first_types"),
        )
        .orderBy("user_id")
    )


O_GROUP_ARRAY = f"""
SELECT user_id, COUNT(*) AS n_events,
       array_to_string(
         list_slice(list(event_type ORDER BY ts, event_id), 1, {GROUP_ARRAY_K}),
         ',') AS first_types
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_events_bit_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitAnd/Or/Xor`` analog over the JSON payload
    key ``props.k``, grouped by event type.  Bitwise aggregates are
    associative and commutative, so partial aggregation is exact under
    any partitioning — the same property the DECIMAL sum pattern buys
    for money columns.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("bit_and(k)").alias("k_and"),
            F.expr("bit_or(k)").alias("k_or"),
            F.expr("bit_xor(k)").alias("k_xor"),
        )
        .orderBy("event_type")
    )


O_BIT_AGGREGATES = """
SELECT event_type, COUNT(*) AS n_events,
       bit_and(k) AS k_and, bit_or(k) AS k_or, bit_xor(k) AS k_xor
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type ORDER BY event_type
"""


COND_THRESHOLD = 10.0


def q_events_cond_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``-If`` combinator family — ``countIf``, ``sumIf``,
    ``avgIf``, ``minIf``, ``maxIf``, ``uniqExactIf`` — as conditional
    aggregates over one scan.  All six run in a single grouped
    aggregation (one shuffle), exactly how the combinators fuse in
    ClickHouse.
    """
    e = load_table(spark, sf_dir, "events")
    hot = F.col("value") > COND_THRESHOLD
    hv = F.when(hot, F.col("value"))
    return (
        e.groupBy("event_type")
        .agg(
            F.count_if(hot).alias("n_hot"),
            dsum(F.when(hot, F.col("value")).otherwise(F.lit(0.0))).alias("sum_hot"),
            davg(hv).alias("avg_hot"),
            F.min(hv).alias("min_hot"),
            F.max(hv).alias("max_hot"),
            F.count_distinct(F.when(hot, F.col("user_id"))).alias("uniq_hot_users"),
        )
        .orderBy("event_type")
    )


O_COND_AGG_SUITE = f"""
SELECT event_type,
       COUNT(CASE WHEN value > {COND_THRESHOLD} THEN 1 END) AS n_hot,
       {sql_dsum(f'CASE WHEN value > {COND_THRESHOLD} THEN value ELSE 0.0 END')} AS sum_hot,
       {sql_davg(f'CASE WHEN value > {COND_THRESHOLD} THEN value END')} AS avg_hot,
       MIN(CASE WHEN value > {COND_THRESHOLD} THEN value END) AS min_hot,
       MAX(CASE WHEN value > {COND_THRESHOLD} THEN value END) AS max_hot,
       COUNT(DISTINCT CASE WHEN value > {COND_THRESHOLD} THEN user_id END) AS uniq_hot_users
FROM events GROUP BY event_type ORDER BY event_type
"""


TOPK_K = 3


def q_events_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topK(k)(x)`` parity via Spark's ``approx_top_k``
    frequent-items sketch, exploded to harness-friendly rows.

    Value-check argument: the sketch is *exact* whenever the number of
    distinct tracked items fits its internal capacity (default 10⁴ —
    event_type has 5), so the oracle is the exact top-k by count with a
    deterministic tiebreak; the fixture has no boundary tie.  At real
    cardinalities the same expression degrades gracefully to the
    approximate heavy-hitters answer, which is the reason topK exists."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.agg(F.expr(f"approx_top_k(event_type, {TOPK_K})").alias("tk"))
        .select(F.explode("tk").alias("t"))
        .select(
            F.col("t.item").alias("event_type"),
            F.col("t.count").cast("long").alias("n_events"),
        )
        .orderBy(F.col("n_events").desc(), "event_type")
    )


O_TOPK_SKETCH = f"""
SELECT event_type, COUNT(*) AS n_events
FROM events GROUP BY event_type
ORDER BY n_events DESC, event_type LIMIT {TOPK_K}
"""


def q_events_group_uniq_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupUniqArray`` analog: per user, the distinct
    event types as one sorted comma-joined string (set semantics —
    order-free by construction), plus the distinct count.
    ``collect_set`` partial-aggregates map-side; the sort makes the
    rendering deterministic."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_set("event_type"))
            ).alias("uniq_types"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy("user_id")
    )


O_GROUP_UNIQ_ARRAY = """
SELECT user_id,
       list_aggregate(list_sort(list_distinct(list(event_type))), 'string_agg', ',')
         AS uniq_types,
       COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_events_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1)(?2)')`` analog: per user, the
    number of NON-OVERLAPPING view→purchase matches (greedy pairing in
    time order), plus the raw view/purchase counts.

    The greedy matcher is inherently sequential per user, but the
    per-user history is bounded — so it runs as an order-preserving
    ``collect_list`` (map-side partial, one keyed shuffle) and a single
    integer-state fold over the sorted codes: state = pairs·2³² +
    unmatched_views.  The DuckDB oracle uses the INDEPENDENT closed
    form (parenthesis matching: pairs = purchases − max prefix excess
    of purchases over views), so the fold is differentially proven
    rather than replayed.  The 2³² radix keeps the two counters
    alias-free for up to 2³²−1 unmatched views and 2³¹ pairs per user —
    beyond any physical per-user event history (a user emitting one
    event per second for a century reaches ~3.2·10⁹ < 2³²).  At 100 TB
    this is the same shape as groupArray: per-user arrays stay bounded,
    nothing global."""
    e = load_table(spark, sf_dir, "events")
    radix = 1 << 32
    fold = (
        "aggregate("
        "transform(sort_array(collect_list(struct(ts, event_id, "
        "CAST(CASE WHEN event_type = 'view' THEN 1 "
        "WHEN event_type = 'purchase' THEN 2 ELSE 0 END AS BIGINT)))), "
        "t -> t.col3), "
        "CAST(0 AS BIGINT), "
        f"(s, x) -> CASE WHEN x = 1 THEN s + 1 "
        f"WHEN x = 2 AND s % {radix} > 0 THEN s + {radix} - 1 "
        "ELSE s END)"
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.expr(f"{fold} div {radix}").alias("n_pairs"),
            F.sum((F.col("event_type") == "view").cast("long")).alias("n_views"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "n_purchases"
            ),
        )
        .orderBy("user_id")
    )


# The greedy pending-pool pairing is parenthesis matching (view =
# open, purchase = close), so it has a CLOSED FORM: matched pairs =
# purchases − max prefix excess of purchases over views.  The closed
# form replaces the original list_reduce fold — DuckDB 1.0.0's
# list_reduce misattributes lambda results across grouped rows at
# some vector-chunk shapes (caught by the sf0.001 cross-scale sweep,
# r6), and the independent spelling is stronger differential
# evidence for the Spark fold anyway.
O_SEQUENCE_COUNT = """
WITH pre AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS v,
         SUM(CASE WHEN event_type = 'purchase' THEN 1
                  WHEN event_type = 'view' THEN -1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS excess
  FROM events)
SELECT user_id,
       CAST(SUM(p) - GREATEST(MAX(excess), 0) AS BIGINT) AS n_pairs,
       CAST(SUM(v) AS BIGINT) AS n_views,
       CAST(SUM(p) AS BIGINT) AS n_purchases
FROM pre GROUP BY user_id ORDER BY user_id
"""


def q_events_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``boundingRatio(ts, value)`` analog: per event type,
    the slope between the chronologically first and last points —
    (vₗₐₛₜ − v_first) / seconds elapsed.  First/last are picked with
    ``min_by``/``max_by`` over an injective zero-padded (micros,
    event_id) string key (DuckDB's arg_min/arg_max take only scalar
    keys) — one partial-aggregatable pass, no sort, no window."""
    e = load_table(spark, sf_dir, "events")
    key = "format_string('%020d%010d', unix_micros(ts), event_id)"
    return (
        e.groupBy("event_type")
        .agg(
            F.expr(f"min_by(value, {key})").alias("first_value"),
            F.expr(f"max_by(value, {key})").alias("last_value"),
            F.unix_micros(F.min("ts")).alias("first_us"),
            F.unix_micros(F.max("ts")).alias("last_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "n_events",
            "first_value",
            "last_value",
            F.round(
                (F.col("last_value") - F.col("first_value"))
                / ((F.col("last_us") - F.col("first_us")) / F.lit(1_000_000.0)),
                9,
            ).alias("bounding_ratio"),
        )
        .orderBy("event_type")
    )


O_BOUNDING_RATIO = """
SELECT event_type, COUNT(*) AS n_events,
       arg_min(value, printf('%020d%010d', epoch_us(ts), event_id))
         AS first_value,
       arg_max(value, printf('%020d%010d', epoch_us(ts), event_id))
         AS last_value,
       round((arg_max(value, printf('%020d%010d', epoch_us(ts), event_id))
              - arg_min(value, printf('%020d%010d', epoch_us(ts), event_id)))
             / ((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0), 9)
         AS bounding_ratio
FROM events GROUP BY event_type ORDER BY event_type
"""


def _strict_funnel_fold(dialect: str) -> str:
    """windowFunnel 'strict_order' transition as one integer-state fold.

    Element encoding: ``ts_sec·10 + code`` (code 1=view 2=click
    3=purchase, 0 other).  State: ``anchor_sec·100 + best·10 + cur``
    with ``cur = 9`` once the attempt is frozen.  Strict order means ANY
    event that is not the expected next step aborts the attempt (the
    ClickHouse mode where ``A→B→D→C`` does not count ``A→B→C``); the
    analog anchors at the user's first view, and the 24 h window freezes
    rather than aborts on expiry.  best only ever equals the deepest cur
    reached, so the freeze transition preserves it."""
    idiv = "div" if dialect == "spark" else "//"
    W = FUNNEL_WINDOW_HOURS * 3600
    return (
        "(s, x) -> CASE "
        "WHEN s % 10 = 9 THEN s "
        f"WHEN s % 10 = 0 THEN CASE WHEN x % 10 = 1 "
        f"THEN (x {idiv} 10) * 100 + 11 ELSE s END "
        f"WHEN (x {idiv} 10) - (s {idiv} 100) > {W} "
        f"THEN (s {idiv} 10) * 10 + 9 "
        f"WHEN x % 10 = (s % 10) + 1 "
        f"THEN (s {idiv} 100) * 100 + ((s % 10) + 1) * 11 "
        f"ELSE (s {idiv} 10) * 10 + 9 END"
    )


def q_events_funnel_strict_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(86400, 'strict_order')`` analog: per
    user, the deepest view→click→purchase level reached when ANY
    interleaving event aborts the attempt (see :func:`_strict_funnel_fold`);
    output is the level histogram.  Same shape as sequenceCount: one
    order-preserving per-user fold — map-side partial collect, one keyed
    shuffle, per-user history bounded.  Unlike the plain funnel, this
    fold must see the FULL event stream: a non-chain event between
    steps is exactly what aborts a strict_order attempt, so no
    event-type pre-filter is possible."""
    e = load_table(spark, sf_dir, "events")
    elem = (
        "(unix_micros(ts) div 1000000) * 10 + "
        "CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 "
        "WHEN 'purchase' THEN 3 ELSE 0 END AS BIGINT)"
    )
    fold = (
        "aggregate("
        f"transform(sort_array(collect_list(struct(ts, event_id, {elem}))), "
        "t -> t.col3), "
        "CAST(0 AS BIGINT), "
        f"{_strict_funnel_fold('spark')})"
    )
    per_user = e.groupBy("user_id").agg(
        F.expr(f"({fold} % 100) div 10").alias("level")
    )
    return (
        per_user.groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("level")
    )


def _o_funnel_strict_order() -> str:
    return f"""
WITH codes AS (
  SELECT user_id,
         list_transform(
           list_sort(list(struct_pack(a := ts, b := event_id,
             c := (epoch_us(ts) // 1000000) * 10 +
                  CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                       WHEN 'purchase' THEN 3 ELSE 0 END AS BIGINT)))),
           t -> t.c) AS xs
  FROM events GROUP BY user_id),
lv AS (
  SELECT user_id,
         (list_reduce(list_prepend(CAST(0 AS BIGINT), xs),
            {_strict_funnel_fold('duckdb')}) % 100) // 10 AS level
  FROM codes)
SELECT level, COUNT(*) AS n_users FROM lv GROUP BY level ORDER BY level
"""


SEQ_NEXT_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
firstv AS (
  SELECT user_id, next_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM o WHERE event_type = 'view')
SELECT user_id, COALESCE(next_type, '(end)') AS next_after_first_view
FROM firstv WHERE rn = 1 ORDER BY user_id
"""


def q_events_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode(forward, first_match)`` analog: per
    user, the event type that directly follows the chronologically first
    'view' event ('(end)' if the view is the user's last event).

    Shape: one keyed ``lead`` window (the next-event relation) + a
    keyed first-match rank — both partition by user, O(1)/row, nothing
    global; the same plan ClickHouse's sequence automaton would induce
    restricted to a single base-condition hop."""
    from clickhouse_vs_dbt_spark.catalog import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(SEQ_NEXT_SQL)


QUERIES = {
    "events_topk_sketch": q_events_topk_sketch,
    "events_sequence_next_node": q_events_sequence_next_node,
    "events_funnel_strict_order": q_events_funnel_strict_order,
    "events_sequence_count": q_events_sequence_count,
    "events_bounding_ratio": q_events_bounding_ratio,
    "events_group_uniq_array": q_events_group_uniq_array,
    "events_funnel_window": q_events_funnel_window,
    "events_retention_matrix": q_events_retention_matrix,
    "events_sequence_match": q_events_sequence_match,
    "events_group_array": q_events_group_array,
    "events_bit_aggregates": q_events_bit_aggregates,
    "events_cond_agg_suite": q_events_cond_agg_suite,
}

ORACLES = {
    "events_topk_sketch": O_TOPK_SKETCH,
    "events_sequence_next_node": SEQ_NEXT_SQL,
    "events_funnel_strict_order": _o_funnel_strict_order(),
    "events_sequence_count": O_SEQUENCE_COUNT,
    "events_bounding_ratio": O_BOUNDING_RATIO,
    "events_group_uniq_array": O_GROUP_UNIQ_ARRAY,
    "events_funnel_window": O_FUNNEL_WINDOW,
    "events_retention_matrix": O_RETENTION_MATRIX,
    "events_sequence_match": O_SEQUENCE_MATCH,
    "events_group_array": O_GROUP_ARRAY,
    "events_bit_aggregates": O_BIT_AGGREGATES,
    "events_cond_agg_suite": O_COND_AGG_SUITE,
}
