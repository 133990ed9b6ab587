"""Statistical aggregate suite: moment statistics (variance, stddev,
skewness, kurtosis, covariance, correlation), exact weighted quantile
(ClickHouse ``quantileExactWeighted`` analog), and a row-based
exponential moving average (``exponentialMovingAverage`` analog).

Reference ships no statistics beyond SUM (README.md:415-438); this is
§2.2/§2.3 breadth a ClickHouse analyst expects (``varPop``, ``skewPop``,
``kurtPop``, ``corr``, ``quantileExactWeighted``, ``exponential*``).

Cross-engine determinism: moment statistics are derived from **exact
decimal power sums** (n, Σx, Σx², Σx³, Σx⁴, Σxy, Σy, Σy²) rather than
the engines' built-in one-pass estimators — float SUM is
order-dependent, so Spark's partial aggregation and DuckDB's serial
scan would disagree in the last ulps, while decimal sums are
associative and therefore identical regardless of partitioning.  The
closing formulas use only IEEE-correctly-rounded ops (+,-,*,/,sqrt; no
pow/ln, which are libm-dependent) in identical textual order, so the
doubles match bit-for-bit.  This is also the right 100 TB shape: power
sums are a single map-side-combined pass (same cost as the built-in
``F.skewness``), and the answer is invariant to cluster size.
Numerical caveat (documented, not hit here): power sums cancel
catastrophically when stddev << mean; inputs here are small-magnitude
quantities, and the decimal accumulation is exact so the cancellation
happens once, in the final double arithmetic.

Scale notes: weighted quantile = groupBy(key, value) pre-aggregation
(shrinks to |distinct values| per key) + one window pass per key —
at 100 TB swap the window for ``percentile_approx`` with weights
expanded, or a t-digest. The EMA is a bounded 20-lag window — state
per row is constant, partition-parallel across series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table, register_views

DEC = "decimal(38,6)"


def _dsum(col):
    return F.sum(col.cast(DEC)).cast("double")


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance/stddev/skewness/kurtosis of ``l_quantity``
    and covariance/correlation against ``l_extendedprice``, per return
    flag, from exact decimal power sums (see module doc).  Inputs are
    exactly representable (quantity is integer-valued, price has two
    decimals), so every power sum is exact in DECIMAL(38,6)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _dsum(x).alias("s1"),
        _dsum(x * x).alias("s2"),
        _dsum(x * x * x).alias("s3"),
        _dsum(x * x * x * x).alias("s4"),
        _dsum(y).alias("t1"),
        _dsum(y * y).alias("t2"),
        _dsum(x * y).alias("sxy"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    t1, t2, sxy = F.col("t1"), F.col("t2"), F.col("sxy")
    m = s1 / n
    my = t1 / n
    var = s2 / n - m * m
    vary = t2 / n - my * my
    sd = F.sqrt(var)
    m3 = s3 / n - F.lit(3.0) * m * (s2 / n) + F.lit(2.0) * m * m * m
    m4 = (
        s4 / n
        - F.lit(4.0) * m * (s3 / n)
        + F.lit(6.0) * m * m * (s2 / n)
        - F.lit(3.0) * m * m * m * m
    )
    cov = sxy / n - m * my
    return (
        sums.select(
            "l_returnflag",
            n.cast("bigint").alias("n"),
            m.alias("mean_qty"),
            var.alias("var_pop_qty"),
            sd.alias("stddev_pop_qty"),
            (m3 / (sd * sd * sd)).alias("skew_qty"),
            (m4 / (var * var)).alias("kurt_qty"),
            cov.alias("covar_pop"),
            (cov / (sd * F.sqrt(vary))).alias("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    )


O_STATS_MOMENTS = """
WITH sums AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s4,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS t1,
         CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS t2,
         CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       s1/n AS mean_qty,
       s2/n - (s1/n)*(s1/n) AS var_pop_qty,
       sqrt(s2/n - (s1/n)*(s1/n)) AS stddev_pop_qty,
       (s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n))
         / (sqrt(s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n)))
         AS skew_qty,
       (s4/n - 4.0*(s1/n)*(s3/n) + 6.0*(s1/n)*(s1/n)*(s2/n) - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n))
         / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n)))
         AS kurt_qty,
       sxy/n - (s1/n)*(t1/n) AS covar_pop,
       (sxy/n - (s1/n)*(t1/n))
         / (sqrt(s2/n - (s1/n)*(s1/n)) * sqrt(t2/n - (t1/n)*(t1/n)))
         AS corr_qty_price
FROM sums ORDER BY l_returnflag
"""

# Weighted quantile: one SQL text, two engines (window syntax is shared).
SQL_WEIGHTED_MEDIAN = """
WITH w AS (
  SELECT l_returnflag AS g, l_quantity AS x,
         CAST(floor(l_extendedprice*100.0 + 0.5) AS BIGINT) AS wt
  FROM lineitem),
agg AS (SELECT g, x, SUM(wt) AS wt FROM w GROUP BY g, x),
cum AS (
  SELECT g, x,
         SUM(wt) OVER (PARTITION BY g ORDER BY x) AS cw,
         SUM(wt) OVER (PARTITION BY g) AS tot
  FROM agg)
SELECT g AS l_returnflag, MIN(x) AS wmedian_qty
FROM cum WHERE cw*2 >= tot GROUP BY g ORDER BY l_returnflag
"""


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(0.5)(l_quantity, cents)``:
    smallest value whose cumulative integer weight reaches half the
    total.  Weights are exact integers (price in cents), so both
    engines agree exactly.  The groupBy(key,value) pre-aggregation
    bounds the window input at |distinct values| rows per key."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(SQL_WEIGHTED_MEDIAN)


# EMA weights inlined as literals so neither engine calls pow() (libm
# pow is not correctly-rounded and differs across runtimes).
_EMA_ALPHA = 0.1  # smoothing toward p = 1 - alpha = 0.9
_EMA_K = 20
_W = [round((1.0 - _EMA_ALPHA) ** k, 12) for k in range(_EMA_K)]

_NUM = " + ".join(
    f"{w!r}*COALESCE(CAST(lag(c, {k}) OVER win AS DOUBLE), 0.0)"
    for k, w in enumerate(_W)
)
_DEN = " + ".join(
    f"CASE WHEN lag(c, {k}) OVER win IS NULL THEN 0.0 ELSE {w!r} END"
    for k, w in enumerate(_W)
)

SQL_EMA = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE))
SELECT event_type, d, c,
       CAST(CAST(({_NUM}) / ({_DEN}) AS DECIMAL(18,6)) AS DOUBLE) AS ema20
FROM daily
WINDOW win AS (PARTITION BY event_type ORDER BY d)
ORDER BY event_type, d
"""


def q_events_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-based 20-term exponential moving average of daily event
    counts per type (ClickHouse ``exponentialMovingAverage`` analog,
    normalized over the available history like pandas ``adjust=True``).
    The 20 decay weights are Python-generated literals shared by both
    engine texts — no runtime ``pow``, so the horizontal sum is
    performed in identical textual order and matches bit-for-bit
    before the final 6-decimal rounding."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(SQL_EMA)


# Discrete quantiles + deterministic mode: one SQL text, two engines.
SQL_QUANTILE_DISC = """
WITH agg AS (
  SELECT l_returnflag AS g, l_quantity AS x, COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, l_quantity),
cum AS (
  SELECT g, x, n,
         SUM(n) OVER (PARTITION BY g ORDER BY x) AS cw,
         SUM(n) OVER (PARTITION BY g) AS tot
  FROM agg),
quart AS (
  SELECT g,
         MIN(CASE WHEN cw*4 >= tot THEN x END) AS p25,
         MIN(CASE WHEN cw*2 >= tot THEN x END) AS p50,
         MIN(CASE WHEN cw*4 >= tot*3 THEN x END) AS p75
  FROM cum GROUP BY g),
md AS (
  SELECT g, x AS mode_x FROM (
    SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY n DESC, x ASC) AS rn
    FROM agg) t
  WHERE rn = 1)
SELECT quart.g AS l_returnflag, p25, p50, p75, mode_x
FROM quart JOIN md ON quart.g = md.g ORDER BY l_returnflag
"""


def q_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_disc``(.25/.50/.75) and a deterministically
    tie-broken ``mode`` (highest count, then smallest value — engines'
    built-in ``mode()`` tie-breaking is unspecified, so the suite pins
    it) per return flag.  The groupBy(key,value) pre-aggregation bounds
    window input at |distinct values| rows per key, exactly like
    :func:`q_weighted_median`."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(SQL_QUANTILE_DISC)


# --- statistical tests (simpleLinearRegression / welchTTest / cramersV) ---
#
# All three reduce to exact decimal power sums / integer contingency
# counts, finished with IEEE-correctly-rounded ops (+,-,*,/,sqrt) in
# identical textual order — so, like the moments above, they are
# bit-identical across engines and cluster sizes.  ClickHouse exposes
# them as simpleLinearRegression, welchTTest, cramersV.

def _sums_sql(dialect: str) -> str:
    cast = "DECIMAL(38,6)"
    def ds(e: str) -> str:
        return f"CAST(SUM(CAST({e} AS {cast})) AS DOUBLE)"
    return f"""
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {ds('l_quantity')} AS sx,
         {ds('l_quantity * l_quantity')} AS sxx,
         {ds('l_extendedprice')} AS sy,
         {ds('l_extendedprice * l_extendedprice')} AS syy,
         {ds('l_quantity * l_extendedprice')} AS sxy
  FROM lineitem GROUP BY l_returnflag
"""


def q_linreg_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag, least-squares fit price = k·qty + b from the
    closed form k = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) — ClickHouse
    ``simpleLinearRegression`` — plus the determination coefficient r²."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(f"""
WITH s AS ({_sums_sql('spark')})
SELECT l_returnflag,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS k,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM s ORDER BY l_returnflag
""")


def _o_linreg() -> str:
    return f"""
WITH s AS ({_sums_sql('duckdb')})
SELECT l_returnflag,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS k,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM s ORDER BY l_returnflag
"""


_TTEST_A, _TTEST_B = "click", "purchase"


def _ttest_sql(dialect: str) -> str:
    cast = "DECIMAL(38,6)"
    def ds(e: str) -> str:
        return f"CAST(SUM(CAST({e} AS {cast})) AS DOUBLE)"
    return f"""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         {ds('value')} AS s1, {ds('value * value')} AS s2
  FROM events WHERE event_type IN ('{_TTEST_A}', '{_TTEST_B}')
  GROUP BY event_type),
m AS (
  SELECT event_type, n, s1 / n AS mean,
         (s2 - s1 * s1 / n) / (n - 1) AS var
  FROM g),
ab AS (
  SELECT
    MAX(CASE WHEN event_type = '{_TTEST_A}' THEN n END) AS na,
    MAX(CASE WHEN event_type = '{_TTEST_A}' THEN mean END) AS ma,
    MAX(CASE WHEN event_type = '{_TTEST_A}' THEN var END) AS va,
    MAX(CASE WHEN event_type = '{_TTEST_B}' THEN n END) AS nb,
    MAX(CASE WHEN event_type = '{_TTEST_B}' THEN mean END) AS mb,
    MAX(CASE WHEN event_type = '{_TTEST_B}' THEN var END) AS vb
  FROM m)
SELECT na, nb, ma, mb,
       (ma - mb) / sqrt(va / na + vb / nb) AS t_stat,
       (va / na + vb / nb) * (va / na + vb / nb)
         / ((va / na) * (va / na) / (na - 1)
            + (vb / nb) * (vb / nb) / (nb - 1)) AS welch_df
FROM ab
"""


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event types
    (ClickHouse ``welchTTest``): t statistic and Welch–Satterthwaite
    degrees of freedom from decimal-exact power sums."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ttest_sql("spark"))


_CV_X, _CV_Y = "c_mktsegment", "o_orderstatus"


def _cramers_sql(dialect: str) -> str:
    return f"""
WITH joined AS (
  SELECT {_CV_X} AS x, {_CV_Y} AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
cells AS (SELECT x, y, CAST(COUNT(*) AS DOUBLE) AS o FROM joined GROUP BY x, y),
rows_ AS (SELECT x, CAST(COUNT(*) AS DOUBLE) AS rx FROM joined GROUP BY x),
cols_ AS (SELECT y, CAST(COUNT(*) AS DOUBLE) AS cy FROM joined GROUP BY y),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(COUNT(DISTINCT x) AS DOUBLE) AS r,
               CAST(COUNT(DISTINCT y) AS DOUBLE) AS c
        FROM joined),
chi AS (
  SELECT CAST(SUM(CAST(
           (o - rx * cy / n) * (o - rx * cy / n) / (rx * cy / n)
           AS DECIMAL(38,18)) ) AS DOUBLE) AS chi2
  FROM cells JOIN rows_ USING (x) JOIN cols_ USING (y) CROSS JOIN tot)
SELECT chi2,
       sqrt(chi2 / (n * least(r - 1, c - 1))) AS cramers_v,
       CAST(n AS BIGINT) AS n_pairs
FROM chi CROSS JOIN tot
"""


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between market segment and order status
    (ClickHouse ``cramersV``): χ² over the contingency table (integer
    counts → identical doubles), decimal-exact cell sum, one sqrt."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_cramers_sql("spark"))


# --- histogram quantile sketch (quantileTiming / BFloat16 spirit) ---

HIST_BINS = 1024
HIST_LO, HIST_HI = 0.0, 1000.0  # value domain covered by the sketch


def _hist_quantile_sql(dialect: str) -> str:
    """Fixed-grid histogram quantile estimate: bucket each value into
    one of HIST_BINS equal-width bins (clamped), then read p50/p95 off
    the cumulative bin counts and report the bin midpoint.

    This is the engine-portable form of ClickHouse's bucketing
    quantile sketches (``quantileTiming``/``quantileBFloat16``): the
    state is a bounded integer histogram — mergeable, order-free, and
    (unlike t-digest/GK) bit-identical on any engine or partitioning,
    so the whole approximate path value-checks.  Error is bounded by
    half the bin width; the exact per-group quantile is reported
    alongside to exhibit it."""
    idiv = "div" if dialect == "spark" else "//"
    q_exact = (
        "percentile(value, 0.50)" if dialect == "spark" else "quantile_cont(value, 0.50)"
    )
    q_exact95 = (
        "percentile(value, 0.95)" if dialect == "spark" else "quantile_cont(value, 0.95)"
    )
    width = (HIST_HI - HIST_LO) / HIST_BINS
    bin_expr = (
        f"least(CAST({HIST_BINS - 1} AS BIGINT), "
        f"greatest(CAST(0 AS BIGINT), "
        f"CAST(floor((value - {HIST_LO}) / {width!r}) AS BIGINT)))"
    )
    # CAST to DOUBLE: Spark types the `(bin + 0.5) * <literal>` product as
    # DECIMAL, so without the cast p50_est/p95_est come back decimal(31,8)
    # while the DuckDB oracle emits DOUBLE — numerically identical values
    # that stringify differently and break the value hash (the round-2 red
    # gate row; same drift class as round 1's events_json_extract).
    mid = f"CAST(({HIST_LO} + (bin + 0.5) * {width!r}) AS DOUBLE)"
    return f"""
WITH binned AS (
  SELECT event_type, {bin_expr} AS bin, COUNT(*) AS cnt
  FROM events GROUP BY event_type, {bin_expr}),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt,
         SUM(cnt) OVER (PARTITION BY event_type) AS total
  FROM binned),
est AS (
  SELECT event_type,
         MIN(CASE WHEN cum_cnt * 100 >= total * 50 THEN {mid} END) AS p50_est,
         MIN(CASE WHEN cum_cnt * 100 >= total * 95 THEN {mid} END) AS p95_est
  FROM cum GROUP BY event_type),
exact AS (
  SELECT event_type,
         round({q_exact}, 6) AS p50_exact,
         round({q_exact95}, 6) AS p95_exact,
         COUNT(*) AS n
  FROM events GROUP BY event_type)
SELECT exact.event_type, n, p50_est, p95_est, p50_exact, p95_exact,
       round(abs(p50_est - p50_exact), 6) AS p50_abs_err
FROM exact JOIN est ON exact.event_type = est.event_type
ORDER BY exact.event_type
"""


def q_quantile_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles per event type (see
    :func:`_hist_quantile_sql`)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_hist_quantile_sql("spark"))


def _categorical_assoc_sql(dialect: str) -> str:
    """cramersV / cramersVBiasCorrected / theilsU / entropy between
    ``c_mktsegment`` and ``o_orderstatus`` (ClickHouse's categorical
    association family, which the dialect refuses inline because they
    are two-level statistics).  One contingency-table pass:

    - FACT ROWS are touched exactly once: the contingency table
      (GROUP BY x, y — partial+final hash aggregate over the
      broadcast-dim join) is the only fact-scale operation; row /
      column / grand totals re-aggregate the |r|×|c| cell table
      (integer-valued double sums — exact below 2⁵³), and the final
      joins run over metadata-scale relations (broadcast-hinted on
      the Spark side);
    - every floating term (χ² cells, p·log₂p) is a deterministic
      per-cell double accumulated as DECIMAL(38,18) — associative, so
      the result is partitioning-independent;
    - Theil's U(x|y) = (H(x) − H(x|y)) / H(x) with
      H(x|y) = −Σ_cells (o/n)·log₂(o/cy);
    - bias correction (Bergsma 2013): φ²⁺ = max(0, φ² − (r−1)(c−1)/
      (n−1)), r⁺ = r − (r−1)²/(n−1), c⁺ = c − (c−1)²/(n−1).
    """
    hint = (
        "/*+ BROADCAST(rows_), BROADCAST(cols_), BROADCAST(tot) */ "
        if dialect == "spark" else ""
    )
    return f"""
WITH joined AS (
  SELECT {_CV_X} AS x, {_CV_Y} AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
cells AS (SELECT x, y, CAST(COUNT(*) AS DOUBLE) AS o FROM joined GROUP BY x, y),
rows_ AS (SELECT x, SUM(o) AS rx FROM cells GROUP BY x),
cols_ AS (SELECT y, SUM(o) AS cy FROM cells GROUP BY y),
tot AS (SELECT SUM(o) AS n,
               CAST(COUNT(DISTINCT x) AS DOUBLE) AS r,
               CAST(COUNT(DISTINCT y) AS DOUBLE) AS c
        FROM cells),
hx AS (SELECT CAST(SUM(CAST(-(rx / n) * log2(rx / n)
                            AS DECIMAL(38,18))) AS DOUBLE) AS h_x
       FROM rows_ CROSS JOIN tot),
hy AS (SELECT CAST(SUM(CAST(-(cy / n) * log2(cy / n)
                            AS DECIMAL(38,18))) AS DOUBLE) AS h_y
       FROM cols_ CROSS JOIN tot),
chi AS (
  SELECT {hint}
    CAST(SUM(CAST((o - rx * cy / n) * (o - rx * cy / n) / (rx * cy / n)
                  AS DECIMAL(38,18))) AS DOUBLE) AS chi2,
    CAST(SUM(CAST(-(o / n) * log2(o / cy)
                  AS DECIMAL(38,18))) AS DOUBLE) AS h_x_given_y
  FROM cells JOIN rows_ USING (x) JOIN cols_ USING (y) CROSS JOIN tot)
SELECT round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v,
       round(sqrt(
         greatest(0.0, chi2 / n - (r - 1) * (c - 1) / (n - 1))
         / least(r - (r - 1) * (r - 1) / (n - 1) - 1,
                 c - (c - 1) * (c - 1) / (n - 1) - 1)), 6)
         AS cramers_v_bc,
       round((h_x - h_x_given_y) / h_x, 6) AS theils_u,
       round(h_x, 6) AS entropy_x,
       round(h_y, 6) AS entropy_y,
       CAST(n AS BIGINT) AS n_pairs
FROM chi CROSS JOIN hx CROSS JOIN hy CROSS JOIN tot
"""


def q_stats_categorical_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersVBiasCorrected``/``theilsU``/``entropy``
    as one contingency-table pass (module doc on _categorical_assoc_sql)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_categorical_assoc_sql("spark"))


_MWU_A, _MWU_B = "purchase", "error"


def _mann_whitney_sql(dialect: str) -> str:
    """Mann–Whitney U (ClickHouse ``mannWhitneyUTest``) without
    per-row ranks: with average-tie ranks, the rank-sum of sample 1
    only needs per-DISTINCT-VALUE counts —

        2·avgrank(v) = 2·(rows before v) + count(v) + 1
        2·R₁ = Σ_v c₁(v) · (2·cumbefore(v) + ct(v) + 1)

    so the plan is one GROUP BY value (the only fact-row shuffle)
    followed by a prefix sum over the DISTINCT VALUES — metadata
    scale: `events.value` carries 2 decimals, so the distinct set is
    domain-bounded (≤ ~100k rows) regardless of fact-row count, the
    same bounded-window contract as rank_corr's bucket offsets.  All
    rank algebra stays in exact BIGINT ×2 arithmetic (U doubles to
    dodge the ½ from tie averages); the z statistic applies the tie
    correction  σ² = n₁n₂/12 · (N+1 − Σ(t³−t)/(N(N−1)))  as one
    double expression over the exact integers — deterministic."""
    return f"""
WITH s AS (
  SELECT value AS v,
         CAST(COUNT(*) AS BIGINT) AS ct,
         CAST(COUNT(CASE WHEN event_type = '{_MWU_A}' THEN 1 END)
              AS BIGINT) AS c1
  FROM events
  WHERE event_type IN ('{_MWU_A}', '{_MWU_B}') AND value IS NOT NULL
  GROUP BY value),
r AS (
  SELECT ct, c1,
         COALESCE(SUM(ct) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cumbefore
  FROM s),
agg AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(ct - c1) AS BIGINT) AS n2,
         CAST(SUM(ct) AS BIGINT) AS n,
         CAST(SUM(c1 * (2 * cumbefore + ct + 1)) AS BIGINT) AS r1x2,
         CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tiesum
  FROM r)
SELECT n1, n2,
       CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       CAST(2 * n1 * n2 - (r1x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
       round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2
              - CAST(n1 AS DOUBLE) * n2 / 2)
             / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                    * (CAST(n AS DOUBLE) + 1
                       - CAST(tiesum AS DOUBLE)
                         / (CAST(n AS DOUBLE) * (n - 1)))), 6)
         AS z_stat
FROM agg
"""


def q_stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between two event types (module doc on
    _mann_whitney_sql)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_mann_whitney_sql("spark"))


def _ks_series(dialect: str, lam: str) -> str:
    """Asymptotic Kolmogorov tail Q(λ) = 2·Σ_{k≥1} (−1)^{k−1}
    e^{−2k²λ²}, truncated at k=100 (the terms decay as e^{−2k²λ²};
    for any λ where p > 1e-12 the tail beyond k=100 is below double
    precision).  Each engine spells the finite sum natively — the
    terms are identical doubles, so round(…, 6) agrees."""
    if dialect == "spark":
        return (
            f"2 * aggregate(sequence(1, 100), CAST(0 AS DOUBLE), "
            f"(acc, k) -> acc + (CASE WHEN k % 2 = 1 THEN 1.0 ELSE "
            f"-1.0 END) * exp(-2.0 * k * k * ({lam}) * ({lam})))"
        )
    return (
        f"2 * list_sum(list_transform(range(1, 101), "
        f"k -> (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END) "
        f"* exp(-2.0 * k * k * ({lam}) * ({lam}))))"
    )


def _ks_test_sql(dialect: str) -> str:
    """Two-sample Kolmogorov–Smirnov (ClickHouse
    ``kolmogorovSmirnovTest``) on the distinct-value ECDF: both
    empirical CDFs only jump at data points, so sup|F₁−F₂| is the max
    over distinct values of the inclusive cumulative counts — exact
    integer cumulatives divided once per row (deterministic doubles).
    Same plan shape as stats_mann_whitney: one GROUP BY value over
    fact rows, then a prefix window over the domain-bounded distinct
    set.  p is the asymptotic Kolmogorov tail at
    λ = D·√(n₁n₂/(n₁+n₂)), clamped to [0, 1]."""
    lam = "d_stat * sqrt(n1 * n2 / (n1 + n2))"
    return f"""
WITH s AS (
  SELECT value AS v,
         CAST(COUNT(CASE WHEN event_type = '{_MWU_A}' THEN 1 END)
              AS BIGINT) AS c1,
         CAST(COUNT(CASE WHEN event_type = '{_MWU_B}' THEN 1 END)
              AS BIGINT) AS c2
  FROM events
  WHERE event_type IN ('{_MWU_A}', '{_MWU_B}') AND value IS NOT NULL
  GROUP BY value),
c AS (
  SELECT SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS f1,
         SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS f2
  FROM s),
t AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n1,
             CAST(SUM(c2) AS DOUBLE) AS n2
      FROM s),
d AS (
  SELECT MAX(ABS(CAST(f1 AS DOUBLE) / n1 - CAST(f2 AS DOUBLE) / n2))
           AS d_stat
  FROM c CROSS JOIN t)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       round(d_stat, 6) AS d_stat,
       round(least(1.0, greatest(0.0, {_ks_series(dialect, lam)})), 6)
         AS p_asymp
FROM d CROSS JOIN t
"""


def q_stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test between two event types (module doc on
    _ks_test_sql)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_ks_test_sql("spark"))


QUERIES = {
    "stats_moments": q_stats_moments,
    "weighted_median": q_weighted_median,
    "events_ema": q_events_ema,
    "quantile_disc_mode": q_quantile_disc,
    "linreg_price_on_qty": q_linreg_price_on_qty,
    "welch_ttest_events": q_welch_ttest,
    "cramers_v_segment_status": q_cramers_v,
    "quantile_histogram_sketch": q_quantile_histogram_sketch,
    "stats_categorical_assoc": q_stats_categorical_assoc,
    "stats_mann_whitney": q_stats_mann_whitney,
    "stats_ks_test": q_stats_ks_test,
}

ORACLES = {
    "stats_moments": O_STATS_MOMENTS,
    "weighted_median": SQL_WEIGHTED_MEDIAN,
    "events_ema": SQL_EMA,
    "quantile_disc_mode": SQL_QUANTILE_DISC,
    "linreg_price_on_qty": _o_linreg(),
    "welch_ttest_events": _ttest_sql("duckdb"),
    "cramers_v_segment_status": _cramers_sql("duckdb"),
    "quantile_histogram_sketch": _hist_quantile_sql("duckdb"),
    "stats_categorical_assoc": _categorical_assoc_sql("duckdb"),
    "stats_mann_whitney": _mann_whitney_sql("duckdb"),
    "stats_ks_test": _ks_test_sql("duckdb"),
}
