"""The reference's query surface, re-expressed on the driver fixtures.

Covers every query operator in SURVEY.md §2.1 (projection P1-P3, filters
F1-F4, arithmetic E1-E2, date functions D1-D3, global aggregation A1,
joins J1) plus the rest of the SSB flight (Q2-Q4 analogs: GROUP BY /
ORDER BY / IN-lists) that the reference's star schema was built for.

Parameter mapping (FIXTURES.md §C): the fixtures are TPC-H-ish, so
``LO_ORDERDATE→o_orderdate``, ``LO_QUANTITY→l_quantity``,
``LO_EXTENDEDPRICE→l_extendedprice``, and ``LO_DISCOUNT→l_discount`` (a
*fraction* 0.00-0.10, vs SSB's integer percent — predicates use
fractional bounds, same in engine and oracle).  Fixture dates span
1995-2001, so the Q1 flight's years shift from the reference's
1993/1994 (reference README.md:417, 426, 435) to 1995/1996.

Every ``q_*`` function has an ``o_*`` oracle-SQL twin built over the
same star CTE; aggregate columns share names between the two (driver
hashing is name-sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table
from clickhouse_vs_dbt_spark.functions.datefns import (
    to_iso_week,
    to_year,
    to_yyyymm,
    year_range,
    yyyymm_range,
)
from clickhouse_vs_dbt_spark.operators.common import dsum, sql_dsum, star
from clickhouse_vs_dbt_spark.plans.star import star_sql

STAR_CTE = f"WITH star AS ({star_sql()})"

# Column expressions are built lazily (classic PySpark needs an active
# session even for unbound F.col).
def REVENUE():  # SSB Q1 revenue (E1): price × discount, no ÷100 (README.md:415)
    return F.col("l_extendedprice") * F.col("l_discount")


def NET():  # TPC-H-style net revenue for the Q2-Q4 analogs
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


SQL_REVENUE = "l_extendedprice * l_discount"
SQL_NET = "l_extendedprice * (1 - l_discount)"


# --- staging passthrough (operators P1, S3: reference README.md:296-326) ---

def q_stg_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * FROM source`` passthrough — the reference's staging
    models are exactly this (README.md:300-301)."""
    return load_table(spark, sf_dir, "customer").select("*")


O_STG_CUSTOMER = "SELECT * FROM customer"


# --- the star model itself (operators J1, P2, P3, S2) ---

def q_star_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full denormalized star (reference README.md:349-395); dates cast
    to DATE so both engines emit day-precision values."""
    return (
        star(spark, sf_dir)
        .withColumn("o_orderdate", F.to_date("o_orderdate"))
        .withColumn("l_shipdate", F.to_date("l_shipdate"))
    )


O_STAR_BUILD = f"""{STAR_CTE}
SELECT * REPLACE (CAST(o_orderdate AS DATE) AS o_orderdate,
                  CAST(l_shipdate AS DATE) AS l_shipdate),
       CAST(year(o_orderdate) AS INT) AS order_year
FROM star
"""


# --- SSB Q1 flight (reference README.md:413-438) ---

def q1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1.1 semantics (reference README.md:415-417): global sum of
    price×discount for one order-year, a discount band, small quantities.
    Exercises F1 (year equality), F2 (BETWEEN), F3 (<), F4 (AND), E1, E2,
    D1, A1."""
    return (
        star(spark, sf_dir)
        .filter(
            (to_year("o_orderdate") == 1995)
            & (F.col("order_year") == 1995)  # partition-pruning twin
            & year_range("o_orderdate", 1995)  # row-group-pruning twin
            & F.col("l_discount").between(0.01, 0.03)
            & (F.col("l_quantity") < 25)
        )
        .agg(dsum(REVENUE()).alias("revenue"))
    )


O_Q1_1 = f"""{STAR_CTE}
SELECT {sql_dsum(SQL_REVENUE)} AS revenue
FROM star
WHERE year(o_orderdate) = 1995
  AND l_discount BETWEEN 0.01 AND 0.03
  AND l_quantity < 25
"""


def q1_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1.2 semantics (reference README.md:424-426): toYYYYMM month
    bucket (D2) + tighter bands."""
    return (
        star(spark, sf_dir)
        .filter(
            (to_yyyymm("o_orderdate") == 199601)
            & (F.col("order_year") == 1996)  # partition-pruning twin
            & yyyymm_range("o_orderdate", 199601)  # row-group-pruning twin
            & F.col("l_discount").between(0.04, 0.06)
            & F.col("l_quantity").between(26, 35)
        )
        .agg(dsum(REVENUE()).alias("revenue"))
    )


O_Q1_2 = f"""{STAR_CTE}
SELECT {sql_dsum(SQL_REVENUE)} AS revenue
FROM star
WHERE year(o_orderdate) * 100 + month(o_orderdate) = 199601
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity BETWEEN 26 AND 35
"""


def q1_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1.3 semantics (reference README.md:433-436): ISO week (D3) paired
    with *calendar* year — the reference's exact (subtle) conjunction."""
    return (
        star(spark, sf_dir)
        .filter(
            (to_iso_week("o_orderdate") == 6)
            & (to_year("o_orderdate") == 1996)
            & (F.col("order_year") == 1996)  # partition-pruning twin
            & year_range("o_orderdate", 1996)  # row-group-pruning twin
            & F.col("l_discount").between(0.05, 0.07)
            & F.col("l_quantity").between(26, 35)
        )
        .agg(dsum(REVENUE()).alias("revenue"))
    )


O_Q1_3 = f"""{STAR_CTE}
SELECT {sql_dsum(SQL_REVENUE)} AS revenue
FROM star
WHERE week(o_orderdate) = 6
  AND year(o_orderdate) = 1996
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity BETWEEN 26 AND 35
"""


# --- SSB Q2-Q4 analogs (the rest of the flight the reference's schema
# --- targets; adds GROUP BY, ORDER BY, IN-lists — SURVEY.md §7-M3) ---

def q2_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2 shape: revenue by year × brand, filtered to one part-type
    family and one supplier region (region resolved via the
    nation→region snowflake, both joined as broadcast dims)."""
    nation = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n")
    region = F.broadcast(load_table(spark, sf_dir, "region")).alias("r")
    return (
        star(spark, sf_dir)
        .join(nation, F.col("s_nationkey") == F.col("n.n_nationkey"))
        .join(region, F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .filter((F.col("r.r_name") == "ASIA") & (F.col("p_type") == "PROMO"))
        .groupBy(to_year("o_orderdate").alias("order_year"), F.col("p_brand"))
        .agg(dsum(NET()).alias("revenue"))
        .orderBy("order_year", "p_brand")
    )


O_Q2 = f"""{STAR_CTE}
SELECT year(o_orderdate) AS order_year, p_brand,
       {sql_dsum(SQL_NET)} AS revenue
FROM star
JOIN nation n ON s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q3_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3 shape: customer-nation × supplier-nation × year within one
    region and a year range; ORDER BY year ASC, revenue DESC."""
    cn = F.broadcast(load_table(spark, sf_dir, "nation")).alias("cn")
    sn = F.broadcast(load_table(spark, sf_dir, "nation")).alias("sn")
    cr = F.broadcast(load_table(spark, sf_dir, "region")).alias("cr")
    sr = F.broadcast(load_table(spark, sf_dir, "region")).alias("sr")
    return (
        star(spark, sf_dir)
        .join(cn, F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(cr, F.col("cn.n_regionkey") == F.col("cr.r_regionkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .join(sr, F.col("sn.n_regionkey") == F.col("sr.r_regionkey"))
        .filter(
            (F.col("cr.r_name") == "EUROPE")
            & (F.col("sr.r_name") == "EUROPE")
            & to_year("o_orderdate").between(1995, 1997)
            & F.col("order_year").between(1995, 1997)  # partition-pruning twin
        )
        .groupBy(
            F.col("cn.n_name").alias("c_nation"),
            F.col("sn.n_name").alias("s_nation"),
            to_year("o_orderdate").alias("order_year"),
        )
        .agg(dsum(NET()).alias("revenue"))
        .orderBy(F.col("order_year").asc(), F.col("revenue").desc())
    )


O_Q3 = f"""{STAR_CTE}
SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
       year(o_orderdate) AS order_year,
       {sql_dsum(SQL_NET)} AS revenue
FROM star
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region cr ON cn.n_regionkey = cr.r_regionkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN region sr ON sn.n_regionkey = sr.r_regionkey
WHERE cr.r_name = 'EUROPE' AND sr.r_name = 'EUROPE'
  AND year(o_orderdate) BETWEEN 1995 AND 1997
GROUP BY 1, 2, 3
ORDER BY order_year ASC, revenue DESC
"""


def q4_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4 shape: profit by year × customer nation for selected
    market segments (IN-list).  Fixtures lack LO_SUPPLYCOST, so the
    profit analog is net revenue less tax:
    ``l_extendedprice*(1-l_discount)*(1-l_tax)``."""
    cn = F.broadcast(load_table(spark, sf_dir, "nation")).alias("cn")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 - F.col("l_tax"))
    return (
        star(spark, sf_dir)
        .join(cn, F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"))
        .groupBy(
            to_year("o_orderdate").alias("order_year"),
            F.col("cn.n_name").alias("c_nation"),
        )
        .agg(dsum(profit).alias("profit"))
        .orderBy("order_year", "c_nation")
    )


O_Q4 = f"""{STAR_CTE}
SELECT year(o_orderdate) AS order_year, cn.n_name AS c_nation,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 - l_tax)')} AS profit
FROM star
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- the rest of the 13-query SSB suite.  The fixtures have no city
# --- columns, so SSB's city-level drill-downs (Q3.2-Q3.4, Q4.3) are
# --- expressed one level up the same hierarchy (nation); every other
# --- element — selectivity laddering, added dimensions per flight,
# --- IN/BETWEEN/equality predicate progression — is kept. ---

def _supplier_region(spark: SparkSession, sf_dir: str, df: DataFrame) -> DataFrame:
    n = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n")
    r = F.broadcast(load_table(spark, sf_dir, "region")).alias("r")
    return df.join(n, F.col("s_nationkey") == F.col("n.n_nationkey")).join(
        r, F.col("n.n_regionkey") == F.col("r.r_regionkey")
    )


def q2_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.2: brand BETWEEN range replaces Q2.1's category equality
    (tighter part filter, same year×brand output)."""
    return (
        _supplier_region(spark, sf_dir, star(spark, sf_dir))
        .filter(
            (F.col("r.r_name") == "EUROPE")
            & F.col("p_brand").between("Brand#12", "Brand#18")
        )
        .groupBy(to_year("o_orderdate").alias("order_year"), F.col("p_brand"))
        .agg(dsum(NET()).alias("revenue"))
        .orderBy("order_year", "p_brand")
    )


O_Q2_2 = f"""{STAR_CTE}
SELECT year(o_orderdate) AS order_year, p_brand,
       {sql_dsum(SQL_NET)} AS revenue
FROM star
JOIN nation n ON s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE' AND p_brand BETWEEN 'Brand#12' AND 'Brand#18'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q2_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.3: single-brand equality — the most selective rung of the
    Q2 ladder."""
    return (
        _supplier_region(spark, sf_dir, star(spark, sf_dir))
        .filter(
            (F.col("r.r_name") == "AMERICA") & (F.col("p_brand") == "Brand#13")
        )
        .groupBy(to_year("o_orderdate").alias("order_year"), F.col("p_brand"))
        .agg(dsum(NET()).alias("revenue"))
        .orderBy("order_year", "p_brand")
    )


O_Q2_3 = f"""{STAR_CTE}
SELECT year(o_orderdate) AS order_year, p_brand,
       {sql_dsum(SQL_NET)} AS revenue
FROM star
JOIN nation n ON s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA' AND p_brand = 'Brand#13'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _both_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = F.broadcast(load_table(spark, sf_dir, "nation")).alias("cn")
    sn = F.broadcast(load_table(spark, sf_dir, "nation")).alias("sn")
    return (
        star(spark, sf_dir)
        .join(cn, F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn.n_nationkey"))
    )


def _q3_group(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(
            F.col("cn.n_name").alias("c_nation"),
            F.col("sn.n_name").alias("s_nation"),
            to_year("o_orderdate").alias("order_year"),
        )
        .agg(dsum(NET()).alias("revenue"))
        .orderBy(F.col("order_year").asc(), F.col("revenue").desc())
    )


SQL_Q3_GROUP = f"""
SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
       year(o_orderdate) AS order_year,
       {sql_dsum(SQL_NET)} AS revenue
FROM star
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
"""


def q3_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.2 analog: both trading parties restricted to an IN-set of
    nations (SSB narrows region→city; fixtures narrow region→nation)."""
    ns = ["NATION_2", "NATION_7", "NATION_12", "NATION_17"]
    return _q3_group(
        _both_nations(spark, sf_dir).filter(
            F.col("cn.n_name").isin(ns)
            & F.col("sn.n_name").isin(ns)
            & to_year("o_orderdate").between(1995, 1997)
            & F.col("order_year").between(1995, 1997)  # partition-pruning twin
        )
    )


O_Q3_2 = f"""{STAR_CTE}
{SQL_Q3_GROUP}
WHERE cn.n_name IN ('NATION_2', 'NATION_7', 'NATION_12', 'NATION_17')
  AND sn.n_name IN ('NATION_2', 'NATION_7', 'NATION_12', 'NATION_17')
  AND year(o_orderdate) BETWEEN 1995 AND 1997
GROUP BY 1, 2, 3
ORDER BY order_year ASC, revenue DESC
"""


def q3_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.3 analog: exactly two nations on each side."""
    ns = ["NATION_5", "NATION_20"]
    return _q3_group(
        _both_nations(spark, sf_dir).filter(
            F.col("cn.n_name").isin(ns)
            & F.col("sn.n_name").isin(ns)
            & to_year("o_orderdate").between(1995, 1997)
            & F.col("order_year").between(1995, 1997)  # partition-pruning twin
        )
    )


O_Q3_3 = f"""{STAR_CTE}
{SQL_Q3_GROUP}
WHERE cn.n_name IN ('NATION_5', 'NATION_20')
  AND sn.n_name IN ('NATION_5', 'NATION_20')
  AND year(o_orderdate) BETWEEN 1995 AND 1997
GROUP BY 1, 2, 3
ORDER BY order_year ASC, revenue DESC
"""


def q3_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.4: the Q3.3 pair narrowed to a single month (D2 again,
    this time as a GROUP-BY query's filter)."""
    ns = ["NATION_5", "NATION_20"]
    return _q3_group(
        _both_nations(spark, sf_dir).filter(
            F.col("cn.n_name").isin(ns)
            & F.col("sn.n_name").isin(ns)
            & (to_yyyymm("o_orderdate") == 199712)
            & (F.col("order_year") == 1997)  # partition-pruning twin
            & yyyymm_range("o_orderdate", 199712)
        )
    )


O_Q3_4 = f"""{STAR_CTE}
{SQL_Q3_GROUP}
WHERE cn.n_name IN ('NATION_5', 'NATION_20')
  AND sn.n_name IN ('NATION_5', 'NATION_20')
  AND year(o_orderdate) * 100 + month(o_orderdate) = 199712
GROUP BY 1, 2, 3
ORDER BY order_year ASC, revenue DESC
"""


def PROFIT():
    return (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 - F.col("l_tax"))
    )


SQL_PROFIT = "l_extendedprice * (1 - l_discount) * (1 - l_tax)"


def q4_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.2: Q4.1 drilled into two years, supplier nation and part
    type added to the grouping, customer side fixed to one region."""
    cn = F.broadcast(load_table(spark, sf_dir, "nation")).alias("cn")
    cr = F.broadcast(load_table(spark, sf_dir, "region")).alias("cr")
    sn = F.broadcast(load_table(spark, sf_dir, "nation")).alias("sn")
    return (
        star(spark, sf_dir)
        .join(cn, F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(cr, F.col("cn.n_regionkey") == F.col("cr.r_regionkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .filter(
            (F.col("cr.r_name") == "AMERICA")
            & to_year("o_orderdate").isin(1997, 1998)
            & F.col("order_year").isin(1997, 1998)  # partition-pruning twin
        )
        .groupBy(
            to_year("o_orderdate").alias("order_year"),
            F.col("sn.n_name").alias("s_nation"),
            F.col("p_type"),
        )
        .agg(dsum(PROFIT()).alias("profit"))
        .orderBy("order_year", "s_nation", "p_type")
    )


O_Q4_2 = f"""{STAR_CTE}
SELECT year(o_orderdate) AS order_year, sn.n_name AS s_nation, p_type,
       {sql_dsum(SQL_PROFIT)} AS profit
FROM star
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region cr ON cn.n_regionkey = cr.r_regionkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cr.r_name = 'AMERICA' AND year(o_orderdate) IN (1997, 1998)
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q4_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.3 analog: supplier side pinned to one nation (SSB pins a
    city), grouped to the brand level — the finest grain of the suite."""
    sn = F.broadcast(load_table(spark, sf_dir, "nation")).alias("sn")
    return (
        star(spark, sf_dir)
        .join(sn, F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .filter(
            (F.col("sn.n_name") == "NATION_1")
            & to_year("o_orderdate").isin(1997, 1998)
            & F.col("order_year").isin(1997, 1998)  # partition-pruning twin
        )
        .groupBy(
            to_year("o_orderdate").alias("order_year"),
            F.col("p_brand"),
        )
        .agg(dsum(PROFIT()).alias("profit"))
        .orderBy("order_year", "p_brand")
    )


O_Q4_3 = f"""{STAR_CTE}
SELECT year(o_orderdate) AS order_year, p_brand,
       {sql_dsum(SQL_PROFIT)} AS profit
FROM star
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE sn.n_name = 'NATION_1' AND year(o_orderdate) IN (1997, 1998)
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "stg_customer": q_stg_customer,
    "star_build": q_star_build,
    "ssb_q1_1": q1_1,
    "ssb_q1_2": q1_2,
    "ssb_q1_3": q1_3,
    "ssb_q2_brand_revenue": q2_brand_revenue,
    "ssb_q2_2": q2_2,
    "ssb_q2_3": q2_3,
    "ssb_q3_nation_revenue": q3_nation_revenue,
    "ssb_q3_2": q3_2,
    "ssb_q3_3": q3_3,
    "ssb_q3_4": q3_4,
    "ssb_q4_profit": q4_profit,
    "ssb_q4_2": q4_2,
    "ssb_q4_3": q4_3,
}

ORACLES = {
    "stg_customer": O_STG_CUSTOMER,
    "star_build": O_STAR_BUILD,
    "ssb_q1_1": O_Q1_1,
    "ssb_q1_2": O_Q1_2,
    "ssb_q1_3": O_Q1_3,
    "ssb_q2_brand_revenue": O_Q2,
    "ssb_q2_2": O_Q2_2,
    "ssb_q2_3": O_Q2_3,
    "ssb_q3_nation_revenue": O_Q3,
    "ssb_q3_2": O_Q3_2,
    "ssb_q3_3": O_Q3_3,
    "ssb_q3_4": O_Q3_4,
    "ssb_q4_profit": O_Q4,
    "ssb_q4_2": O_Q4_2,
    "ssb_q4_3": O_Q4_3,
}
