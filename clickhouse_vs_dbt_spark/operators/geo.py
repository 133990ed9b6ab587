"""Geo function family: great-circle distance and point-in-polygon
(ClickHouse ``greatCircleDistance`` / ``pointInPolygon`` parity).

Coordinates are synthesized deterministically from customer keys
(exact two-decimal lat/lon grid), so both operators are fully
value-checked.  Determinism strategy differs per operator:

* **Haversine** uses libm trig (``sin``/``cos``/``asin``), which is
  within-1-ulp but not bit-identical across runtimes (JVM vs DuckDB's
  C library) — so each per-row distance is rounded to whole meters
  (DECIMAL(18,3) km) *before* the decimal-sum aggregation; a 1-ulp
  wobble at ~1e-13 relative cannot move a value across a 0.0005 km
  rounding boundary except for astronomically unlucky inputs.
* **Point-in-polygon** (ray casting) uses only +,-,*,/ and comparisons
  — IEEE-exact in both engines, so inside/outside decisions match
  bit-for-bit with no rounding needed.

Scale shape: both are map-only projections over the fact side followed
by one bounded-cardinality groupBy; the polygon is a plan literal
(broadcast by value).  At 100 TB a real spatial join would first bucket
points by geohash/S2 cell and only ray-cast within candidate cells —
the same block-then-verify pattern as ``fuzzy.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

EARTH_KM = 6371.0
REF_LAT, REF_LON = 52.52, 13.405  # fixed reference point

# synthetic exact-grid coordinates from the key (two decimals)
_LAT_SQL = "CAST((c_custkey * 7919) % 14000 AS DOUBLE)/100.0 - 70.0"
_LON_SQL = "CAST((c_custkey * 104729) % 36000 AS DOUBLE)/100.0 - 180.0"

# convex quadrilateral over Europe-ish lon/lat space
POLY = [(-10.0, 35.0), (25.0, 35.0), (30.0, 60.0), (-5.0, 65.0)]


def _lat(c: Column) -> Column:
    return ((c * 7919) % 14000).cast("double") / 100.0 - 70.0


def _lon(c: Column) -> Column:
    return ((c * 104729) % 36000).cast("double") / 100.0 - 180.0


def q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance from every synthesized customer point to a
    fixed reference, rounded to meters per-row, then aggregated per
    nation with exact decimal sums (count / min / max / mean km)."""
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    dlat = F.radians(lat - F.lit(REF_LAT))
    dlon = F.radians(lon - F.lit(REF_LON))
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(F.lit(REF_LAT)))
        * F.cos(F.radians(lat))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    km = (
        (F.lit(2.0 * EARTH_KM) * F.asin(F.sqrt(a)))
        .cast("decimal(18,3)")  # whole meters — absorbs libm ulp wobble
    )
    return (
        c.select(F.col("c_nationkey").alias("nationkey"), km.alias("km"))
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("km").cast("double").alias("km_min"),
            F.max("km").cast("double").alias("km_max"),
            (F.sum("km").cast("double") / F.count(F.lit(1))).alias("km_avg"),
        )
        .orderBy("nationkey")
    )


O_GEO_DISTANCE = f"""
WITH pts AS (
  SELECT c_nationkey AS nationkey,
         {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM customer),
d AS (
  SELECT nationkey,
         CAST(2.0*{EARTH_KM} * asin(sqrt(
             sin(radians(lat - {REF_LAT})/2) * sin(radians(lat - {REF_LAT})/2)
             + cos(radians({REF_LAT})) * cos(radians(lat))
               * sin(radians(lon - {REF_LON})/2) * sin(radians(lon - {REF_LON})/2)
         )) AS DECIMAL(18,3)) AS km
  FROM pts)
SELECT nationkey, COUNT(*) AS n,
       CAST(MIN(km) AS DOUBLE) AS km_min,
       CAST(MAX(km) AS DOUBLE) AS km_max,
       CAST(SUM(km) AS DOUBLE) / COUNT(*) AS km_avg
FROM d GROUP BY nationkey ORDER BY nationkey
"""


def _ray_cast(lat: Column, lon: Column) -> Column:
    """Odd-crossings test of (lon, lat) against the literal POLY —
    arithmetic only, bit-identical across engines."""
    crossings: Column = F.lit(0)
    n = len(POLY)
    for i in range(n):
        x1, y1 = POLY[i]
        x2, y2 = POLY[(i + 1) % n]
        cond = (
            ((F.lit(y1) > lat) != (F.lit(y2) > lat))
            & (
                lon
                < F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1)
                + F.lit(x1)
            )
        )
        crossings = crossings + cond.cast("int")
    return crossings % 2 == 1


def q_geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    return (
        c.select(
            F.col("c_nationkey").alias("nationkey"),
            _ray_cast(lat, lon).cast("bigint").alias("inside"),
        )
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("inside").alias("n_inside"),
        )
        .orderBy("nationkey")
    )


def _sql_crossing(x1: float, y1: float, x2: float, y2: float) -> str:
    return (
        f"CASE WHEN (({y1} > lat) != ({y2} > lat)) AND "
        f"(lon < {x2 - x1}*(lat - {y1})/{y2 - y1} + {x1}) THEN 1 ELSE 0 END"
    )


_CROSSINGS = " + ".join(
    _sql_crossing(*POLY[i], *POLY[(i + 1) % len(POLY)]) for i in range(len(POLY))
)

O_GEO_POINT_IN_POLYGON = f"""
WITH pts AS (
  SELECT c_nationkey AS nationkey,
         {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM customer)
SELECT nationkey, COUNT(*) AS n,
       CAST(SUM(CASE WHEN ({_CROSSINGS}) % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inside
FROM pts GROUP BY nationkey ORDER BY nationkey
"""


QUERIES = {
    "geo_distance": q_geo_distance,
    "geo_point_in_polygon": q_geo_point_in_polygon,
}

ORACLES = {
    "geo_distance": O_GEO_DISTANCE,
    "geo_point_in_polygon": O_GEO_POINT_IN_POLYGON,
}
