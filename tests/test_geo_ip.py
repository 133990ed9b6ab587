"""Semantic checks for the geo and IPv4 function families plus the
discrete-quantile suite."""

from __future__ import annotations

import math

from clickhouse_vs_dbt_spark.operators import geo, ipfns, stats


def test_geo_distance_matches_reference_formula(spark, sf_dir):
    rows = geo.q_geo_distance(spark, sf_dir).collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    by_nation = {}
    for r in cust:
        k = r.c_custkey
        lat = ((k * 7919) % 14000) / 100.0 - 70.0
        lon = ((k * 104729) % 36000) / 100.0 - 180.0
        dlat = math.radians(lat - geo.REF_LAT)
        dlon = math.radians(lon - geo.REF_LON)
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(math.radians(geo.REF_LAT))
            * math.cos(math.radians(lat))
            * math.sin(dlon / 2) ** 2
        )
        km = round(2.0 * geo.EARTH_KM * math.asin(math.sqrt(a)), 3)
        by_nation.setdefault(r.c_nationkey, []).append(km)
    for r in rows:
        kms = by_nation[r.nationkey]
        assert r.n == len(kms)
        assert math.isclose(r.km_min, min(kms), abs_tol=2e-3)
        assert math.isclose(r.km_max, max(kms), abs_tol=2e-3)
        assert math.isclose(r.km_avg, sum(kms) / len(kms), abs_tol=2e-3)
        assert 0.0 <= r.km_min <= r.km_max <= math.pi * geo.EARTH_KM + 1


def test_point_in_polygon_against_shapely_free_raycast(spark, sf_dir):
    rows = geo.q_geo_point_in_polygon(spark, sf_dir).collect()

    def inside(lon, lat):
        n, cnt = len(geo.POLY), 0
        for i in range(n):
            x1, y1 = geo.POLY[i]
            x2, y2 = geo.POLY[(i + 1) % n]
            if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (
                y2 - y1
            ) + x1:
                cnt += 1
        return cnt % 2 == 1

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    truth = {}
    for r in cust:
        k = r.c_custkey
        lat = ((k * 7919) % 14000) / 100.0 - 70.0
        lon = ((k * 104729) % 36000) / 100.0 - 180.0
        a, b = truth.get(r.c_nationkey, (0, 0))
        truth[r.c_nationkey] = (a + 1, b + inside(lon, lat))
    assert sum(b for _, b in truth.values()) > 0  # polygon is not empty
    for r in rows:
        assert (r.n, r.n_inside) == truth[r.nationkey]


def test_ipv4_roundtrip_and_range(spark, sf_dir):
    rows = ipfns.q_ipv4_functions_suite(spark, sf_dir).collect()
    assert rows
    total = in_range = 0
    for r in rows:
        assert 10 * 256 <= r.subnet16 < 11 * 256
        for ip in (r.ip_min, r.ip_max):
            parts = [int(x) for x in ip.split(".")]
            assert len(parts) == 4 and parts[0] == 10
            assert all(0 <= p <= 255 for p in parts)
        total += r.n_hosts
        in_range += r.n_in_range
        # /9 membership is a pure function of the /16 prefix
        expected = r.n_hosts if (r.subnet16 % 256) >= 128 else 0
        assert r.n_in_range == expected
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert total == n_cust
    assert 0 < in_range < total


def test_quantile_disc_ordering(spark, sf_dir):
    rows = stats.q_quantile_disc(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(r.l_quantity)
    for r in rows:
        xs = sorted(by_flag[r.l_returnflag])
        n = len(xs)
        assert r.p25 == xs[math.ceil(n / 4) - 1]
        assert r.p50 == xs[math.ceil(n / 2) - 1]
        assert r.p75 == xs[math.ceil(3 * n / 4) - 1]
        assert r.p25 <= r.p50 <= r.p75
        from collections import Counter

        cnt = Counter(by_flag[r.l_returnflag])
        best = max(cnt.values())
        assert r.mode_x == min(x for x, c in cnt.items() if c == best)
