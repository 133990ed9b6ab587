"""Z-order layout: encoding bijectivity and the measurable 2-D pruning
advantage of Morton-clustered files over a 1-D sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators import zorder


def _morton_py(x: int, y: int, bits: int = zorder.ZBITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_and_inverts(spark, sf_dir):
    rows = zorder.q_zorder_key_orders(spark, sf_dir).limit(200).collect()
    assert rows
    for r in rows:
        assert r.zval == _morton_py(r.xdim, r.ydim)
        assert (r.xback, r.yback) == (r.xdim, r.ydim)


def test_zorder_files_prune_2d_better_than_1d(spark, sf_dir, tmp_path):
    """A 2-D range predicate must overlap fewer Morton-clustered files
    than date-sorted ones.  Dims are min/max-normalized to a shared
    10-bit domain first (standard z-order practice — unbalanced bit
    widths degenerate the curve toward a 1-D sort), then both layouts
    write 8 range-sorted files and a set of x-selective probe
    rectangles counts file-envelope overlaps."""
    from clickhouse_vs_dbt_spark.catalog import load_table

    BITS, DOM = 10, 1 << 10
    raw = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("xr"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
        ).alias("yr"),
    )
    b = raw.agg(
        F.min("xr"), F.max("xr"), F.min("yr"), F.max("yr")
    ).first()
    xmin, xmax, ymin, ymax = b
    orders = raw.select(
        "o_orderkey",
        ((F.col("xr") - xmin) * DOM / (xmax - xmin + 1)).cast("long").alias("x"),
        ((F.col("yr") - ymin) * DOM / (ymax - ymin + 1)).cast("long").alias("y"),
    )
    zcol = F.expr(zorder.zvalue_expr("x", "y", bits=BITS))

    zpath, dpath = str(tmp_path / "zord"), str(tmp_path / "dsort")
    zorder.write_zordered(orders, zcol, zpath, n_files=8)
    (
        orders.repartitionByRange(8, "y")
        .sortWithinPartitions("y")
        .write.mode("overwrite")
        .parquet(dpath)
    )

    def overlaps(path: str) -> int:
        per_file = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            )
            .collect()
        )
        assert len(per_file) >= 4
        # x-selective probes (64 wide) across the y axis: the workload a
        # date-only sort cannot prune on
        total = 0
        for px in range(0, DOM, 256):
            for py in range(0, DOM, 512):
                total += sum(
                    1
                    for r in per_file
                    if r.x1 >= px and r.x0 <= px + 63
                    and r.y1 >= py and r.y0 <= py + 511
                )
        return total

    z, d = overlaps(zpath), overlaps(dpath)
    assert z < d, (z, d)
