"""Multimodal binary-column plumbing: metadata expressions, the
mapInPandas decode kernel's determinism, and the NotImplementedError
seam for formats with no codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.operators import multimodal


def test_metadata_matches_payload(spark, sf_dir):
    out = multimodal.q_multimodal_metadata(spark, sf_dir).limit(20).collect()
    assert len(out) > 0
    for r in out:
        assert len(r.sha256_hex) == 64
        assert 16 <= r.fake_width < 528
        assert r.n_bytes > 0


def test_decode_kernel_deterministic(spark, sf_dir):
    a = multimodal.q_multimodal_decode(spark, sf_dir).collect()
    b = multimodal.q_multimodal_decode(spark, sf_dir).collect()
    assert a == b
    for r in a:
        assert r.status == "decoded_stub"
        assert 0.0 <= r.byte_mean <= 255.0


def test_unknown_format_raises(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01"), "image/jpeg")],
        "doc_id long, payload binary, media_format string",
    )
    out = df.mapInPandas(multimodal.decode_features, schema=multimodal.DECODE_SCHEMA)
    with pytest.raises(Exception, match="no codec"):
        out.collect()


def test_decode_feature_values(spark):
    # payload bytes [0, 255] → mean 127.5, min 0, max 255
    df = spark.createDataFrame(
        [(1, bytearray([0, 255]), multimodal.FAKE_FORMAT)],
        "doc_id long, payload binary, media_format string",
    )
    r = (
        df.mapInPandas(multimodal.decode_features, schema=multimodal.DECODE_SCHEMA)
        .select(F.element_at("features", 1).alias("mean"),
                F.element_at("features", 3).alias("mn"),
                F.element_at("features", 4).alias("mx"))
        .collect()[0]
    )
    assert (r.mean, r.mn, r.mx) == (127.5, 0.0, 255.0)
