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
        assert r.status == "decoded_bytes"
        assert r.media_format == "text/plain"
        assert 0.0 <= r.byte_mean <= 255.0
        assert 0.0 < r.simpson <= 1.0


def test_codec_format_raises(spark):
    """A real media container (sniffed from magic bytes) hits the
    NotImplementedError seam — byte stats alone are not a decode."""
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0rest-of-jpeg"))],
        "doc_id long, payload binary",
    )
    out = df.mapInPandas(multimodal.decode_features, schema=multimodal.DECODE_SCHEMA)
    with pytest.raises(Exception, match="no codec"):
        out.collect()


def test_sniff_formats():
    assert multimodal.sniff_format(b"\x89PNG\r\n\x1a\nxxxx") == "image/png"
    assert multimodal.sniff_format(b"GIF89a....") == "image/gif"
    assert multimodal.sniff_format(b"\x00\x00\x00\x20ftypisom") == "video/mp4"
    assert multimodal.sniff_format(b"plain ascii text\n") == "text/plain"
    assert multimodal.sniff_format(b"\x00\x01\x02\x03ranDom") == "application/octet-stream"
    # offset-4 brand check must not misfire when the prefix is a magic
    assert multimodal.sniff_format(b"OggSftyp") == "audio/ogg"


def test_decode_feature_values(spark):
    # bytes [0, 255]: mean 127.5, std 127.5, simpson (1+1)/4 = 0.5,
    # 2 distinct bytes, min 0, max 255, octet-stream (unprintables)
    df = spark.createDataFrame(
        [(1, bytearray([0, 255]))], "doc_id long, payload binary"
    )
    r = (
        df.mapInPandas(multimodal.decode_features, schema=multimodal.DECODE_SCHEMA)
        .collect()[0]
    )
    assert (r.byte_mean, r.byte_std, r.simpson) == (127.5, 127.5, 0.5)
    assert (r.distinct_bytes, r.byte_min, r.byte_max) == (2, 0, 255)
    assert r.media_format == "application/octet-stream"
