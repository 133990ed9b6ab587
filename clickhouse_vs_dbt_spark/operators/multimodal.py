"""Multimodal-column plumbing (SURVEY.md §2.3): opaque ``binary``
payloads with typed metadata, decode/feature-extract as Arrow-batched
``mapInPandas`` — the schema, partitioning, UDF signature and batch
shape are real; only the codec call itself is stubbed (image/audio
libraries are not in this container).

Payloads are synthesized from ``documents.text`` (UTF-8 bytes) so the
pipeline is deterministic and the metadata operator stays
oracle-checkable (sha256/length agree across engines).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

FAKE_FORMAT = "synthetic/raw"
FEAT_DIM = 4


def with_payload(d: DataFrame) -> DataFrame:
    """Attach the opaque binary column + format tag (in a real pipeline
    this is the decoded file read from object storage)."""
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit(FAKE_FORMAT).alias("media_format"),
    )


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: byte length, sha256, and
    deterministic fake dimensions (pure arithmetic so the oracle can
    reproduce them) — all JVM-side expressions."""
    d = with_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "media_format",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256_hex"),
        (F.octet_length("payload") % 512 + 16).alias("fake_width"),
        ((F.octet_length("payload") * 7) % 512 + 16).alias("fake_height"),
    ).orderBy("doc_id")


O_MULTIMODAL_META = f"""
SELECT doc_id,
       '{FAKE_FORMAT}' AS media_format,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256_hex,
       octet_length(encode(text)) % 512 + 16 AS fake_width,
       (octet_length(encode(text)) * 7) % 512 + 16 AS fake_height
FROM documents ORDER BY doc_id
"""


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode/feature-extract kernel.

    Real codecs (PIL/libav/…) are unavailable in this container, so the
    decode step is STUBBED: ``synthetic/raw`` payloads produce a
    deterministic feature vector (byte-histogram moments); any other
    format raises NotImplementedError — the marked seam where a real
    decoder plugs in.  Everything around the stub (Arrow batching,
    schema contract, per-partition iteration) is the production path.
    """
    import numpy as np

    for pdf in batches:
        feats, status = [], []
        for fmt, payload in zip(pdf["media_format"], pdf["payload"]):
            if fmt != FAKE_FORMAT:
                raise NotImplementedError(
                    f"no codec for {fmt!r}: decode stub only handles {FAKE_FORMAT}"
                )
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            feats.append(
                [
                    float(b.mean()),
                    float(b.std()),
                    float(b.min()),
                    float(b.max()),
                ]
            )
            status.append("decoded_stub")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len),
                "status": status,
                "features": feats,
            }
        )


DECODE_SCHEMA = (
    "doc_id long, n_bytes long, status string, features array<double>"
)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pipeline: binary payloads → mapInPandas kernel → typed
    feature rows.  Rows-only driver check (the kernel is Python); the
    pytest suite pins determinism and the NotImplementedError seam."""
    d = with_payload(load_table(spark, sf_dir, "documents"))
    out = d.mapInPandas(decode_features, schema=DECODE_SCHEMA)
    return out.select(
        "doc_id",
        "n_bytes",
        "status",
        F.round(F.element_at("features", 1), 6).alias("byte_mean"),
        F.round(F.element_at("features", 2), 6).alias("byte_std"),
    ).orderBy("doc_id")


FRAME_BYTES = 64
FRAME_STRIDE = 4


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: treat the payload as a
    sequence of fixed-size frames and keep every 4th (the video
    keyframe-sampling shape).  Pure Catalyst — ``explode(sequence(...))``
    fans each payload out to its sampled frame indexes and binary
    ``substring`` slices the frame, so sampling runs JVM-side with no
    Python in the row path (a real codec only needs to replace the
    slice with a decode of it, as in :func:`decode_features`).

    Oracle note: payloads are UTF-8 of the ASCII-only fixture text, so
    DuckDB's varchar ``substring``/``sha256`` see identical bytes.
    """
    d = with_payload(load_table(spark, sf_dir, "documents"))
    n_frames = f"(octet_length(payload) + {FRAME_BYTES - 1}) div {FRAME_BYTES}"
    frame = f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})"
    return (
        d.select(
            "doc_id",
            "payload",
            F.explode(
                F.expr(f"sequence(0L, {n_frames} - 1, {FRAME_STRIDE})")
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.sha2(F.expr(frame), 256).alias("frame_sha"),
            F.octet_length(F.expr(frame)).alias("frame_bytes"),
        )
        .orderBy("doc_id", "frame_idx")
    )


O_FRAME_SAMPLE = f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, (length(text) + {FRAME_BYTES - 1}) // {FRAME_BYTES},
                      {FRAME_STRIDE})) AS frame_idx
  FROM documents)
SELECT doc_id, frame_idx,
       sha256(substring(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES})) AS frame_sha,
       length(substring(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES})) AS frame_bytes
FROM f ORDER BY doc_id, frame_idx
"""


QUERIES = {
    "multimodal_metadata": q_multimodal_metadata,
    "multimodal_decode_features": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
}

ORACLES = {
    "multimodal_metadata": O_MULTIMODAL_META,
    # multimodal_decode_features: rows-only (Python kernel; determinism
    # + error seam pinned in tests/test_multimodal.py).
    "multimodal_frame_sample": O_FRAME_SAMPLE,
}
