"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY §7.6, beyond-reference surface).

Spark-side plumbing is real and tested: schema (`binary` payload +
metadata struct), Arrow-batched decode/feature UDFs over `mapInPandas`,
partition sizing for large blobs. The actual codec calls are STUBBED —
image/audio libraries are not in this container — behind
`NotImplementedError` or a deterministic fake, clearly marked.

SCALE:
- Blobs ride in parquet binary columns; `rebatch_for_blobs` keeps Arrow
  record batches small so a partition of large blobs fits executor
  memory (`spark.sql.execution.arrow.maxRecordsPerBatch` is the global
  knob; per-operator we repartition by count).
- Decode is embarrassingly parallel → mapInPandas, no shuffle.
- Frame-sampling/fingerprints reduce early (project small features
  before any join/agg so blobs never shuffle).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def rebatch_for_blobs(df: DataFrame, rows_per_partition: int = 1000) -> DataFrame:
    """Right-size partitions for large binary payloads so a partition's
    blobs fit in executor memory (the multimodal analog of the
    reference's nline mapper-sizing, io/nline.clj:8-19)."""
    n = max(1, df.count() // rows_per_partition)
    return df.repartition(n)


def binary_fingerprint(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact-dedup fingerprint for blobs — JVM-side md5 over binary, no
    Python. The blob itself never shuffles; only (id, fp)."""
    return df.withColumn("fp", F.md5(F.col(payload_col)))


def decode_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Image decode → feature vector via Arrow-batched mapInPandas.

    STUB: the decode step uses a deterministic fake (sha256-seeded
    pseudo-features) because no image codec ships in this container;
    swap `_fake_decode` for PIL/libvips in production. The Spark-side
    contract (schema, batching, null handling) is the real deliverable.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def _fake_decode(payload: bytes) -> list[float]:
        digest = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in digest[:16]]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p) if p is not None else None for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(decode, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — NOT IMPLEMENTED in this container (no
    codec). The signature and partitioning contract are fixed here so
    callers can pipeline against it."""
    raise NotImplementedError(
        "image resize requires an image codec (PIL/libvips) not present "
        "in this environment; use decode_image_features' stub pattern"
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling operator — NOT IMPLEMENTED (no video codec). The
    plumbing contract: input MEDIA_SCHEMA rows, output one row per
    sampled frame (media_id, frame_idx, payload)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav, not present; "
        "plumbing contract documented in docstring"
    )
