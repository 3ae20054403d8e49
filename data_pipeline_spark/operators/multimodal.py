"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested — schema, partition-size
control, Arrow-batched mapInPandas transforms with correct batch
shapes — while the actual codec work is stubbed (the container has no
image/audio libraries).  Swap `_decode_stub` for a PIL/ffmpeg call in
production; nothing else changes.

Scale notes: binary payloads dominate row size, so `rows_per_batch`
(Arrow batch height) and `spark.sql.files.maxPartitionBytes` are the
knobs that keep executor memory bounded; never collect; feature
extraction emits fixed-size vectors so downstream tables are columnar
and compact.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("width", IntegerType()),     # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),  # fixed-dim embedding
    ]
)

FEATURE_DIM = 16


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB for the real decoder (PIL / librosa / ffmpeg are not in this
    container).  Deterministic fake: a fixed-dim feature from byte
    statistics — keeps tests meaningful (same bytes → same feature)
    without pretending to decode media.

    Production: raise NotImplementedError here and implement per-kind
    decode → resize/frame-sample → model feature extraction.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    # bucket byte histogram down to FEATURE_DIM deterministic stats
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return (hist / max(len(arr), 1)).astype(np.float32)


def extract_features(
    media: DataFrame, rows_per_batch: int | None = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batch height must be capped (maxRecordsPerBatch) so a
    partition of large blobs cannot blow worker memory.  That conf is
    session-wide (Spark has no per-operation Arrow batch size) and must
    hold at EXECUTION time — so it belongs to session construction
    (``build_session(arrow_max_records=...)``), NOT here: a transform
    builder silently re-configuring the session would surprise
    concurrent callers.  This builder only CHECKS: if the session's cap
    exceeds ``rows_per_batch`` it warns with the fix; pass
    rows_per_batch=None to skip the check."""
    spark = media.sparkSession
    if rows_per_batch is not None:
        current = int(
            spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        )
        if current > rows_per_batch:
            import warnings

            warnings.warn(
                f"Arrow maxRecordsPerBatch={current} exceeds the recommended "
                f"cap for binary media payloads ({rows_per_batch}); a batch "
                "of large blobs can exhaust python-worker memory.  Set "
                f"build_session(arrow_max_records={rows_per_batch}) for "
                "media-heavy sessions.",
                stacklevel=2,
            )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows via sequence/explode — pure metadata expansion (the decode of
    each frame is the stubbed step above)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )
