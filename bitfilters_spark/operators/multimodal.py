"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. The Spark-side mechanics — schema, Arrow batch shape,
``mapInPandas`` partitioned decode, deterministic partitioning — are real
and tested; the actual codec calls are STUBBED (the container has no
image/audio libraries) behind ``_decode_payload``, which implements a
deterministic fake parse so pipelines are end-to-end testable.  Swap the
body of ``_decode_payload`` for PIL/libav calls in production.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMATS = ("png", "jpeg", "webp")

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def _decode_payload(payload: bytes) -> tuple:
    """STUB decoder — deterministic fake "header parse".

    Real implementation would be e.g. ``PIL.Image.open(io.BytesIO(b))``.
    The fake derives metadata purely from byte content so results are
    reproducible (and oracle-expressible for tests)."""
    if not payload:
        return ("png", 0, 0, 0)
    fmt = FORMATS[len(payload) % 3]
    width = (payload[0] % 16) * 16 + 16
    height = (len(payload) % 16) * 16 + 16
    return (fmt, width, height, len(payload))


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload column (stand-in for real image bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_media_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode payload headers into typed metadata via mapInPandas."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_payload(bytes(b) if b is not None else b"") for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "n_bytes": [m[3] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=MEDIA_META_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """STUB feature extractor: deterministic byte-histogram features in the
    shape a real encoder (CLIP, wav2vec, ...) would produce. The Arrow
    batching / array<float> schema / partition parallelism are the real
    production mechanics."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[payload_col]:
                arr = np.frombuffer(bytes(b) if b is not None else b"", dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
                total = hist.sum() or 1.0
                out.append((hist / total).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(dtype=np.int64), "features": out}
            )

    return df.select(id_col, payload_col).mapInPandas(feats, schema=FEATURE_SCHEMA)
