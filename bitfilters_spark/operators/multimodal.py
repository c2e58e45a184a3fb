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
    BinaryType,
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """STUB resize: a real implementation would decode, resample and
    re-encode (PIL.Image.resize); the fake deterministically re-encodes the
    payload to ``width*height // 64`` bytes by cycling the source bytes.
    The production mechanics — binary in/binary out mapInPandas, Arrow
    batches, per-partition parallelism — are real."""
    target = max(1, width * height // 64)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[payload_col]:
                src = np.frombuffer(bytes(b) if b is not None else b"\0", dtype=np.uint8)
                if not len(src):
                    src = np.zeros(1, dtype=np.uint8)
                resized = src[np.arange(target) % len(src)]
                out.append(resized.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """STUB frame sampler ("video" payload -> k frames). Deterministic
    fake: a payload of L bytes yields k = (L % 4) + 1 frames of L // k
    bytes each — so the row-explosion shape (1 input row -> k output rows
    through mapInPandas) is real and the result is oracle-expressible."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                L = len(b) if b is not None else 0
                k = (L % 4) + 1
                for f in range(k):
                    ids.append(int(i))
                    idxs.append(f)
                    sizes.append(L // k)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "n_bytes": sizes})

    return df.select(id_col, payload_col).mapInPandas(frames, schema=FRAME_SCHEMA)


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
