"""Count-min sketch kernel — the frequency member of the mergeable-sketch
family (membership filters estimate "is x present", CMS estimates "how
many times"; same two-phase build algebra as the bloom family: partial
sketches ADD, and merge(build(A), build(B)) == build(A ∪ B)).

Blob format (little-endian): ``CMS1 | u32 d | u32 w | u64 counts[d*w]``,
w a power of two. Row j buckets key-hash h at
``murmur_mix(h ^ SEED[j]) & (w - 1)`` — the full DuckDB finalizer, so an
external engine with hash parity can reproduce estimates EXACTLY
(deterministic overestimation: est(x) = min_j Σ count(y) over y colliding
with x in row j; always >= true count, equal when no row collides).
"""

from __future__ import annotations

import numpy as np

from .hashing import murmur_mix

CMS_MAGIC = b"CMS1"

# golden-ratio multiples: distinct, well-mixed u64 row seeds
SEEDS = [(0x9E3779B97F4A7C15 * (j + 1)) & 0xFFFFFFFFFFFFFFFF for j in range(16)]


def _row_index(hashes: np.ndarray, j: int, w: int) -> np.ndarray:
    return (murmur_mix(hashes ^ np.uint64(SEEDS[j])) & np.uint64(w - 1)).astype(
        np.int64
    )


def cms_counts(hashes: np.ndarray, d: int = 4, w: int = 16384) -> np.ndarray:
    """The (d, w) count matrix — the partial-aggregation state (matrices
    from disjoint row sets ADD)."""
    if not 1 <= d <= len(SEEDS):
        raise ValueError(f"d must be in [1, {len(SEEDS)}]")
    if w <= 0 or w & (w - 1):
        raise ValueError("w must be a power of 2")
    counts = np.zeros((d, w), dtype=np.uint64)
    h = hashes.astype(np.uint64, copy=False)
    for j in range(d):
        np.add.at(counts[j], _row_index(h, j, w), 1)
    return counts


def cms_build(hashes: np.ndarray, d: int = 4, w: int = 16384) -> bytes:
    return cms_serialize(cms_counts(hashes, d, w))


def cms_serialize(counts: np.ndarray) -> bytes:
    d, w = counts.shape
    head = np.array([d, w], dtype="<u4").tobytes()
    return CMS_MAGIC + head + counts.astype("<u8").tobytes()


def cms_deserialize(blob: bytes) -> np.ndarray:
    if blob[:4] != CMS_MAGIC:
        raise ValueError("not a CMS1 blob")
    d, w = np.frombuffer(blob[4:12], dtype="<u4")
    d, w = int(d), int(w)
    need = 12 + 8 * d * w
    if len(blob) < need:
        raise ValueError(f"corrupt CMS blob: {len(blob)} bytes < {need}")
    return np.frombuffer(blob[12:need], dtype="<u8").reshape(d, w)


def cms_merge(blobs: list) -> bytes:
    mats = [cms_deserialize(b) for b in blobs]
    shape = mats[0].shape
    if any(m.shape != shape for m in mats):
        raise ValueError("cannot merge CMS blobs with different (d, w)")
    with np.errstate(over="ignore"):
        total = np.zeros(shape, dtype=np.uint64)
        for m in mats:
            total += m
    return cms_serialize(total)


def cms_estimate(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    counts = cms_deserialize(blob)
    d, w = counts.shape
    h = hashes.astype(np.uint64, copy=False)
    est = np.full(len(h), np.iinfo(np.uint64).max, dtype=np.uint64)
    for j in range(d):
        est = np.minimum(est, counts[j][_row_index(h, j, w)])
    return est


def cms_join_size(blob_a: bytes, blob_b: bytes) -> int:
    """Equi-join output-size estimate from two CMS sketches alone — the
    classic CMS inner-product estimator (Cormode & Muthukrishnan 2005,
    §4.2): |A ⋈ B| = Σ_k a_k·b_k <= min_j Σ_i A[j,i]·B[j,i].  Row
    estimates only OVERcount (hash collisions add cross terms), so the
    min over the d rows is a deterministic UPPER bound, exact when no
    row has a colliding key pair — join planning ("will this join
    explode?") from metadata-scale blobs, before shuffling a single row.
    Requires identical (d, w) geometry (same build parameters).
    """
    A = cms_deserialize(blob_a)
    B = cms_deserialize(blob_b)
    if A.shape != B.shape:
        raise ValueError(
            f"geometry mismatch: {A.shape} vs {B.shape} — build both "
            "sketches with the same (d, w)"
        )
    # object dtype avoids u64 overflow on adversarial counts
    dots = [int(np.dot(A[j].astype(object), B[j].astype(object))) for j in range(A.shape[0])]
    return min(dots)
