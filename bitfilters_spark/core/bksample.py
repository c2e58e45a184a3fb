"""Bottom-k hash sample sketch — the *row sample* member of the
mergeable-sketch family (bloom: membership, CMS: frequency, KMV:
cardinality, BKS: a uniform row sample with payload).

Keeps the ``(hash, value)`` pairs for the k smallest DISTINCT key
hashes — coordinated bottom-k sampling (Cohen & Kaplan, *Summarizing
data using bottom-k sketches*, PODC 2007).  Because membership in the
sample depends only on each key's hash, the sketch is order-independent
and mergeable with the family's algebra:
``merge(build(A), build(B)) == build(A ∪ B)`` byte-for-byte.  The kept
values are a uniform-without-replacement sample of the group's rows, so
any plug-in statistic (quantiles, mean, histogram) over them estimates
the group's value distribution — and, like every sketch here, the
result is DETERMINISTIC: an external engine reproduces it exactly by
ranking rows on the same hash (``QUALIFY row_number() OVER (ORDER BY
hash(key)) <= k`` + the same nearest-rank quantile arithmetic).

Duplicate key hashes keep the smallest value (an associative tie rule
so merge order can't matter); pass a unique row key for row-sampling
semantics.

Blob format (little-endian):
``BKS1 | u32 k | u32 m | u64 hashes[m] | i64 values[m]`` — hashes
ascending and distinct, values aligned.
"""

from __future__ import annotations

import math

import numpy as np

BKS_MAGIC = b"BKS1"


def _reduce(hashes: np.ndarray, values: np.ndarray, k: int):
    """Sort by (hash, value), drop duplicate hashes (keep min value),
    truncate to k."""
    order = np.lexsort((values, hashes))
    h = hashes[order]
    v = values[order]
    if len(h):
        keep = np.concatenate([[True], h[1:] != h[:-1]])
        h, v = h[keep], v[keep]
    return h[:k], v[:k]


def bks_build(hashes: np.ndarray, values: np.ndarray, k: int = 128) -> bytes:
    if k < 1:
        raise ValueError("k must be >= 1")
    h = hashes.astype(np.uint64, copy=False)
    v = values.astype(np.int64, copy=False)
    if len(h) != len(v):
        raise ValueError("hashes and values must align")
    return bks_serialize(k, *_reduce(h, v, k))


def bks_serialize(k: int, hashes: np.ndarray, values: np.ndarray) -> bytes:
    head = np.array([k, len(hashes)], dtype="<u4").tobytes()
    return (
        BKS_MAGIC
        + head
        + hashes.astype("<u8").tobytes()
        + values.astype("<i8").tobytes()
    )


def bks_deserialize(blob: bytes):
    if blob[:4] != BKS_MAGIC:
        raise ValueError("not a BKS1 blob")
    k, m = (int(x) for x in np.frombuffer(blob[4:12], dtype="<u4"))
    need = 12 + 16 * m
    if len(blob) < need:
        raise ValueError(f"corrupt BKS blob: {len(blob)} bytes < {need}")
    h = np.frombuffer(blob[12 : 12 + 8 * m], dtype="<u8")
    v = np.frombuffer(blob[12 + 8 * m : need], dtype="<i8")
    return k, h, v


def bks_merge(blobs: list) -> bytes:
    parts = [bks_deserialize(b) for b in blobs]
    ks = {k for k, _, _ in parts}
    if len(ks) != 1:
        raise ValueError(f"cannot merge BKS blobs with different k: {sorted(ks)}")
    (k,) = ks
    h = np.concatenate([p[1] for p in parts]).astype(np.uint64)
    v = np.concatenate([p[2] for p in parts]).astype(np.int64)
    return bks_serialize(k, *_reduce(h, v, k))


def bks_sample_values(blob: bytes) -> np.ndarray:
    """The sampled values (hash order — i.e. uniformly shuffled)."""
    _, _, v = bks_deserialize(blob)
    return v


def bks_quantile(blob: bytes, q: float) -> int | None:
    """Nearest-rank quantile of the sampled values: the
    ``max(1, ceil(q * m))``-th smallest of the m kept values (exact group
    quantile whenever the sketch is under capacity). None for an empty
    sketch.  The same arithmetic in SQL:
    ``greatest(1, ceil(q * m))``-th by ``row_number() OVER (ORDER BY v)``.
    """
    _, _, v = bks_deserialize(blob)
    m = len(v)
    if m == 0:
        return None
    idx = max(1, math.ceil(q * m))
    return int(np.sort(v)[idx - 1])
