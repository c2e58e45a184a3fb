"""KMV (k-minimum-values) sketch — the distinct-count member of the
mergeable-sketch family (bloom: membership, CMS: frequency, KMV:
cardinality; all share the two-phase partial-build algebra:
merge(build(A), build(B)) == build(A ∪ B)).

Blob format (little-endian): ``KMV1 | u32 k | u32 m | u64 values[m]`` —
the m <= k smallest DISTINCT key hashes, ascending. Merge unions the
value sets and keeps the k smallest. Estimate:

* m < k  → the sketch saw every distinct hash: estimate = m, EXACT.
* m == k → theta = kth-min / 2^64, estimate = (k-1)/theta, computed as
  ``(k-1) * 2^64 // kth_min`` in arbitrary-precision INTEGER arithmetic —
  deterministic and reproducible bit-for-bit by an external engine
  (HUGEINT in SQL), no float rounding to diverge on.
"""

from __future__ import annotations

import numpy as np

KMV_MAGIC = b"KMV1"


def kmv_build(hashes: np.ndarray, k: int = 64) -> bytes:
    if k < 2:
        raise ValueError("k must be >= 2")
    vals = np.unique(hashes.astype(np.uint64, copy=False))[:k]  # unique sorts
    return kmv_serialize(k, vals)


def kmv_serialize(k: int, vals: np.ndarray) -> bytes:
    head = np.array([k, len(vals)], dtype="<u4").tobytes()
    return KMV_MAGIC + head + vals.astype("<u8").tobytes()


def kmv_deserialize(blob: bytes) -> tuple:
    if blob[:4] != KMV_MAGIC:
        raise ValueError("not a KMV1 blob")
    k, m = (int(x) for x in np.frombuffer(blob[4:12], dtype="<u4"))
    need = 12 + 8 * m
    if len(blob) < need:
        raise ValueError(f"corrupt KMV blob: {len(blob)} bytes < {need}")
    return k, np.frombuffer(blob[12:need], dtype="<u8")


def kmv_merge(blobs: list) -> bytes:
    parts = [kmv_deserialize(b) for b in blobs]
    ks = {k for k, _ in parts}
    if len(ks) != 1:
        raise ValueError(f"cannot merge KMV blobs with different k: {sorted(ks)}")
    (k,) = ks
    vals = np.unique(np.concatenate([v for _, v in parts]))[:k]
    return kmv_serialize(k, vals)


def kmv_overlap(blob_a: bytes, blob_b: bytes) -> tuple:
    """Set-operation estimates from two sketches WITHOUT touching rows:
    ``(k_eff, n_both, union_est)``.

    Standard KMV combine: merge the two value sets, keep the
    ``k_eff = min(k_a, k_b)`` smallest; every kept value is a uniform
    sample of the union, so the count present in BOTH sketches over
    ``k_eff`` estimates the Jaccard similarity, and ``union_est`` is the
    plain KMV estimate of the merged sketch. All integers — an external
    engine reproduces the numbers exactly.
    """
    ka, va = kmv_deserialize(blob_a)
    kb, vb = kmv_deserialize(blob_b)
    k_eff = min(ka, kb)
    merged = np.unique(np.concatenate([va, vb]))[:k_eff]
    if len(merged) == 0:
        return (k_eff, 0, 0)
    both = int((np.isin(merged, va) & np.isin(merged, vb)).sum())
    if len(merged) < k_eff:
        union_est = len(merged)
    else:
        kth = int(merged[k_eff - 1])
        union_est = (k_eff - 1) * (1 << 64) // kth if kth else len(merged)
    return (k_eff, both, union_est)


def kmv_estimate(blob: bytes) -> int:
    """Deterministic distinct-count estimate (exact when the sketch is not
    full)."""
    k, vals = kmv_deserialize(blob)
    if len(vals) < k:
        return len(vals)
    kth = int(vals[k - 1])
    if kth == 0:
        return len(vals)
    return (k - 1) * (1 << 64) // kth
