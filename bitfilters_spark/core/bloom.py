"""Bloom filter kernels (numpy, vectorized).

Two variants:

* **DuckDB-format bloom** — byte-compatible with the blob produced by the
  reference's ``bitfilters_duckdb_bloom_filter_create``
  (``bitfilters_duckdb_bloom_filter.cpp:506-516``): little-endian
  ``[uint64 num_sectors][uint64 sectors...]``; insert sets a 4-bit mask in
  sector ``h & (num_sectors-1)``, mask bits taken from hash bytes 4..7
  (each ``& 0x3F`` → bit position), probe requires all mask bits present.

* **Generic bloom** — classic k-hash-function bloom over an m-bit array,
  parameterized by (expected n, target fpp), double-hashing position
  derivation. This realizes the reference's (source-present, test-disabled)
  ``bloomfilter(n, fpp, v)`` surface (``bitfilters_bloom_filter.cpp``).

Both are **mergeable** (bitwise OR), which is what makes the two-phase
distributed build (partial bitmap per partition → OR-merge per group) work
at 100 TB scale: the shuffle carries one small bitmap per (partition, group)
instead of every row.
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import murmur_mix

# ---------------------------------------------------------------- duckdb ---


def duckdb_bloom_mask(h: np.ndarray) -> np.ndarray:
    """4-bit-set sector mask from hash bytes 4..7 (vectorized)."""
    h = h.astype(np.uint64, copy=False)
    one = np.uint64(1)
    m = np.zeros_like(h)
    for byte_idx in (4, 5, 6, 7):
        bit = (h >> np.uint64(byte_idx * 8)) & np.uint64(0x3F)
        m |= one << bit
    return m


def duckdb_bloom_build(hashes: np.ndarray, num_sectors: int) -> np.ndarray:
    """Return the uint64 sector array with all hashes inserted."""
    if num_sectors <= 0 or num_sectors & (num_sectors - 1):
        raise ValueError("num_sectors must be a power of 2")
    sectors = np.zeros(num_sectors, dtype=np.uint64)
    if len(hashes):
        h = hashes.astype(np.uint64, copy=False)
        idx = (h & np.uint64(num_sectors - 1)).astype(np.int64)
        np.bitwise_or.at(sectors, idx, duckdb_bloom_mask(h))
    return sectors


def duckdb_bloom_serialize(sectors: np.ndarray) -> bytes:
    return np.uint64(len(sectors)).tobytes() + sectors.astype("<u8").tobytes()


def duckdb_bloom_deserialize(blob: bytes) -> np.ndarray:
    if len(blob) < 8:
        raise ValueError("corrupt duckdb bloom blob: shorter than header")
    num_sectors = int(np.frombuffer(blob[:8], dtype="<u8")[0])
    if num_sectors <= 0 or num_sectors & (num_sectors - 1):
        raise ValueError("corrupt duckdb bloom blob: bad num_sectors")
    # mirror the reference's ParseBlob blob-too-short check
    # (bitfilters_duckdb_bloom_filter.cpp ParseBlob): a truncated blob must
    # error, not silently probe fewer sectors with a wrong index mask
    if len(blob) < 8 * (num_sectors + 1):
        raise ValueError(
            f"corrupt duckdb bloom blob: {len(blob)} bytes < {8 * (num_sectors + 1)} required"
        )
    return np.frombuffer(blob[8 : 8 + 8 * num_sectors], dtype="<u8")


def duckdb_bloom_probe(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    sectors = duckdb_bloom_deserialize(blob)
    h = hashes.astype(np.uint64, copy=False)
    idx = (h & np.uint64(len(sectors) - 1)).astype(np.int64)
    mask = duckdb_bloom_mask(h)
    return (sectors[idx] & mask) == mask


def duckdb_bloom_merge(blobs: list) -> bytes:
    """OR-merge serialized filters (all must share num_sectors)."""
    acc = None
    for b in blobs:
        s = duckdb_bloom_deserialize(bytes(b))
        if acc is None:
            acc = s.copy()
        elif len(acc) != len(s):
            raise ValueError("cannot merge bloom filters of different num_sectors")
        else:
            acc |= s
    if acc is None:
        raise ValueError("no filters to merge")
    return duckdb_bloom_serialize(acc)


# --------------------------------------------------------------- generic ---

_MAGIC = b"SBL1"


def bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for expected n elements at target false-positive rate."""
    n = max(1, int(n))
    fpp = min(max(fpp, 1e-9), 0.5)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 16)


def _positions(h: np.ndarray, k: int, m: int) -> np.ndarray:
    """(k, n) bit positions via Kirsch–Mitzenmacher double hashing."""
    h = h.astype(np.uint64, copy=False)
    h1 = h
    h2 = murmur_mix(h) | np.uint64(1)
    with np.errstate(over="ignore"):
        return np.stack(
            [((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64) for i in range(k)]
        )


def bloom_build(hashes: np.ndarray, n: int, fpp: float) -> np.ndarray:
    m, k = bloom_params(n, fpp)
    words = np.zeros(m // 64, dtype=np.uint64)
    if len(hashes):
        pos = _positions(hashes, k, m).reshape(-1)
        np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    return words


def bloom_serialize(words: np.ndarray, k: int) -> bytes:
    head = _MAGIC + np.array([len(words) * 64, k], dtype="<u8").tobytes()
    return head + words.astype("<u8").tobytes()


def bloom_deserialize(blob: bytes) -> tuple[np.ndarray, int, int]:
    if blob[:4] != _MAGIC:
        raise ValueError("not a SBL1 bloom blob")
    m, k = (int(x) for x in np.frombuffer(blob[4:20], dtype="<u8"))
    words = np.frombuffer(blob[20 : 20 + m // 8], dtype="<u8")
    return words, m, k


def bloom_probe(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    words, m, k = bloom_deserialize(blob)
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    pos = _positions(hashes, k, m)
    ok = np.ones(len(hashes), dtype=bool)
    for i in range(k):
        p = pos[i]
        ok &= (words[p >> 6] >> (p.astype(np.uint64) & np.uint64(63))) & np.uint64(1) != 0
    return ok


def bloom_merge(blobs: list) -> bytes:
    acc = None
    k0 = m0 = None
    for b in blobs:
        words, m, k = bloom_deserialize(bytes(b))
        if acc is None:
            acc, m0, k0 = words.copy(), m, k
        elif (m, k) != (m0, k0):
            raise ValueError("cannot merge bloom filters with different (m, k)")
        else:
            acc |= words
    if acc is None:
        raise ValueError("no filters to merge")
    return bloom_serialize(acc, k0)
