"""Binary Fuse filter kernel (8- and 16-bit fingerprints), numpy-vectorized.

Query surface of the reference's ``binary_fuse8_filter`` /
``binary_fuse16_filter`` aggregates and ``*_contains`` scalars
(``bitfilters_binary_fuse_filter.cpp``).  Independent implementation of the
segmented 3-wise construction from the Binary Fuse paper (arXiv:2201.01174):
keys map to one slot in each of three *consecutive* segments (better cache
locality and ~1.125 space factor vs 1.23 for classic XOR); construction is
the same peeling as XOR filters (``peeling.py``).

Blob layout (ours, little-endian)::

    b"BFUS" | bits:u8 | seed:u64 | segment_length:u64 | segment_count:u64
            | fingerprints[segment_count * segment_length]
"""

from __future__ import annotations

import numpy as np

from .hashing import murmur_mix
from .peeling import assign, peel

_MAGIC = b"BFUS"


def _rot64(x: np.ndarray, k: int) -> np.ndarray:
    k = np.uint64(k)
    with np.errstate(over="ignore"):
        return (x << k) | (x >> (np.uint64(64) - k))


def _geometry(n: int, factor: float) -> tuple[int, int]:
    """(segment_length, segment_count) for n keys with a size slack factor."""
    n = max(n, 1)
    # paper-style segment length: grows sub-linearly with n, power of two
    sl_log = int(np.floor(np.log(n) / np.log(3.33) + 2.25)) if n > 1 else 3
    sl = 1 << min(max(sl_log, 3), 18)
    capacity = int(np.ceil(n * factor)) + 3 * sl
    sc = max(3, int(np.ceil(capacity / sl)))
    return sl, sc


def _positions(hashes: np.ndarray, seed: int, sl: int, sc: int):
    hs = murmur_mix(hashes.astype(np.uint64) ^ np.uint64(seed))
    slu = np.uint64(sl)
    start = (murmur_mix(hs ^ np.uint64(0xA5A5A5A5A5A5A5A5)) % np.uint64(sc - 2)).astype(np.int64)
    p0 = start * sl + (hs % slu).astype(np.int64)
    p1 = (start + 1) * sl + (_rot64(hs, 21) % slu).astype(np.int64)
    p2 = (start + 2) * sl + (_rot64(hs, 42) % slu).astype(np.int64)
    return np.stack([p0, p1, p2]), hs


def _fingerprint(hs: np.ndarray, bits: int) -> np.ndarray:
    fp = (hs ^ (hs >> np.uint64(32))) & np.uint64((1 << bits) - 1)
    return fp.astype(np.uint8 if bits == 8 else np.uint16)


def fuse_build(hashes: np.ndarray, bits: int = 8, max_attempts: int = 40) -> bytes:
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    keys = np.unique(hashes.astype(np.uint64))
    n = len(keys)
    factor = 1.125 if n >= 1000 else 1.4
    for attempt in range(max_attempts):
        sl, sc = _geometry(n, factor)
        seed_in = (0xC2B2AE3D27D4EB4F * (attempt + 1)) & 0xFFFFFFFFFFFFFFFF
        seed = int(murmur_mix(np.array([seed_in], dtype=np.uint64))[0])
        pos, hs = _positions(keys, seed, sl, sc) if n else (np.zeros((3, 0), np.int64), np.zeros(0, np.uint64))
        rounds = peel(pos, sl * sc) if n else []
        if rounds is None:
            if attempt % 4 == 3:  # grow slack if several seeds fail
                factor *= 1.12
            continue
        dt = np.uint8 if bits == 8 else np.uint16
        B = assign(rounds, pos, _fingerprint(hs, bits), sl * sc, dt)
        head = _MAGIC + np.uint8(bits).tobytes() + np.array([seed, sl, sc], dtype="<u8").tobytes()
        return head + B.astype("<u1" if bits == 8 else "<u2").tobytes()
    raise RuntimeError(f"binary_fuse{bits} construction failed after {max_attempts} attempts")


def fuse_deserialize(blob: bytes):
    if blob[:4] != _MAGIC:
        raise ValueError("not a BFUS blob")
    bits = int(blob[4])
    seed, sl, sc = (int(x) for x in np.frombuffer(blob[5:29], dtype="<u8"))
    B = np.frombuffer(blob[29:], dtype="<u1" if bits == 8 else "<u2")
    return bits, seed, sl, sc, B


def fuse_probe(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    bits, seed, sl, sc, B = fuse_deserialize(blob)
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    pos, hs = _positions(hashes.astype(np.uint64), seed, sl, sc)
    fp = _fingerprint(hs, bits)
    return (B[pos[0]] ^ B[pos[1]] ^ B[pos[2]]) == fp
