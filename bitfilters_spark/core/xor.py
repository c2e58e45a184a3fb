"""XOR filter kernel (8- and 16-bit fingerprints), numpy-vectorized.

Same query surface as the reference's ``xor8_filter`` / ``xor16_filter``
aggregates and ``*_contains`` scalars (``bitfilters_xor_filter.cpp``, backed
by the public fastfilter library): build a static filter from a set of u64
hashes, probe with no false negatives and ~2^-bits false-positive rate at
~1.23 bytes*(bits/8) per element.

This is an independent implementation from the XOR-filter paper
(arXiv:1912.08258): three equal blocks, one slot per block per key, peeling
construction (see ``peeling.py``).  Blob layout (ours, little-endian)::

    b"XORF" | bits:u8 | seed:u64 | block_length:u64 | fingerprints[3*bl]

Membership: ``fp(h) == B[p0] ^ B[p1] ^ B[p2]``.
"""

from __future__ import annotations

import numpy as np

from .hashing import murmur_mix
from .peeling import assign, peel

_MAGIC = b"XORF"


def _rot64(x: np.ndarray, k: int) -> np.ndarray:
    k = np.uint64(k)
    with np.errstate(over="ignore"):
        return (x << k) | (x >> (np.uint64(64) - k))


def _positions(hashes: np.ndarray, seed: int, bl: int) -> tuple[np.ndarray, np.ndarray]:
    """Returns ((3, n) positions, (n,) mixed hash)."""
    hs = murmur_mix(hashes.astype(np.uint64) ^ np.uint64(seed))
    blu = np.uint64(bl)
    p0 = (hs % blu).astype(np.int64)
    p1 = (np.int64(bl) + (_rot64(hs, 21) % blu).astype(np.int64))
    p2 = (np.int64(2 * bl) + (_rot64(hs, 42) % blu).astype(np.int64))
    return np.stack([p0, p1, p2]), hs


def _fingerprint(hs: np.ndarray, bits: int) -> np.ndarray:
    fp = (hs ^ (hs >> np.uint64(32))) & np.uint64((1 << bits) - 1)
    return fp.astype(np.uint8 if bits == 8 else np.uint16)


def xor_build(hashes: np.ndarray, bits: int = 8, max_attempts: int = 32) -> bytes:
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    keys = np.unique(hashes.astype(np.uint64))
    n = len(keys)
    bl = max(16, int(np.ceil((32 + 1.23 * max(n, 1)) / 3)))
    for attempt in range(max_attempts):
        seed_in = (0x9E3779B97F4A7C15 * (attempt + 1)) & 0xFFFFFFFFFFFFFFFF
        seed = int(murmur_mix(np.array([seed_in], dtype=np.uint64))[0])
        pos, hs = _positions(keys, seed, bl)
        rounds = peel(pos, 3 * bl) if n else []
        if rounds is None:
            # occasional peel failure: grow a little and retry with new seed
            bl = int(bl * 1.1) + 1
            continue
        fp = _fingerprint(hs, bits) if n else np.zeros(0, np.uint8 if bits == 8 else np.uint16)
        B = assign(rounds, pos, fp, 3 * bl, np.uint8 if bits == 8 else np.uint16)
        head = _MAGIC + np.uint8(bits).tobytes() + np.array([seed, bl], dtype="<u8").tobytes()
        return head + B.astype("<u1" if bits == 8 else "<u2").tobytes()
    raise RuntimeError(f"xor{bits} filter construction failed after {max_attempts} attempts")


def xor_deserialize(blob: bytes):
    if blob[:4] != _MAGIC:
        raise ValueError("not an XORF blob")
    bits = int(blob[4])
    seed, bl = (int(x) for x in np.frombuffer(blob[5:21], dtype="<u8"))
    B = np.frombuffer(blob[21:], dtype="<u1" if bits == 8 else "<u2")
    return bits, seed, bl, B


def xor_probe(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    bits, seed, bl, B = xor_deserialize(blob)
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    pos, hs = _positions(hashes.astype(np.uint64), seed, bl)
    fp = _fingerprint(hs, bits)
    return (B[pos[0]] ^ B[pos[1]] ^ B[pos[2]]) == fp
