"""Ribbon filter kernel (8- and 16-bit fingerprints) — the static AMQ the
reference family lacks a sibling for: same query surface as xor/fuse
(build from a set of u64 hashes; probe with no false negatives and
~2^-bits FP rate) at a smaller size multiplier (~1.07x vs xor's ~1.23x
space per fingerprint).

Independent implementation from the public papers: Dietzfelbinger &
Walzer's ribbon solving (efficient Gauss on a banded random matrix,
arXiv:1907.04750) and Dillinger & Walzer's "Ribbon filter: practically
smaller than Bloom and Xor" (arXiv:2103.02515). Each key maps to a start
slot ``s`` and a ``w=64``-bit coefficient vector ``c`` (bit 0 forced set,
so the matrix is banded with unit leading coefficients); building solves
``C · Z = fp`` by on-the-fly banded elimination + back-substitution, and
membership is ``fp(h) == XOR of Z[s+t] over set bits t of c``.

Blob layout (ours, little-endian)::

    b"RIBN" | bits:u8 | w:u8 | seed:u64 | m:u64 | Z[(m + w) * bits/8]

The solution-table length is the closed form ``m + w`` with
``m = max(w, ceil(n / 0.935))`` — deterministic in the distinct-hash
count n (seed retries change the seed, never the geometry), so
``filter_describe`` sizes are SQL-replayable like xor/fuse.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import murmur_mix

RIBBON_MAGIC = b"RIBN"
_W = 64  # ribbon width: one u64 coefficient word per key


def _alpha(n: int) -> float:
    """Size-aware load factor: a PLAIN ribbon's failure probability grows
    with the table (the longest-displacement tail scales with log m), so
    the slack must widen as n does — measured on this kernel: 0.935
    succeeds through ~200k keys but exhausts 32 seeds at 1.5M, where
    0.92 builds first-try. Stepwise with margin (deterministic in n, so
    the geometry stays a closed form); the sharded build path
    (``num_shards``) keeps sub-filters small enough for the dense end
    AND parallelizes the sequential insertion loop — that is the
    recommended route past ~1M keys."""
    if n <= 1 << 18:
        return 0.935
    if n <= 1 << 21:
        return 0.915
    return 0.90


def _geometry(n: int) -> int:
    """Solution slots BEFORE the +w tail; deterministic in n."""
    return max(_W, int(np.ceil(max(n, 1) / _alpha(max(n, 1)))))


def _key_rows(keys: np.ndarray, seed: int, m: int):
    """(starts, coefs, fps_source) for each key — all derived from
    independent mixes of the key hash; coefs have bit 0 forced set."""
    hs = murmur_mix(keys ^ np.uint64(seed))
    # start slot via multiply-shift onto [0, m): top 32 bits scale to m
    starts = ((hs >> np.uint64(32)) * np.uint64(m)) >> np.uint64(32)
    coefs = murmur_mix(hs ^ np.uint64(0xA0761D6478BD642F)) | np.uint64(1)
    fsrc = murmur_mix(hs ^ np.uint64(0xE7037ED1A0B428DB))
    return starts.astype(np.int64), coefs, fsrc


def _fingerprint(fsrc: np.ndarray, bits: int) -> np.ndarray:
    fp = fsrc & np.uint64((1 << bits) - 1)
    return fp.astype(np.uint8 if bits == 8 else np.uint16)


def ribbon_build(hashes: np.ndarray, bits: int = 8, max_attempts: int = 32) -> bytes:
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    keys = np.unique(np.asarray(hashes, dtype=np.uint64))
    n = len(keys)
    m = _geometry(n)
    for attempt in range(max_attempts):
        seed_in = (0x9E3779B97F4A7C15 * (attempt + 1)) & 0xFFFFFFFFFFFFFFFF
        seed = int(murmur_mix(np.array([seed_in], dtype=np.uint64))[0])
        starts, coefs, fsrc = _key_rows(keys, seed, m)
        fps = _fingerprint(fsrc, bits)
        # sorted insertion keeps the elimination walk cache-local and
        # short (expected O(1) displacement below the load bound)
        order = np.argsort(starts, kind="stable")
        coef = [0] * (m + _W)
        result = [0] * (m + _W)
        ok = True
        for idx in order:
            s = int(starts[idx])
            c = int(coefs[idx])
            b = int(fps[idx])
            while True:
                if coef[s] == 0:
                    coef[s] = c
                    result[s] = b
                    break
                c ^= coef[s]
                b ^= result[s]
                if c == 0:
                    ok = b == 0  # redundant row is fine; inconsistent fails
                    break
                t = (c & -c).bit_length() - 1
                s += t
                c >>= t
            if not ok:
                break
        if not ok:
            continue
        # back-substitution, highest slot first: Z[i] = result[i] XOR the
        # already-solved tail the row's coefficients touch; free rows -> 0
        Z = np.zeros(m + _W, dtype=np.uint16)
        for i in range(m + _W - 1, -1, -1):
            ci = coef[i]
            if ci == 0:
                continue
            acc = result[i]
            t = ci >> 1
            j = i + 1
            while t:
                if t & 1:
                    acc ^= int(Z[j])
                t >>= 1
                j += 1
            Z[i] = acc
        header = RIBBON_MAGIC + struct.pack("<BBQQ", bits, _W, seed, m)
        body = (Z.astype(np.uint8) if bits == 8 else Z).tobytes()
        return header + body
    raise RuntimeError(f"ribbon construction failed after {max_attempts} attempts")


def ribbon_probe(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    if blob[:4] != RIBBON_MAGIC:
        raise ValueError("not a ribbon filter blob")
    bits, w, seed, m = struct.unpack("<BBQQ", blob[4:22])
    dt = np.uint8 if bits == 8 else np.uint16
    Z = np.frombuffer(blob, dtype=dt, offset=22)
    h = np.asarray(hashes, dtype=np.uint64)
    starts, coefs, fsrc = _key_rows(h, seed, m)
    fps = _fingerprint(fsrc, bits).astype(np.uint64)
    acc = np.zeros(len(h), dtype=np.uint64)
    for t in range(w):  # w vectorized gathers — no per-key Python work
        sel = (coefs >> np.uint64(t)) & np.uint64(1)
        acc ^= Z[starts + t].astype(np.uint64) * sel
    return acc == fps


def ribbon_describe(blob: bytes) -> dict:
    bits, w, seed, m = struct.unpack("<BBQQ", blob[4:22])
    return {
        "filter_type": f"ribbon{bits}",
        "size_bytes": len(blob),
        "bits": bits,
        "m": int(m),
        "w": int(w),
    }
