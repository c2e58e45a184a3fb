"""HyperLogLog sketch — the FIXED-SIZE distinct-count member of the
mergeable-sketch family (KMV: k·8-byte distinct sketch with integer-exact
estimates; HLL: 2^p single-byte registers whose size never depends on k
or the data, the right trade at 100 TB where billions of groups each
carry a sketch).

Flajolet et al. 2007 ("HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm") with the standard small-range linear
counting correction (Heule et al. 2013 practice); large-range correction
is unnecessary with 64-bit hashes.

Like every sketch in this engine, the input must be a UNIFORM 64-bit
hash (a ``spark_hash64`` / ``duckdb_hash`` column) — raw un-hashed keys
share top bits and collapse registers (property-tested contract,
tests/test_kernels_property.py).

Blob format (little-endian): ``HLL1 | u8 p | u8 registers[2^p]``.
Register index = top p bits of the key hash; register value = number of
leading zeros of the remaining 64-p bits, + 1 (capped at 64-p+1).
Merge = elementwise MAX, so merge(build(A), build(B)) == build(A ∪ B)
byte-for-byte — same two-phase partial-build algebra as the rest of the
family. The estimate is deterministic (same blob → same number) but,
unlike KMV, involves float arithmetic — verified by property tests, not
a SQL oracle.
"""

from __future__ import annotations

import numpy as np

HLL_MAGIC = b"HLL1"


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over u64 (x == 0 → 64)."""
    y = x.astype(np.uint64, copy=True)
    clz = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = (y >> np.uint64(64 - s)) == 0
        clz[t] += s
        y[t] = y[t] << np.uint64(s)
    # the shift ladder leaves 63 for zero input (every nonzero value ends
    # with its leading one at the MSB, zero stays zero) — fix up to 64
    clz[y == np.uint64(0)] = 64
    return clz


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """The 2^p register array — the partial-aggregation state (register
    arrays from disjoint row sets combine by elementwise max)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = hashes.astype(np.uint64, copy=False)
    if len(h):
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rem = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        # leading zeros within the remaining 64-p bits, +1; rem == 0 → 64-p+1
        rank = np.minimum(_clz64(rem) + 1, 64 - p + 1).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return regs


def hll_build(hashes: np.ndarray, p: int = 12) -> bytes:
    return hll_serialize(p, hll_registers(hashes, p))


def hll_serialize(p: int, regs: np.ndarray) -> bytes:
    return HLL_MAGIC + bytes([p]) + regs.astype(np.uint8).tobytes()


def hll_deserialize(blob: bytes) -> tuple:
    if blob[:4] != HLL_MAGIC:
        raise ValueError("not an HLL1 blob")
    p = blob[4]
    m = 1 << p
    need = 5 + m
    if len(blob) < need:
        raise ValueError(f"corrupt HLL blob: {len(blob)} bytes < {need}")
    return p, np.frombuffer(blob[5:need], dtype=np.uint8)


def hll_merge(blobs: list) -> bytes:
    parts = [hll_deserialize(b) for b in blobs]
    ps = {p for p, _ in parts}
    if len(ps) != 1:
        raise ValueError(f"cannot merge HLL blobs with different p: {sorted(ps)}")
    (p,) = ps
    regs = np.zeros(1 << p, dtype=np.uint8)
    for _, r in parts:
        regs = np.maximum(regs, r)
    return hll_serialize(p, regs)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(blob: bytes) -> int:
    """Distinct-count estimate (deterministic; ~1.04/sqrt(2^p) relative
    stderr). Small cardinalities use linear counting over the zero
    registers, which is EXACT while every key owns its own register."""
    p, regs = hll_deserialize(blob)
    m = 1 << p
    raw = _alpha(m) * m * m / float(np.sum(np.float64(2.0) ** -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros:
        return int(round(m * np.log(m / zeros)))
    return int(round(raw))
