"""Shared hypergraph-peeling construction for XOR-type filters.

XOR filters (Graf & Lemire 2019, arXiv:1912.08258) and Binary Fuse filters
(Graf & Lemire 2022, arXiv:2201.01174) both store fingerprints ``B`` such
that for every key ``fp(k) == B[p0(k)] ^ B[p1(k)] ^ B[p2(k)]``.  Construction
peels the 3-uniform hypergraph: repeatedly find slots touched by exactly one
remaining key, remove that key, then assign fingerprints in reverse order.

This module implements *batched* peeling: every iteration processes ALL
current singleton slots at once with whole-array numpy ops (counts via
``np.add.at``, key-index tracking via xor-accumulators).  Rounds are O(log n)
in expectation, so construction is a handful of vectorized passes rather than
a per-key Python loop — that's what makes per-group builds of 10^7+ keys
inside an ``applyInPandas`` worker practical.

Batched-round correctness: a slot that is a singleton at the start of a round
is used by exactly one remaining key, so (a) within a round, one key's
non-assigned positions can never be another round-key's assigned slot, and
(b) in reverse-round assignment every read position is already final.
"""

from __future__ import annotations

import numpy as np


def peel(pos: np.ndarray, capacity: int):
    """Peel the hypergraph.

    pos: (3, n) int64 slot positions per key.
    Returns a list of rounds [(slots, key_indices)] covering all n keys, or
    None if peeling got stuck (caller retries with a different seed).
    """
    n = pos.shape[1]
    cnt = np.zeros(capacity, dtype=np.int64)
    np.add.at(cnt, pos.reshape(-1), 1)
    xorsum = np.zeros(capacity, dtype=np.uint64)
    keys = np.arange(n, dtype=np.uint64)
    for row in pos:
        np.bitwise_xor.at(xorsum, row, keys)

    rounds = []
    peeled = 0
    while peeled < n:
        singles = np.nonzero(cnt == 1)[0]
        if singles.size == 0:
            return None
        ks = xorsum[singles].astype(np.int64)
        uk, first = np.unique(ks, return_index=True)
        slots = singles[first]
        rounds.append((slots, uk))
        uku = uk.astype(np.uint64)
        for row in pos:
            p = row[uk]
            np.add.at(cnt, p, -1)
            np.bitwise_xor.at(xorsum, p, uku)
        peeled += uk.size
    return rounds


def assign(rounds, pos: np.ndarray, fp: np.ndarray, capacity: int, dtype) -> np.ndarray:
    """Fill the fingerprint array in reverse peel order."""
    B = np.zeros(capacity, dtype=dtype)
    for slots, keys in reversed(rounds):
        val = fp[keys].astype(dtype)
        for row in pos:
            val ^= B[row[keys]]
        B[slots] = val  # B[slot] was 0, so val == fp ^ (other two)
    return B
