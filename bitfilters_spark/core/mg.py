"""Misra–Gries summary — the HEAVY-HITTERS member of the mergeable-sketch
family (CMS answers "how often is key x" for keys you already hold; MG
answers "WHICH keys are frequent" without knowing them up front — the
boilerplate-detection / hot-key-diagnosis shape).

Misra & Gries 1982 ("Finding repeated elements"); the MERGE rule is the
mergeable-summaries construction of Agarwal, Cormode, Huang, Phillips,
Wei & Yi (PODS 2012, §3): add counters keyed by element, then subtract
the (k+1)-st largest counter value from every counter and drop the
non-positive ones. Guarantees, over any split of the data:

* every stored count is a LOWER bound on the true count;
* undercount <= n / (k + 1) (n = total rows summarized), so any key with
  true count > n/(k+1) is guaranteed PRESENT in the summary;
* while the data's total distinct-key count is <= k, no subtraction ever
  fires and the summary holds EXACT counts for every key — the regime
  the SQL oracle checks (plain GROUP BY reproduces it).

Blob format (little-endian):
``MGS1 | u32 k | u32 m | u64 keys[m] | u64 counts[m]`` — keys are the
key HASHES (same u64 key space as every other sketch here), ascending,
m <= k.
"""

from __future__ import annotations

import numpy as np

MG_MAGIC = b"MGS1"


def _compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Keep at most k counters: subtract the (k+1)-st largest count from
    all and drop non-positive (the PODS'12 merge/compress step)."""
    if len(keys) <= k:
        return keys, counts
    # (k+1)-st largest value
    thresh = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > thresh
    return keys[keep], counts[keep] - thresh


def mg_summarize(keys: np.ndarray, counts: np.ndarray, k: int):
    """Canonical (keys, counts) state from exact per-key counts."""
    kk, cc = _compress(
        keys.astype(np.uint64, copy=False), counts.astype(np.uint64, copy=False), k
    )
    order = np.argsort(kk)
    return kk[order], cc[order]


def mg_build(hashes: np.ndarray, k: int = 64) -> bytes:
    if k < 1:
        raise ValueError("k must be >= 1")
    keys, counts = np.unique(hashes.astype(np.uint64, copy=False), return_counts=True)
    keys, counts = mg_summarize(keys, counts.astype(np.uint64), k)
    return mg_serialize(k, keys, counts)


def mg_serialize(k: int, keys: np.ndarray, counts: np.ndarray) -> bytes:
    head = np.array([k, len(keys)], dtype="<u4").tobytes()
    return (
        MG_MAGIC
        + head
        + keys.astype("<u8").tobytes()
        + counts.astype("<u8").tobytes()
    )


def mg_deserialize(blob: bytes) -> tuple:
    if blob[:4] != MG_MAGIC:
        raise ValueError("not an MGS1 blob")
    k, m = (int(x) for x in np.frombuffer(blob[4:12], dtype="<u4"))
    need = 12 + 16 * m
    if len(blob) < need:
        raise ValueError(f"corrupt MG blob: {len(blob)} bytes < {need}")
    keys = np.frombuffer(blob[12 : 12 + 8 * m], dtype="<u8")
    counts = np.frombuffer(blob[12 + 8 * m : need], dtype="<u8")
    return k, keys, counts


def mg_merge(blobs: list) -> bytes:
    parts = [mg_deserialize(b) for b in blobs]
    ks = {k for k, _, _ in parts}
    if len(ks) != 1:
        raise ValueError(f"cannot merge MG blobs with different k: {sorted(ks)}")
    (k,) = ks
    all_keys = np.concatenate([p[1] for p in parts])
    all_counts = np.concatenate([p[2] for p in parts])
    keys, inv = np.unique(all_keys, return_inverse=True)
    counts = np.zeros(len(keys), dtype=np.uint64)
    np.add.at(counts, inv, all_counts)
    keys, counts = mg_summarize(keys, counts, k)
    return mg_serialize(k, keys, counts)


def mg_estimate(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    """Lower-bound count per probe hash (0 when not tracked)."""
    _, keys, counts = mg_deserialize(blob)
    h = hashes.astype(np.uint64, copy=False)
    idx = np.searchsorted(keys, h)
    idx = np.clip(idx, 0, max(len(keys) - 1, 0))
    out = np.zeros(len(h), dtype=np.uint64)
    if len(keys):
        hit = keys[idx] == h
        out[hit] = counts[idx[hit]]
    return out


def mg_topk(blob: bytes, top_k: int | None = None):
    """The tracked heavy candidates, count-descending (key-hash ascending
    tiebreak so the order is total and engine-reproducible)."""
    _, keys, counts = mg_deserialize(blob)
    order = np.lexsort((keys, np.iinfo(np.uint64).max - counts))
    if top_k is not None:
        order = order[:top_k]
    return keys[order], counts[order]
