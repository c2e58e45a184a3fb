"""Cuckoo filter kernel (Fan, Andersen, Kaminsky, Mitzenmacher, CoNEXT
2014: "Cuckoo Filter: Practically Better Than Bloom").

Rounds out the AMQ family the reference ships (docs/README.md lists
quotient / xor / binary-fuse / bloom): the cuckoo filter is the OTHER
classic deletable filter — like the quotient filter it supports remove
and merge, unlike bloom it stores fingerprints in a bucketized slot
table with ~95% achievable occupancy at 4-way buckets.

Partial-key cuckoo hashing, the paper's core trick: an item's two
candidate buckets are

    i1 = h & (nbuckets - 1)
    i2 = i1 XOR offset(fp)         offset(fp) = (fp * 0x5bd1e995) & mask

so EITHER bucket plus the fingerprint recovers the other — eviction
never needs the original key. A consequence this engine leans on for
its exact SQL oracle: the probe outcome is PLACEMENT-INDEPENDENT.
``contains(x)`` checks both of x's buckets for fp(x); a stored key k
can only sit in i1(k) or i2(k), and when fp(k) == fp(x) the two
bucket-pairs are either identical or disjoint (same fp => same XOR
offset). Hence

    contains(x)  <=>  (fp(x), min(i1, i2)(x)) ∈ { (fp(k), min(i1, i2)(k)) }

— a pure function of the key set, replayable in ANSI SQL with the
DuckDB-parity hash (``__spark_entry__.q_cuckoo_false_positives``).
Overflow raises instead of silently dropping (which would break both
the no-false-negative contract and the oracle).

Set semantics (one stored copy per distinct (fp, bucket-pair), like
``core/quotient.py`` stores the distinct fingerprint set): builds are
from distinct keys anyway, and it makes delete exact — removing a key
removes precisely its entry (plus any hash-twin sharing fp AND pair,
inherent to every fingerprint filter; the quotient filter has the same
property one abstraction down).

Blob layouts (little-endian)::

    table   b"CKF1" | fp_bits:u8 | bucket_size:u8 | nbuckets:u32 | slots: nbuckets*bucket_size*u16   (0 = empty)
    partial b"CKP1" | fp_bits:u8 | bucket_size:u8 | nbuckets:u32 | count:u64 | sorted entry codes: count*u64

Entry code = (canonical_bucket << 16) | fp, canonical_bucket =
min(i1, i2) — the placement-independent identity above.
"""

from __future__ import annotations

import numpy as np

CKF_MAGIC = b"CKF1"
CKP_MAGIC = b"CKP1"

_OFFSET_CONST = np.uint64(0x5BD1E995)
_MAX_KICKS = 500


def _check_geometry(nbuckets: int, fp_bits: int, bucket_size: int) -> None:
    if nbuckets < 2 or (nbuckets & (nbuckets - 1)) != 0 or nbuckets > 1 << 32:
        raise ValueError("nbuckets must be a power of two in [2, 2^32]")
    if not (1 <= fp_bits <= 16):
        raise ValueError("fp_bits must be in [1, 16] (slots are u16)")
    if not (1 <= bucket_size <= 8):
        raise ValueError("bucket_size must be in [1, 8]")


def ck_entries(hashes: np.ndarray, nbuckets: int, fp_bits: int) -> np.ndarray:
    """Distinct sorted entry codes ((min(i1,i2) << 16) | fp) for a hash
    array — the filter's exact membership identity."""
    h = hashes.astype(np.uint64)
    bmask = np.uint64(nbuckets - 1)
    fpmask = np.uint64((1 << fp_bits) - 1)
    fp = (h >> np.uint64(32)) & fpmask
    fp[fp == 0] = 1  # 0 marks an empty slot
    i1 = h & bmask
    i2 = i1 ^ ((fp * _OFFSET_CONST) & bmask)
    cpair = np.minimum(i1, i2)
    return np.unique((cpair << np.uint64(16)) | fp)


def _split_codes(codes: np.ndarray, nbuckets: int):
    """(fp, i1, i2) for entry codes; i1 is the canonical (smaller) bucket."""
    fp = codes & np.uint64(0xFFFF)
    i1 = codes >> np.uint64(16)
    i2 = i1 ^ ((fp * _OFFSET_CONST) & np.uint64(nbuckets - 1))
    return fp, i1, i2


def _place_vectorized(tab: np.ndarray, occ: np.ndarray, fp, bucket) -> np.ndarray:
    """Greedily place entries into `bucket` where capacity allows; returns
    the boolean mask of entries placed. tab is (nbuckets, b) u16, occ the
    per-bucket fill counts (updated in place)."""
    b = tab.shape[1]
    order = np.argsort(bucket, kind="stable")
    sb = bucket[order]
    # position of each entry within its bucket run
    first = np.concatenate([[0], np.flatnonzero(sb[1:] != sb[:-1]) + 1])
    runpos = np.arange(len(sb)) - np.repeat(first, np.diff(np.concatenate([first, [len(sb)]])))
    slot = occ[sb] + runpos
    ok = slot < b
    tab[sb[ok], slot[ok].astype(np.intp)] = fp[order][ok]
    np.add.at(occ, sb[ok], 1)
    placed = np.zeros(len(fp), dtype=bool)
    placed[order[ok]] = True
    return placed


def ck_build_from_entries(
    codes: np.ndarray, nbuckets: int, fp_bits: int, bucket_size: int
) -> bytes:
    _check_geometry(nbuckets, fp_bits, bucket_size)
    cap = nbuckets * bucket_size
    if len(codes) > int(cap * 0.95):
        raise ValueError(
            f"cuckoo filter over capacity: {len(codes)} entries for "
            f"{nbuckets}x{bucket_size} slots (>95% load); increase nbuckets"
        )
    tab = np.zeros((nbuckets, bucket_size), dtype=np.uint16)
    occ = np.zeros(nbuckets, dtype=np.int64)
    fp, i1, i2 = _split_codes(codes.astype(np.uint64), nbuckets)
    # two vectorized greedy passes place the vast majority; the eviction
    # loop below only sees the residue (a few % even near full load)
    placed = _place_vectorized(tab, occ, fp.astype(np.uint16), i1.astype(np.intp))
    rest = ~placed
    if rest.any():
        placed2 = _place_vectorized(
            tab, occ, fp[rest].astype(np.uint16), i2[rest].astype(np.intp)
        )
        rem = np.flatnonzero(rest)[~placed2]
    else:
        rem = np.zeros(0, dtype=np.intp)
    if len(rem):
        # the eviction walk is per-entry sequential; run it over a flat
        # Python list with int arithmetic — the same deterministic kicks
        # (identical victim choice => byte-identical blobs) at ~15x less
        # per-kick overhead than numpy scalar indexing (r9 "watch" item:
        # this residue loop was the biggest absolute Python cost in the
        # stress bench at 71% load, ~5% of entries)
        bmask = nbuckets - 1
        off = int(_OFFSET_CONST)
        b = bucket_size
        tl = tab.reshape(-1).tolist()
        i1_l = i1[rem].tolist()
        fp_l = fp[rem].tolist()
        for cur, f in zip(i1_l, fp_l):
            done = False
            for kick in range(_MAX_KICKS):
                base = cur * b
                row = tl[base : base + b]
                if 0 in row:
                    tl[base + row.index(0)] = f
                    done = True
                    break
                slot = base + kick % b  # deterministic victim choice
                victim = tl[slot]
                tl[slot] = f
                f = victim
                cur = cur ^ ((f * off) & bmask)
            if not done:
                raise ValueError(
                    f"cuckoo insertion failed after {_MAX_KICKS} kicks at "
                    f"{len(codes)}/{cap} entries; increase nbuckets"
                )
        tab = np.array(tl, dtype=np.uint16).reshape(nbuckets, bucket_size)
    head = CKF_MAGIC + bytes([fp_bits, bucket_size]) + np.uint32(nbuckets).tobytes()
    return head + tab.astype("<u2").tobytes()


def ck_build(hashes: np.ndarray, nbuckets: int, fp_bits: int, bucket_size: int = 4) -> bytes:
    _check_geometry(nbuckets, fp_bits, bucket_size)
    return ck_build_from_entries(
        ck_entries(hashes, nbuckets, fp_bits), nbuckets, fp_bits, bucket_size
    )


def ck_deserialize(blob: bytes):
    if blob[:4] != CKF_MAGIC:
        raise ValueError("not a CKF1 blob")
    fp_bits, bucket_size = blob[4], blob[5]
    nbuckets = int(np.frombuffer(blob[6:10], dtype="<u4")[0])
    tab = np.frombuffer(
        blob[10 : 10 + 2 * nbuckets * bucket_size], dtype="<u2"
    ).reshape(nbuckets, bucket_size)
    return int(fp_bits), int(bucket_size), nbuckets, tab


def ck_probe(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    fp_bits, _, nbuckets, tab = ck_deserialize(blob)
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    h = hashes.astype(np.uint64)
    bmask = np.uint64(nbuckets - 1)
    fp = (h >> np.uint64(32)) & np.uint64((1 << fp_bits) - 1)
    fp[fp == 0] = 1
    i1 = h & bmask
    i2 = i1 ^ ((fp * _OFFSET_CONST) & bmask)
    want = fp.astype(np.uint16)[:, None]
    return (tab[i1.astype(np.intp)] == want).any(axis=1) | (
        tab[i2.astype(np.intp)] == want
    ).any(axis=1)


def ck_stored_codes(blob: bytes) -> np.ndarray:
    """Recover the entry-code set from a slot table (placement-independent
    identity — what merge and delete operate on)."""
    _, _, nbuckets, tab = ck_deserialize(blob)
    idx, slot = np.nonzero(tab)
    fp = tab[idx, slot].astype(np.uint64)
    idx = idx.astype(np.uint64)
    alt = idx ^ ((fp * _OFFSET_CONST) & np.uint64(nbuckets - 1))
    return np.unique((np.minimum(idx, alt) << np.uint64(16)) | fp)


def ck_partial_serialize(
    codes: np.ndarray, nbuckets: int, fp_bits: int, bucket_size: int
) -> bytes:
    head = CKP_MAGIC + bytes([fp_bits, bucket_size]) + np.uint32(nbuckets).tobytes()
    return head + np.uint64(len(codes)).tobytes() + codes.astype("<u8").tobytes()


def _blob_entries(blob: bytes):
    """(geometry, entry codes) for either blob form."""
    magic = blob[:4]
    if magic == CKP_MAGIC:
        fp_bits, bucket_size = blob[4], blob[5]
        nbuckets = int(np.frombuffer(blob[6:10], dtype="<u4")[0])
        count = int(np.frombuffer(blob[10:18], dtype="<u8")[0])
        codes = np.frombuffer(blob[18 : 18 + 8 * count], dtype="<u8")
        return (int(fp_bits), int(bucket_size), nbuckets), codes
    if magic == CKF_MAGIC:
        fp_bits, bucket_size, nbuckets, _ = ck_deserialize(blob)
        return (fp_bits, bucket_size, nbuckets), ck_stored_codes(blob)
    raise ValueError("not a cuckoo blob")


def ck_merge(blobs: list) -> bytes:
    """Union filters of identical geometry (accepts CKP1 partials and CKF1
    tables interchangeably; always emits a CKF1 table).
    merge(build(A), build(B)) == build(A | B) exactly — entry-set
    semantics make the cuckoo filter mergeable like quotient/bloom."""
    geom = None
    parts = []
    for b in blobs:
        g, codes = _blob_entries(bytes(b))
        if geom is None:
            geom = g
        elif g != geom:
            raise ValueError("cannot merge cuckoo filters with different geometry")
        parts.append(codes)
    if geom is None:
        raise ValueError("no filters to merge")
    fp_bits, bucket_size, nbuckets = geom
    codes = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.uint64)
    return ck_build_from_entries(codes, nbuckets, fp_bits, bucket_size)


def ck_remove(blob: bytes, hashes: np.ndarray) -> bytes:
    """Delete keys (the capability that, with quotient, distinguishes this
    family from xor/fuse/bloom). Clears every stored entry matching a
    deleted key's (fp, bucket-pair) — exact under set semantics."""
    fp_bits, bucket_size, nbuckets, tab = ck_deserialize(blob)
    gone = ck_entries(hashes, nbuckets, fp_bits)
    tab = tab.copy()
    idx, slot = np.nonzero(tab)
    fp = tab[idx, slot].astype(np.uint64)
    u_idx = idx.astype(np.uint64)
    alt = u_idx ^ ((fp * _OFFSET_CONST) & np.uint64(nbuckets - 1))
    codes = (np.minimum(u_idx, alt) << np.uint64(16)) | fp
    kill = np.isin(codes, gone)
    tab[idx[kill], slot[kill]] = 0
    head = CKF_MAGIC + bytes([fp_bits, bucket_size]) + np.uint32(nbuckets).tobytes()
    return head + tab.astype("<u2").tobytes()
