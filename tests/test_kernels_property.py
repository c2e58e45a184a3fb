"""Property-based kernel invariants (hypothesis): the no-false-negative
contract and serialization round-trips must hold for ARBITRARY hash sets,
including adversarial values (0, u64 max, dense duplicates), and the
vectorized string hash must agree with the scalar packing path."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfilters_spark.core import bloom, fuse, hashing, quotient, xor

u64s = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=400
)


def _arr(xs):
    return np.array(xs, dtype=np.uint64)


@settings(max_examples=40, deadline=None)
@given(u64s)
def test_xor_never_false_negative(xs):
    h = _arr(xs)
    blob = xor.xor_build(h, 8)
    if len(h):
        assert xor.xor_probe(blob, h).all()


@settings(max_examples=40, deadline=None)
@given(u64s)
def test_fuse_never_false_negative(xs):
    h = _arr(xs)
    blob = fuse.fuse_build(h, 16)
    if len(h):
        assert fuse.fuse_probe(blob, h).all()


@settings(max_examples=40, deadline=None)
@given(u64s, st.integers(min_value=4, max_value=20), st.integers(min_value=1, max_value=16))
def test_quotient_membership_is_exact_fingerprint_set(xs, q, r):
    if q + r > 64:
        r = 64 - q
    h = _arr(xs)
    blob = quotient.qf_build(h, q, r)
    if len(h):
        assert quotient.qf_probe(blob, h).all()
    # exactness: a probe hits iff its (q+r)-bit fingerprint is in the set
    rng = np.random.default_rng(1)
    others = rng.integers(0, 2**64, size=200, dtype=np.uint64)
    want = np.isin(
        quotient.qf_fingerprints(others, q, r), quotient.qf_fingerprints(h, q, r)
    ) if len(h) else np.zeros(200, dtype=bool)
    got = quotient.qf_probe(blob, others)
    assert (got == want).all()


@settings(max_examples=40, deadline=None)
@given(u64s)
def test_bloom_merge_of_random_split_equals_bulk(xs):
    h = _arr(xs)
    bulk = bloom.duckdb_bloom_serialize(bloom.duckdb_bloom_build(h, 64))
    cut = len(h) // 2
    parts = [
        bloom.duckdb_bloom_serialize(bloom.duckdb_bloom_build(h[:cut], 64)),
        bloom.duckdb_bloom_serialize(bloom.duckdb_bloom_build(h[cut:], 64)),
    ]
    assert bloom.duckdb_bloom_merge(parts) == bulk


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=50))
def test_flat_packing_matches_list_packing(blobs):
    """pack_flat_to_words (Arrow buffer fast path) must hash identically to
    the per-row list path for both string-hash versions."""
    offsets = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    for version in ("v1.0.0", "v1.5.1"):
        fast = hashing.hash_words(
            *hashing.pack_flat_to_words(flat, offsets), version=version
        )
        slow = hashing.hash_bytes(list(blobs), version=version)
        assert (fast == slow).all()


# ------------------------------------------------------------ cms / kmv ---


@settings(max_examples=40, deadline=None)
@given(u64s)
def test_cms_never_underestimates_property(xs):
    from bitfilters_spark.core import cms

    h = _arr(xs)
    blob = cms.cms_build(h, d=3, w=64)
    if len(h):
        uniq, counts = np.unique(h, return_counts=True)
        est = cms.cms_estimate(blob, uniq)
        assert (est >= counts.astype(np.uint64)).all()


@settings(max_examples=40, deadline=None)
@given(u64s, u64s)
def test_cms_merge_is_build_on_union_property(xs, ys):
    from bitfilters_spark.core import cms

    a, b = _arr(xs), _arr(ys)
    assert cms.cms_merge([cms.cms_build(a, 2, 32), cms.cms_build(b, 2, 32)]) == (
        cms.cms_build(np.concatenate([a, b]), 2, 32)
    )


@settings(max_examples=40, deadline=None)
@given(u64s, st.integers(min_value=2, max_value=64))
def test_kmv_exact_or_bounded_property(xs, k):
    from bitfilters_spark.core import kmv

    h = _arr(xs)
    blob = kmv.kmv_build(h, k)
    true = len(np.unique(h))
    est = kmv.kmv_estimate(blob)
    if true < k:
        assert est == true  # under capacity: exact, always
    else:
        assert est >= 1


@settings(max_examples=40, deadline=None)
@given(u64s, u64s, st.integers(min_value=2, max_value=32))
def test_kmv_merge_is_build_on_union_property(xs, ys, k):
    from bitfilters_spark.core import kmv

    a, b = _arr(xs), _arr(ys)
    assert kmv.kmv_merge([kmv.kmv_build(a, k), kmv.kmv_build(b, k)]) == (
        kmv.kmv_build(np.concatenate([a, b]), k)
    )


@settings(max_examples=20, deadline=None)
@given(u64s)
def test_cms_kmv_roundtrip_property(xs):
    from bitfilters_spark.core import cms, kmv

    h = _arr(xs)
    mat = cms.cms_counts(h, 2, 16)
    assert (cms.cms_deserialize(cms.cms_serialize(mat)) == mat).all()
    k, vals = kmv.kmv_deserialize(kmv.kmv_build(h, 8))
    assert k == 8
    # strictly ascending, compared UNSIGNED (an i64 cast would flip order
    # for values above 2^63)
    assert bool(np.all(vals[1:] > vals[:-1]))


@settings(max_examples=40, deadline=None)
@given(
    u64s,
    st.integers(min_value=4, max_value=20),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=0, max_value=6),
)
def test_quotient_resize_equals_rebuild_property(xs, q, r, shrink_by):
    """For ANY key set and geometry: growing (q+1, r-1) is
    membership-invariant, and shrinking by any amount equals rebuilding
    at the smaller width."""
    h = _arr(xs)
    blob = quotient.qf_build(h, q, r)
    if r >= 2:
        grown = quotient.qf_resize(blob, q + 1)  # (q+1, r-1), same width
        if len(h):
            assert quotient.qf_probe(grown, h).all()
        probes = _arr([0, 1, 2**64 - 1, 12345])
        assert (
            quotient.qf_probe(grown, probes) == quotient.qf_probe(blob, probes)
        ).all()
    new_r = r - shrink_by
    if new_r >= 1:
        shrunk = quotient.qf_resize(blob, q, new_r)
        assert shrunk == quotient.qf_build(h, q, new_r)


pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**64 - 1),  # hash
        st.integers(min_value=-(2**62), max_value=2**62),  # value
    ),
    min_size=0,
    max_size=300,
)


@settings(max_examples=40, deadline=None)
@given(pairs_strategy, st.integers(min_value=1, max_value=64), st.integers(min_value=0, max_value=300))
def test_bks_merge_is_build_on_union_property(ps, k, cut):
    """Any split of any (hash, value) multiset merges to the bulk build,
    byte-for-byte — including duplicate hashes with conflicting values
    (the min-value tie rule must be associative)."""
    from bitfilters_spark.core import bksample as BK

    h = np.array([p[0] for p in ps], dtype=np.uint64)
    v = np.array([p[1] for p in ps], dtype=np.int64)
    cut = min(cut, len(ps))
    a = BK.bks_build(h[:cut], v[:cut], k)
    b = BK.bks_build(h[cut:], v[cut:], k)
    assert BK.bks_merge([a, b]) == BK.bks_build(h, v, k)
    assert BK.bks_merge([b, a]) == BK.bks_build(h, v, k)


@settings(max_examples=40, deadline=None)
@given(pairs_strategy, st.integers(min_value=2, max_value=64))
def test_bks_quantile_matches_nearest_rank_reference(ps, k):
    import math

    from bitfilters_spark.core import bksample as BK

    h = np.array([p[0] for p in ps], dtype=np.uint64)
    v = np.array([p[1] for p in ps], dtype=np.int64)
    blob = BK.bks_build(h, v, k)
    _, hh, vv = BK.bks_deserialize(blob)
    for q in (0.01, 0.5, 0.99, 1.0):
        got = BK.bks_quantile(blob, q)
        if len(vv) == 0:
            assert got is None
        else:
            want = sorted(vv)[max(1, math.ceil(q * len(vv))) - 1]
            assert got == want


@settings(max_examples=40, deadline=None)
@given(u64s, st.integers(min_value=1, max_value=5))
def test_hll_merge_is_build_on_union_property(xs, n_parts):
    """Register max is canonical: any split of any key set merges to the
    byte-identical bulk blob, and the estimate of a small-range set is
    near-exact (linear counting)."""
    from bitfilters_spark.core import hll

    # the engine contract feeds sketches UNIFORM 64-bit hashes (spark_hash64
    # / duckdb_hash columns) — raw small integers all share top bits and are
    # out of contract, so mirror the real input distribution here
    h = hashing.hash_int64(_arr(xs).view(np.int64))
    bulk = hll.hll_build(h, p=8)
    parts = [hll.hll_build(p_, p=8) for p_ in np.array_split(h, n_parts)]
    assert hll.hll_merge(parts) == bulk
    d = len(np.unique(h))
    if d <= 25:  # well under 256 registers: linear counting regime
        assert abs(hll.hll_estimate(bulk) - d) <= max(3, d // 4)


@settings(max_examples=40, deadline=None)
@given(u64s, st.integers(min_value=1, max_value=64), st.integers(min_value=1, max_value=5))
def test_mg_bounds_property(xs, k, n_parts):
    """For ANY data, k, and split: estimates never exceed true counts,
    undercount <= n/(k+1), keys above the threshold are always tracked,
    and the exact regime (distinct <= k) reproduces true counts."""
    from bitfilters_spark.core import mg

    h = _arr(xs)
    merged = mg.mg_merge([mg.mg_build(p_, k=k) for p_ in np.array_split(h, n_parts)])
    keys, counts = np.unique(h, return_counts=True) if len(h) else (
        np.zeros(0, np.uint64), np.zeros(0, np.int64))
    est = mg.mg_estimate(merged, keys) if len(keys) else np.zeros(0, np.uint64)
    n = len(h)
    bound = n // (k + 1)
    assert (est.astype(np.int64) <= counts).all()
    assert (counts - est.astype(np.int64) <= bound).all()
    assert (est[counts > bound] > 0).all()
    if len(keys) <= k:
        assert (est.astype(np.int64) == counts).all()
