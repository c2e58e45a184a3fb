"""Pure-numpy filter kernel tests: no false negatives, FPR envelopes,
merge/delete semantics, serialization round-trips. No Spark needed."""

import numpy as np
import pytest

from bitfilters_spark.core import bloom, fuse, quotient, xor
from bitfilters_spark.core.hashing import hash_int64, murmur_mix

N = 50_000
KEYS = hash_int64(np.arange(1, N + 1, dtype=np.int64))
OTHERS = hash_int64(np.arange(N + 1, 2 * N + 1, dtype=np.int64))


# ------------------------------------------------------------------ xor ---


@pytest.mark.parametrize("bits,max_fpr", [(8, 0.011), (16, 0.001)])
def test_xor_no_false_negatives_and_fpr(bits, max_fpr):
    blob = xor.xor_build(KEYS, bits=bits)
    assert xor.xor_probe(blob, KEYS).all()
    fpr = xor.xor_probe(blob, OTHERS).mean()
    assert fpr <= max_fpr, fpr


def test_xor_space_efficiency():
    blob = xor.xor_build(KEYS, bits=8)
    # ~1.23 bytes/elem + header; stay under 1.4
    assert len(blob) < 1.4 * N


def test_xor_tiny_and_empty():
    blob = xor.xor_build(np.array([7, 8, 9], dtype=np.uint64), bits=8)
    assert xor.xor_probe(blob, np.array([7, 8, 9], dtype=np.uint64)).all()
    empty = xor.xor_build(np.zeros(0, dtype=np.uint64), bits=16)
    assert xor.xor_probe(empty, np.zeros(0, dtype=np.uint64)).shape == (0,)


def test_xor_duplicates_ok():
    dup = np.concatenate([KEYS[:100], KEYS[:100]])
    blob = xor.xor_build(dup, bits=8)
    assert xor.xor_probe(blob, KEYS[:100]).all()


# ----------------------------------------------------------------- fuse ---


@pytest.mark.parametrize("bits,max_fpr", [(8, 0.011), (16, 0.001)])
def test_fuse_no_false_negatives_and_fpr(bits, max_fpr):
    blob = fuse.fuse_build(KEYS, bits=bits)
    assert fuse.fuse_probe(blob, KEYS).all()
    fpr = fuse.fuse_probe(blob, OTHERS).mean()
    assert fpr <= max_fpr, fpr


def test_fuse_space_beats_xor():
    bx = xor.xor_build(KEYS, bits=8)
    bf = fuse.fuse_build(KEYS, bits=8)
    assert len(bf) < len(bx)


def test_fuse_small_sets():
    for n in (1, 2, 5, 100, 999):
        ks = murmur_mix(np.arange(n, dtype=np.uint64) + 1)
        blob = fuse.fuse_build(ks, bits=8)
        assert fuse.fuse_probe(blob, ks).all()


# ------------------------------------------------------------- quotient ---


def test_quotient_exact_membership_semantics():
    q, r = 16, 4
    blob = quotient.qf_build(KEYS, q, r)
    assert quotient.qf_probe(blob, KEYS).all()
    # false positives are EXACTLY low-(q+r)-bit collisions
    mask = np.uint64((1 << (q + r)) - 1)
    member_fps = set((KEYS & mask).tolist())
    expect = np.array([int(h & mask) in member_fps for h in OTHERS])
    got = quotient.qf_probe(blob, OTHERS)
    assert (got == expect).all()


def test_quotient_merge_and_delete():
    a = quotient.qf_build(KEYS[:1000], 16, 8)
    b = quotient.qf_build(KEYS[1000:2000], 16, 8)
    m = quotient.qf_merge([a, b])
    assert quotient.qf_probe(m, KEYS[:2000]).all()
    d = quotient.qf_remove(m, KEYS[:1000])
    assert quotient.qf_probe(d, KEYS[1000:2000]).all()
    # removed keys only match if they collide with a survivor
    mask = np.uint64((1 << 24) - 1)
    surv = set((KEYS[1000:2000] & mask).tolist())
    expect = np.array([int(h & mask) in surv for h in KEYS[:1000]])
    assert (quotient.qf_probe(d, KEYS[:1000]) == expect).all()


def test_quotient_resize_grow_is_membership_invariant():
    blob = quotient.qf_build(KEYS, 16, 4)
    grown = quotient.qf_resize(blob, 17)  # (17, 3): same 20-bit width
    q, r, fps = quotient.qf_deserialize(grown)
    assert (q, r) == (17, 3)
    assert (quotient.qf_probe(grown, KEYS) == quotient.qf_probe(blob, KEYS)).all()
    assert (quotient.qf_probe(grown, OTHERS) == quotient.qf_probe(blob, OTHERS)).all()


def test_quotient_resize_shrink_equals_rebuild():
    blob = quotient.qf_build(KEYS, 16, 8)  # 24-bit fingerprints
    shrunk = quotient.qf_resize(blob, 16, 4)  # truncate to 20 bits
    rebuilt = quotient.qf_build(KEYS, 16, 4)
    assert shrunk == rebuilt
    # truncation only ever ADDS accepts (fingerprints collide more)
    wide = quotient.qf_probe(blob, OTHERS)
    narrow = quotient.qf_probe(shrunk, OTHERS)
    assert (narrow | ~wide).all() and narrow.sum() >= wide.sum()


def test_quotient_merge_after_resize():
    a = quotient.qf_resize(quotient.qf_build(KEYS[:1000], 16, 4), 17)
    b = quotient.qf_resize(quotient.qf_build(KEYS[1000:2000], 16, 4), 17)
    m = quotient.qf_merge([a, b])
    assert quotient.qf_probe(m, KEYS[:2000]).all()
    # geometry mismatch (resized vs not) must refuse to merge
    c = quotient.qf_build(KEYS[2000:3000], 16, 4)
    with pytest.raises(ValueError):
        quotient.qf_merge([a, c])


def test_quotient_resize_cannot_widen():
    blob = quotient.qf_build(KEYS, 16, 4)
    with pytest.raises(ValueError):
        quotient.qf_resize(blob, 16, 8)


def test_quotient_reference_fp_counts():
    """Reproduces the reference's deterministic FP expectation
    (test/sql/bitfilters.test: q=16, r=4, ids 1..100000 split by parity,
    duckdb hash) — 2264 and 2273 false positives."""
    ids = np.arange(1, 100_001, dtype=np.int64)
    h = hash_int64(ids)
    even, odd = h[ids % 2 == 0], h[ids % 2 == 1]
    f_even = quotient.qf_build(even, 16, 4)
    f_odd = quotient.qf_build(odd, 16, 4)
    fp_on_even = int(quotient.qf_probe(f_even, odd).sum())
    fp_on_odd = int(quotient.qf_probe(f_odd, even).sum())
    assert {fp_on_even, fp_on_odd} == {2264, 2273}


# ---------------------------------------------------------------- bloom ---


def test_duckdb_bloom_roundtrip_and_fpr():
    blob = bloom.duckdb_bloom_serialize(bloom.duckdb_bloom_build(KEYS, 16384))
    assert bloom.duckdb_bloom_probe(blob, KEYS).all()
    fpr = bloom.duckdb_bloom_probe(blob, OTHERS).mean()
    assert fpr < 0.15  # 16k sectors for 50k keys is a loaded filter


def test_duckdb_bloom_blob_format():
    s = bloom.duckdb_bloom_build(np.array([1, 2, 3], dtype=np.uint64), 8)
    blob = bloom.duckdb_bloom_serialize(s)
    assert len(blob) == 8 * (8 + 1)
    assert int(np.frombuffer(blob[:8], "<u8")[0]) == 8


def test_duckdb_bloom_merge_equals_bulk():
    a = bloom.duckdb_bloom_serialize(bloom.duckdb_bloom_build(KEYS[:25000], 4096))
    b = bloom.duckdb_bloom_serialize(bloom.duckdb_bloom_build(KEYS[25000:], 4096))
    merged = bloom.duckdb_bloom_merge([a, b])
    bulk = bloom.duckdb_bloom_serialize(bloom.duckdb_bloom_build(KEYS, 4096))
    assert merged == bulk


def test_generic_bloom_fpp_target():
    blob = bloom.bloom_serialize(bloom.bloom_build(KEYS, n=N, fpp=0.01), bloom.bloom_params(N, 0.01)[1])
    assert bloom.bloom_probe(blob, KEYS).all()
    fpr = bloom.bloom_probe(blob, OTHERS).mean()
    assert fpr < 0.02, fpr


def test_generic_bloom_merge_equals_bulk():
    k = bloom.bloom_params(N, 0.01)[1]
    a = bloom.bloom_serialize(bloom.bloom_build(KEYS[:25000], N, 0.01), k)
    b = bloom.bloom_serialize(bloom.bloom_build(KEYS[25000:], N, 0.01), k)
    assert bloom.bloom_merge([a, b]) == bloom.bloom_serialize(bloom.bloom_build(KEYS, N, 0.01), k)


# ----------------------------------------------------------------- cms ---


def test_cms_exact_when_no_collisions():
    import numpy as np

    from bitfilters_spark.core.cms import cms_build, cms_estimate

    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, size=200, dtype=np.uint64)
    reps = rng.integers(1, 9, size=200)
    hashes = np.repeat(keys, reps)
    blob = cms_build(hashes, d=4, w=1 << 16)  # wide: collisions vanish
    est = cms_estimate(blob, keys)
    assert (est == reps.astype(np.uint64)).all()


def test_cms_never_underestimates():
    import numpy as np

    from bitfilters_spark.core.cms import cms_build, cms_estimate

    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    reps = rng.integers(1, 6, size=500)
    hashes = np.repeat(keys, reps)
    blob = cms_build(hashes, d=4, w=256)  # narrow: collisions guaranteed
    est = cms_estimate(blob, keys)
    assert (est >= reps.astype(np.uint64)).all()
    assert est.sum() > reps.sum()  # some overestimation must occur


def test_cms_merge_equals_build_on_union():
    import numpy as np

    from bitfilters_spark.core.cms import cms_build, cms_merge

    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**63, size=1000, dtype=np.uint64)
    b = rng.integers(0, 2**63, size=800, dtype=np.uint64)
    assert cms_merge([cms_build(a, 4, 1024), cms_build(b, 4, 1024)]) == cms_build(
        np.concatenate([a, b]), 4, 1024
    )


# ----------------------------------------------------------------- kmv ---


def test_kmv_exact_under_capacity():
    import numpy as np

    from bitfilters_spark.core.kmv import kmv_build, kmv_estimate

    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 2**64, size=300, dtype=np.uint64))
    hashes = np.repeat(keys, 3)  # duplicates must not inflate the count
    assert kmv_estimate(kmv_build(hashes, k=1024)) == len(keys)


def test_kmv_estimate_at_capacity_is_close():
    import numpy as np

    from bitfilters_spark.core.kmv import kmv_build, kmv_estimate

    rng = np.random.default_rng(6)
    keys = rng.integers(0, 2**64, size=20_000, dtype=np.uint64)
    est = kmv_estimate(kmv_build(keys, k=256))
    true = len(np.unique(keys))
    assert 0.8 * true < est < 1.2 * true  # ~1/sqrt(k) ≈ 6% rel. error


def test_kmv_merge_equals_build_on_union():
    import numpy as np

    from bitfilters_spark.core.kmv import kmv_build, kmv_merge

    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=4000, dtype=np.uint64)
    assert kmv_merge([kmv_build(a, 128), kmv_build(b, 128)]) == kmv_build(
        np.concatenate([a, b]), 128
    )


def test_kmv_overlap_identical_and_disjoint():
    import numpy as np

    from bitfilters_spark.core.kmv import kmv_build, kmv_overlap

    rng = np.random.default_rng(9)
    a = rng.integers(0, 2**64, size=3000, dtype=np.uint64)
    sk = kmv_build(a, 64)
    k_eff, both, union_est = kmv_overlap(sk, sk)
    assert (k_eff, both) == (64, 64)  # identical sets: jaccard estimate 1

    from bitfilters_spark.core.kmv import kmv_estimate

    b = rng.integers(0, 2**64, size=3000, dtype=np.uint64)
    sk_a, sk_b = kmv_build(a, 256), kmv_build(b, 256)
    _, both2, union2 = kmv_overlap(sk_a, sk_b)
    assert both2 <= 8  # disjoint random sets: near-zero overlap sample
    true_union = len(np.unique(np.concatenate([a, b])))
    assert 0.8 * true_union < union2 < 1.2 * true_union  # ~6% stderr at k=256
    # combining two sketches must equal sketching the union directly
    assert union2 == kmv_estimate(kmv_build(np.concatenate([a, b]), 256))


def test_cms_join_size_exact_without_collisions_and_upper_bound():
    """Inner-product join-size estimate: exact when w is large enough that
    no row collides; always an upper bound; geometry mismatch raises."""
    import numpy as np
    import pytest

    from bitfilters_spark.core.cms import cms_build, cms_join_size
    from bitfilters_spark.core.hashing import hash_int64

    rng = np.random.default_rng(5)
    # multiset A: keys 0..99 with multiplicity 1..3; B: keys 50..149 w/ 1..2
    ka = np.repeat(np.arange(100), rng.integers(1, 4, 100))
    kb = np.repeat(np.arange(50, 150), rng.integers(1, 3, 100))
    ha, hb = hash_int64(ka.astype(np.int64)), hash_int64(kb.astype(np.int64))
    exact = 0
    ca = {int(k): int((ka == k).sum()) for k in np.unique(ka)}
    cb = {int(k): int((kb == k).sum()) for k in np.unique(kb)}
    for k in set(ca) & set(cb):
        exact += ca[k] * cb[k]
    big_a = cms_build(ha, d=4, w=1 << 16)
    big_b = cms_build(hb, d=4, w=1 << 16)
    assert cms_join_size(big_a, big_b) == exact
    # tight geometry: collisions only ever ADD -> upper bound
    small_a = cms_build(ha, d=4, w=64)
    small_b = cms_build(hb, d=4, w=64)
    assert cms_join_size(small_a, small_b) >= exact
    with pytest.raises(ValueError):
        cms_join_size(big_a, small_b)
