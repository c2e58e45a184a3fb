"""SimHash multi-probe banding: exact recall vs numpy brute force, and a
bounded-bucket guarantee on a skewed corpus (the scale property the old
7-bit exact-band scheme lacked — its <=128 distinct band values made every
bucket Θ(n/128) and the self-join quadratic)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.dedup import (
    simhash_banding,
    simhash_candidates,
    simhash_near_pairs,
    simhash_pairs_from_sigs,
)


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, int(np.int64(np.uint64(s)))) for i, s in enumerate(sigs)],
        "doc_id long, simhash long",
    )


def _brute_pairs(sigs, max_hamming):
    a = np.asarray(sigs, dtype=np.uint64)
    x = a[:, None] ^ a[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    for b in range(64):
        ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
    out = set()
    n = len(a)
    for i in range(n):
        for j in range(i + 1, n):
            if ham[i, j] <= max_hamming:
                out.add((i, j, int(ham[i, j])))
    return out


@pytest.mark.parametrize("max_hamming", [0, 2, 4, 8])
def test_banding_matches_bruteforce(spark, max_hamming):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 2**63, size=40, dtype=np.uint64)
    sigs = list(base)
    # planted near-dups at assorted distances 1..10 off the first few bases
    for k in range(30):
        s = base[k % 10]
        for b in rng.choice(64, size=(k % 10) + 1, replace=False):
            s ^= np.uint64(1) << np.uint64(b)
        sigs.append(s)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs_from_sigs(
            _sig_df(spark, sigs), "doc_id", max_hamming
        ).collect()
    }
    assert got == _brute_pairs(sigs, max_hamming)


def test_default_banding_is_wide():
    n_bands, radius, widths, starts = simhash_banding(8)
    assert n_bands == 3 and radius == 2
    assert min(widths) >= 21  # >=2^21 bucket values, vs 2^7 in h+1 banding
    assert sum(widths) == 64 and starts[0] == 0


def test_skewed_corpus_buckets_stay_bounded(spark):
    # Adversarial for the OLD scheme (9 exact 7-bit bands): every signature
    # shares bits 0..6 (old band 0), so the old blocking puts ALL n docs in
    # one bucket -> Θ(n²) candidates even though random high bits make true
    # pairs essentially nonexistent. The new 3x~21-bit multi-probe bands
    # mix the 7 constant bits with 15 random ones, so bucket collisions —
    # and hence candidates — track the (tiny) true-pair count instead.
    rng = np.random.default_rng(11)
    n = 300
    common = np.uint64(rng.integers(0, 128, dtype=np.uint64))  # bits 0..6
    sigs = [
        common | (np.uint64(rng.integers(0, 2**57, dtype=np.uint64)) << np.uint64(7))
        for _ in range(n)
    ]
    # planted: one cluster of 4 near-dups of sigs[0] (hamming 1..3) that
    # MUST survive in the output
    for d in (1, 2, 3):
        s = sigs[0]
        for b in rng.choice(64, size=d, replace=False):
            s ^= np.uint64(1) << np.uint64(b)
        sigs.append(s)
    n = len(sigs)
    df = _sig_df(spark, sigs)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs_from_sigs(df, "doc_id", 8).collect()
    }
    truth = _brute_pairs(sigs, 8)
    assert got == truth
    planted = {(a, b) for a, b, _ in truth}
    assert {(0, 300), (0, 301), (0, 302)} <= planted  # cluster recalled

    # candidate bound: the pre-verify join output must stay far below the
    # n²/2 rows a quadratic scheme would produce (old 7-bit exact bands
    # put ALL docs in one band-0 bucket here). Asymmetric probing also
    # caps multiplicity at n_bands per pair.
    candidates = simhash_candidates(df, "doc_id", 8).count()
    assert candidates < 0.2 * (n * (n - 1) / 2)


def test_near_pairs_end_to_end_unchanged(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different text about spark and parquet files"),
        ],
        "doc_id long, text string",
    )
    rows = simhash_near_pairs(docs, "doc_id", "text", max_hamming=16, native=False).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert (1, 2) in got and (1, 3) not in got and (2, 3) not in got


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_candidate_join_broadcast_is_deterministic_not_aqe(spark):
    """Pins the r9 stress fix: at 50k docs the r8 path left the broadcast
    decision to the optimizer's static estimate of an exploded cached
    subplan, which flipped the candidate join to sort-merge and shuffled
    the ~240x-exploded probe side (13.3 s -> 65.1 s in the r8 stress
    artifact). The index side must now broadcast by explicit hint
    whenever n_docs * n_bands <= index_broadcast_rows — visible in the
    STATIC plan, no AQE discretion — and fall back to a plain equi-join
    above the threshold (cluster-scale corpora, where a broadcast could
    not fit)."""
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.dedup import simhash_pairs_from_sigs

    # 50k docs — the exact scale where the r8 stress run lost the broadcast
    sig = spark.range(50_000).select(
        F.col("id").alias("doc_id"), F.xxhash64("id").alias("simhash")
    ).cache()
    try:
        plan = _plan_of(simhash_pairs_from_sigs(sig, "doc_id", 8))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan, "probe side must never shuffle here"
    finally:
        sig.unpersist()

    # the strongest pin: with the optimizer's own broadcasting disabled
    # entirely, the explicit hint must still force the broadcast (it is a
    # hint, not an estimate) — and above the row threshold the hint must
    # be absent, degrading to the shuffled equi-join scale path
    from bitfilters_spark.operators.dedup import simhash_candidates

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = spark.range(100).select(
            F.col("id").alias("doc_id"), F.xxhash64("id").alias("simhash")
        )
        plan2 = _plan_of(simhash_candidates(small, "doc_id", 8))
        assert "BroadcastHashJoin" in plan2, "hint must not depend on conf"
        plan3 = _plan_of(
            simhash_candidates(small, "doc_id", 8, index_broadcast_rows=10)
        )
        assert "BroadcastHashJoin" not in plan3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
