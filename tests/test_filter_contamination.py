"""Filter-prefiltered benchmark decontamination
(operators/text.filter_contamination): the engine's AMQ kernels pointed
at eval n-grams — no false negatives ever, bounded overcount, and the
verify path exactly equal to the broadcast-set ngram_contamination."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.text import (
    filter_contamination,
    ngram_contamination,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _mk_docs(spark):
    rows = []
    for i in range(40):
        toks = [WORDS[(i + j) % len(WORDS)] + str((i * 7 + j) % 11) for j in range(30)]
        if i % 4 == 0:
            # plant a contaminated run: 8 tokens straight from the bench
            toks[10:18] = [f"bench{k}" for k in range(8)]
        rows.append((i, " ".join(toks)))
    rows.append((100, "short doc"))  # < n tokens: no output row
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_bench(spark):
    rows = [
        (0, " ".join(f"bench{k}" for k in range(12))),
        (1, " ".join(f"other{k}" for k in range(12))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("kind", ["xor16", "bloom"])
def test_verify_path_equals_exact_contamination(spark, kind):
    docs, bench = _mk_docs(spark), _mk_bench(spark)
    exact = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in ngram_contamination(docs, bench, n=5).collect()
    }
    got = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["n_hit"])
        for r in filter_contamination(docs, bench, n=5, kind=kind).collect()
    }
    assert set(got) == set(exact)
    for did, (n_grams, n_flagged, n_hit) in got.items():
        assert (n_grams, n_hit) == exact[did]
        # AMQ law: no false negatives, overcount only
        assert n_flagged >= n_hit
    # the planted docs are caught, the clean ones exactly zero hits
    assert all(got[d][2] > 0 for d in got if d % 4 == 0 and d != 100)
    assert all(got[d][2] == 0 for d in got if d % 4 != 0)
    # short doc produced no row
    assert 100 not in got


def test_no_verify_superset_and_clean_proof(spark):
    docs, bench = _mk_docs(spark), _mk_bench(spark)
    exact = {
        r["doc_id"]: r["n_hit"]
        for r in ngram_contamination(docs, bench, n=5).collect()
    }
    got = {
        r["doc_id"]: r["n_flagged"]
        for r in filter_contamination(
            docs, bench, n=5, kind="xor16", verify=False
        ).collect()
    }
    for did, n_flagged in got.items():
        assert n_flagged >= exact[did]
        if n_flagged == 0:  # n_flagged = 0 is a PROOF of cleanliness
            assert exact[did] == 0


def test_sharded_build_same_answers(spark):
    docs, bench = _mk_docs(spark), _mk_bench(spark)
    a = {
        (r["doc_id"], r["n_grams"], r["n_hit"])
        for r in filter_contamination(docs, bench, n=5, kind="xor16").collect()
    }
    b = {
        (r["doc_id"], r["n_grams"], r["n_hit"])
        for r in filter_contamination(
            docs, bench, n=5, kind="xor16", num_shards=4
        ).collect()
    }
    assert a == b


def test_capacity_kind_auto_sizing():
    """ADVICE r12: capacity-bound kinds must size from the gram count —
    the derivation pins a power-of-two cuckoo table at <=0.84 load and a
    quotient q at <=0.85 load, and never overrides explicit kwargs."""
    from bitfilters_spark.operators.text import _size_capacity_kind

    nk = 1_000_000
    ck = _size_capacity_kind("cuckoo", nk, {})
    nb = ck["nbuckets"]
    assert nb & (nb - 1) == 0  # power of two (core/cuckoo.py requires)
    assert nk <= nb * 4 * 0.84 + 4  # fits at safe load, default bucket_size
    ck1 = _size_capacity_kind("cuckoo", nk, {"bucket_size": 1})
    assert ck1["nbuckets"] >= nb * 4 / 2  # smaller buckets -> more of them
    qk = _size_capacity_kind("quotient", nk, {})
    assert (1 << qk["q"]) * 0.85 >= nk
    # explicit geometry is respected verbatim
    assert _size_capacity_kind("cuckoo", nk, {"nbuckets": 64}) == {"nbuckets": 64}
    assert _size_capacity_kind("quotient", nk, {"q": 10}) == {"q": 10}
    # non-capacity kinds pass through untouched
    assert _size_capacity_kind("xor16", nk, {}) == {}


def test_capacity_kinds_end_to_end(spark):
    """cuckoo/quotient rides filter_contamination with DERIVED geometry
    and still satisfies the operator laws (verify ≡ exact)."""
    docs, bench = _mk_docs(spark), _mk_bench(spark)
    exact = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in ngram_contamination(docs, bench, n=5).collect()
    }
    for kind in ("cuckoo", "quotient"):
        got = {
            r["doc_id"]: (r["n_grams"], r["n_flagged"], r["n_hit"])
            for r in filter_contamination(docs, bench, n=5, kind=kind).collect()
        }
        assert set(got) == set(exact)
        for did, (n_grams, n_flagged, n_hit) in got.items():
            assert (n_grams, n_hit) == exact[did]
            assert n_flagged >= n_hit


def test_duckdb_parity_mode_matches_native(spark):
    """native=False (string shingles + DuckDB-parity hash, the gate
    path) preserves the operator laws: verify path ≡ exact
    contamination, flags ≥ hits."""
    docs, bench = _mk_docs(spark), _mk_bench(spark)
    exact = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in ngram_contamination(docs, bench, n=5).collect()
    }
    got = {
        r["doc_id"]: (r["n_grams"], r["n_flagged"], r["n_hit"])
        for r in filter_contamination(
            docs, bench, n=5, kind="duckdb_bloom", native=False,
            num_sectors=1024,
        ).collect()
    }
    assert set(got) == set(exact)
    for did, (n_grams, n_flagged, n_hit) in got.items():
        assert (n_grams, n_hit) == exact[did]
        assert n_flagged >= n_hit


def test_lcs_contamination_exact_lengths(spark):
    """#164: pairs sharing a contiguous >= min_lcs token run are found
    with the EXACT run length (python DP replay); sub-threshold overlap
    and disjoint docs produce no pair; recall is complete by the
    gram-prefilter containment law."""
    from bitfilters_spark.operators.text import lcs_contamination

    bench_rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "pack my box with five dozen liquor jugs now please"),
    ]
    doc_rows = [
        # verbatim 10-token paste of bench 0 inside noise -> lcs 10
        (10, "x1 x2 " + bench_rows[0][1] + " y1 y2"),
        # 6-token run of bench 1 (min_lcs=5 catches, length exactly 6)
        (11, "z1 pack my box with five dozen z2 z3 z4 z5"),
        # 4-token run only -> BELOW min_lcs=5, no pair
        (12, "w1 the quick brown fox w2 w3 w4 w5 w6 w7"),
        # disjoint
        (13, "completely unrelated content with no shared runs at all"),
    ]
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["bench_id"]): r["lcs_tokens"]
        for r in lcs_contamination(docs, bench, min_lcs=5).collect()
    }
    assert got == {(10, 0): 10, (11, 1): 6}

    # brute-force law on random token soup: every pair the DP replay
    # says has a run >= 5 appears with the identical length
    import numpy as np
    rng = np.random.default_rng(4)
    vocab = [f"t{i}" for i in range(30)]
    bench2_rows = [(i, " ".join(rng.choice(vocab, 12))) for i in range(5)]
    docs2_rows = [(100 + i, " ".join(rng.choice(vocab, 40))) for i in range(20)]
    docs2 = spark.createDataFrame(docs2_rows, "doc_id long, text string")
    bench2 = spark.createDataFrame(bench2_rows, "doc_id long, text string")

    def lcs(a, b):
        a, b = a.split(" "), b.split(" ")
        best = 0
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0] * (len(b) + 1)
            for j, y in enumerate(b):
                if x == y:
                    cur[j + 1] = prev[j] + 1
                    best = max(best, cur[j + 1])
            prev = cur
        return best

    want = {
        (d, b): lcs(td, tb)
        for d, td in docs2_rows
        for b, tb in bench2_rows
        if lcs(td, tb) >= 3
    }
    got2 = {
        (r["doc_id"], r["bench_id"]): r["lcs_tokens"]
        for r in lcs_contamination(docs2, bench2, min_lcs=3).collect()
    }
    assert got2 == want
    import pytest as _p
    with _p.raises(ValueError, match="min_lcs"):
        lcs_contamination(docs, bench, min_lcs=1)
