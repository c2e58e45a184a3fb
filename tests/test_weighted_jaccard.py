"""Weighted (tf) Jaccard pairs + ICWS consistent weighted sampling (#125).

Exactness: `weighted_jaccard_pairs` vs a Counter-arithmetic brute force.
Sketch law: ICWS per-sample collision probability equals J_w (Ioffe 2010)
— measured on a known pair at k=512 within a CLT-sized tolerance.
"""

from collections import Counter
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.dedup import (
    icws_lsh_pairs,
    icws_signatures,
    shingle_jaccard_pairs,
    weighted_jaccard_pairs,
)


def _brute(rows, shingle_n=1, threshold=0.0):
    def terms(text):
        toks = text.split(" ")
        if shingle_n == 1:
            return toks
        if len(toks) < shingle_n:
            return []
        return [
            " ".join(toks[i : i + shingle_n])
            for i in range(len(toks) - shingle_n + 1)
        ]

    tf = {i: Counter(terms(t)) for i, t in rows}
    out = {}
    for (ia, ca), (ib, cb) in combinations(sorted(tf.items()), 2):
        ism = sum((ca & cb).values())
        union = sum(ca.values()) + sum(cb.values()) - ism
        if ism and union and ism / union >= threshold:
            out[(ia, ib)] = round(ism / union, 6)
    return out


CORPUS = [
    (1, "the cat sat on the mat the cat"),
    (2, "the cat sat on the mat"),
    (3, "a dog ran over a hill a dog ran"),
    (4, "a dog ran over a hill"),
    (5, "completely unrelated text about spark engines"),
    (6, "the cat sat on the mat the cat"),  # exact dup of 1
]


def test_exact_matches_brute_force_tokens(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.wjaccard
        for r in weighted_jaccard_pairs(
            df, "doc_id", "text", shingle_n=1, threshold=0.2
        ).collect()
    }
    assert got == pytest.approx(_brute(CORPUS, 1, 0.2))


def test_exact_matches_brute_force_shingles(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.wjaccard
        for r in weighted_jaccard_pairs(
            df, "doc_id", "text", shingle_n=2, threshold=0.1
        ).collect()
    }
    assert got == pytest.approx(_brute(CORPUS, 2, 0.1))


def test_repetition_separates_where_set_jaccard_is_blind(spark):
    """Doc B = doc A's passage repeated 5x: identical shingle SETS (set
    Jaccard 1.0) but weighted Jaccard n_a/n_b — the boilerplate profile
    this operator exists for."""
    passage = "spark shuffles partition data across the cluster nodes"
    rows = [(1, passage), (2, " ".join([passage] * 5))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sj = shingle_jaccard_pairs(df, "doc_id", "text", shingle_n=1, threshold=0.9)
    assert [r.jaccard for r in sj.collect()] == [1.0]
    wj = weighted_jaccard_pairs(df, "doc_id", "text", shingle_n=1, threshold=0.0)
    [row] = wj.collect()
    assert row.wjaccard == pytest.approx(8 / 40, abs=1e-9)


def test_df_cap_parity_when_no_term_is_hot(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    base = weighted_jaccard_pairs(df, "doc_id", "text", threshold=0.2)
    capped = weighted_jaccard_pairs(df, "doc_id", "text", threshold=0.2, df_cap=100)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, capped.collect()))


def test_df_cap_hot_terms_keep_exact_values(spark):
    """'the' appears in every doc; df_cap=3 excludes it from blocking but
    its min-mass must still be counted in every emitted value (each
    qualifying pair also shares cold terms, so recall is unaffected)."""
    rows = [
        (1, "the cat sat the mat the"),
        (2, "the cat sat the mat"),
        (3, "the dog ran the hill the"),
        (4, "the dog ran the hill"),
        (5, "the unique words here differ"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = {
        (r.id_a, r.id_b): r.wjaccard
        for r in weighted_jaccard_pairs(
            df, "doc_id", "text", threshold=0.3, df_cap=3
        ).collect()
    }
    # documented recall caveat: a pair whose ONLY shared term is hot
    # ((1,3): just 'the') is not blocked together; every pair that does
    # share a cold term must carry the exact full value, hot mass included
    tf = {i: Counter(t.split(" ")) for i, t in rows}
    expected = {
        pair: v
        for pair, v in _brute(rows, 1, 0.3).items()
        if any(
            t != "the" for t in tf[pair[0]].keys() & tf[pair[1]].keys()
        )
    }
    assert (1, 3) not in expected and (1, 2) in expected
    assert capped == pytest.approx(expected)


def test_icws_collision_probability_tracks_weighted_jaccard(spark):
    rows = [
        (1, "alpha beta gamma delta alpha beta alpha"),
        (2, "alpha beta gamma epsilon alpha zeta"),
    ]
    jw = _brute(rows)[(1, 2)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    k = 512
    sigs = {
        r.doc_id: r.sig
        for r in icws_signatures(df, "doc_id", "text", k=k).collect()
    }
    match = sum(a == b for a, b in zip(sigs[1], sigs[2])) / k
    # 3.5 sigma at p~=jw, k=512
    assert abs(match - jw) < 3.5 * (jw * (1 - jw) / k) ** 0.5 + 1e-9
    # determinism: a second run produces identical signatures
    sigs2 = {
        r.doc_id: r.sig
        for r in icws_signatures(df, "doc_id", "text", k=k).collect()
    }
    assert sigs == sigs2


def test_icws_identical_docs_match_every_sample(spark):
    df = spark.createDataFrame(
        [(1, "x y z x y"), (2, "x y z x y")], ["doc_id", "text"]
    )
    s = {r.doc_id: r.sig for r in icws_signatures(df, "doc_id", "text", k=64).collect()}
    assert s[1] == s[2]


def test_icws_lsh_pairs_values_are_exact(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    exact = _brute(CORPUS, 1, 0.5)
    got = {
        (r.id_a, r.id_b): r.wjaccard
        for r in icws_lsh_pairs(
            df, "doc_id", "text", k=64, bands=32, threshold=0.5
        ).collect()
    }
    # every emitted value is the exact J_w; the planted exact-dup pair
    # (1, 6) is always found (J_w = 1.0 collides in every band)
    for pair, v in got.items():
        assert v == pytest.approx(exact[pair])
    assert (1, 6) in got and got[(1, 6)] == 1.0


def test_empty_and_short_docs_do_not_crash(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two three"), (4, "one two three")],
        ["doc_id", "text"],
    )
    out = weighted_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in out} >= {(3, 4)}
    icws_lsh_pairs(df, "doc_id", "text", k=16, bands=8, threshold=0.5).collect()
