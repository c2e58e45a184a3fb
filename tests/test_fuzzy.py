"""Edit-distance join (#103): brute-force parity (complete recall +
exact precision), randomized corpora via hypothesis-style generation,
self-join dedup form, edge lengths."""

import random

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.fuzzy import fuzzy_dedup_pairs, fuzzy_join


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(left, right, d):
    return sorted(
        (i, j, _lev(a, b))
        for i, a in left
        for j, b in right
        if _lev(a, b) <= d
    )


def _check(spark, left, right, d, strategies=("segment", "deletion")):
    L = spark.createDataFrame(left, "left_id long, name string")
    R = spark.createDataFrame(right, "right_id long, name string")
    want = _brute(left, right, d)
    for s in strategies:
        if s == "deletion" and d > 2:
            continue
        got = sorted(
            (r["left_id"], r["right_id"], r["dist"])
            for r in fuzzy_join(L, R, "name", "name", d, strategy=s).collect()
        )
        assert got == want, s


NAMES = ["john smith", "jon smith", "john smyth", "jane smith", "j smith",
         "johann schmidt", "smith john", "john  smith", "johnsmith", ""]


def test_fuzzy_join_matches_brute_force_names(spark):
    left = list(enumerate(NAMES))
    right = [(100 + i, n) for i, n in enumerate(NAMES + ["john smitt", "x"])]
    for d in (0, 1, 2, 3):
        _check(spark, left, right, d)


def test_fuzzy_join_random_corpus(spark):
    rng = random.Random(7)
    alpha = "abc"  # tiny alphabet maximizes near-collisions
    def rand_str():
        return "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 9)))
    left = [(i, rand_str()) for i in range(60)]
    right = [(100 + i, rand_str()) for i in range(60)]
    for d in (1, 2):
        _check(spark, left, right, d)


def test_fuzzy_join_length_edges(spark):
    # strings shorter than d+1 chars ride the fallback block
    left = [(0, ""), (1, "a"), (2, "ab"), (3, "abcdef")]
    right = [(10, ""), (11, "b"), (12, "ba"), (13, "abcdfe"), (14, "abcdefgh")]
    for d in (0, 1, 2):
        _check(spark, left, right, d)


def test_fuzzy_join_nulls_never_match(spark):
    L = spark.createDataFrame([(0, None), (1, "abc")], "left_id long, name string")
    R = spark.createDataFrame([(10, None), (11, "abc")], "right_id long, name string")
    got = fuzzy_join(L, R, "name", "name", 2).collect()
    assert [(r["left_id"], r["right_id"]) for r in got] == [(1, 11)]


def test_fuzzy_dedup_pairs_self_join(spark):
    rows = list(enumerate(["alpha", "alpah", "beta", "betta", "gamma"]))
    df = spark.createDataFrame(rows, "doc_id long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_dedup_pairs(df, "doc_id", "name", 2).collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= 2
    )
    assert got == want


def test_fuzzy_join_plan_has_no_cartesian_on_long_strings(spark):
    left = spark.createDataFrame(
        [(i, f"customer name number {i:04d}") for i in range(50)],
        "left_id long, name string",
    )
    right = spark.createDataFrame(
        [(i, f"customer name number {i:04d}x") for i in range(50)],
        "right_id long, name string",
    )
    plan = fuzzy_join(left, right, "name", "name", 2)._jdf.queryExecution().executedPlan().toString()
    # strings are all >= d+1 chars: the tiny-fallback cross join must be
    # empty-pruned or trivially small; the candidate path is an equi-join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_fuzzy_dedup_canonical_with_chains(spark):
    """a-b-c chains collapse to one cluster even when lev(a,c) > d."""
    from bitfilters_spark.operators.fuzzy import fuzzy_dedup

    rows = [
        (0, "alpha"), (1, "alphb"), (2, "alhpb"),
        (3, "omega"), (4, "omegas"),
        (5, "solo"),
        # true chain: 6-7 and 7-8 are 1 edit apart, 6-8 is 2 — CC merges
        (6, "aaaa"), (7, "aaab"), (8, "aabb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string")
    kept = sorted(r["doc_id"] for r in fuzzy_dedup(df, "doc_id", "name", 1).collect())
    # d=1 edges: (0,1), (3,4), (6,7), (7,8) -> keep cluster minima + singletons
    assert kept == [0, 2, 3, 5, 6]


def test_fuzzy_join_deletion_strategy_shared_prefix_corpus(spark):
    """The hot-segment case PassJoin suffers on: every key shares a long
    template prefix. Deletion blocking must stay exact (and is the
    documented strategy for this shape)."""
    left = [(i, f"Supplier#{i:09d}") for i in range(80)]
    right = [(100 + i, f"Supplier#{i:09d}") for i in range(0, 160, 2)]
    for d in (1, 2):
        _check(spark, left, right, d)


def test_fuzzy_join_deletion_rejects_large_d(spark):
    df = spark.createDataFrame([(0, "abc")], "left_id long, name string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_dist <= 2"):
        fuzzy_join(df, df, "name", "name", 3, strategy="deletion")


def test_fuzzy_short_string_corpus_no_cross_join(spark):
    """The r7 latent hazard: a corpus dominated by strings shorter than
    d+1 chars used to broadcast-cross-join under strategy="segment".
    Now it routes through the distributed deletion-neighborhood join —
    assert brute-force parity AND that no cartesian / broadcast
    nested-loop join appears anywhere in the plan."""
    rng = random.Random(11)
    alpha = "abcdef"
    left = [(i, "".join(rng.choice(alpha) for _ in range(rng.randint(1, 3))))
            for i in range(60)]
    right = [(100 + i, "".join(rng.choice(alpha) for _ in range(rng.randint(1, 4))))
             for i in range(60)]
    L = spark.createDataFrame(left, "left_id long, name string")
    R = spark.createDataFrame(right, "right_id long, name string")
    for d in (1, 2):
        q = fuzzy_join(L, R, "name", "name", d)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        got = sorted((r["left_id"], r["right_id"], r["dist"]) for r in q.collect())
        assert got == _brute(left, right, d)


def test_fuzzy_short_string_d3_salted_block_parity(spark):
    """d >= 3 short-string fallback: salted block join, still exact."""
    rng = random.Random(13)
    left = [(i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 3))))
            for i in range(25)]
    right = [(100 + i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 6))))
             for i in range(25)]
    L = spark.createDataFrame(left, "left_id long, name string")
    R = spark.createDataFrame(right, "right_id long, name string")
    q = fuzzy_join(L, R, "name", "name", 3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = sorted((r["left_id"], r["right_id"], r["dist"]) for r in q.collect())
    assert got == _brute(left, right, 3)


def test_fuzzy_short_string_d3_guard_fails_fast(spark):
    """The count guard refuses a quadratic short-string fallback instead
    of running it away silently."""
    rows = [(i, "ab") for i in range(40)]
    df = spark.createDataFrame(rows, "left_id long, name string")
    R = df.withColumnRenamed("left_id", "right_id")
    with pytest.raises(ValueError, match="max_tiny_pairs"):
        fuzzy_join(df, R, "name", "name", 3, max_tiny_pairs=100).collect()
    # raising the bound explicitly accepts the cost and stays exact
    got = fuzzy_join(df, R, "name", "name", 3, max_tiny_pairs=10_000)
    assert got.count() == 40 * 40
