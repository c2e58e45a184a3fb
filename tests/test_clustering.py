import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.clustering import (
    cluster_report,
    connected_components,
    dedup_near,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


@pytest.mark.parametrize("driver_max_edges", [5_000_000, 0])
def test_components_multi_hop_chain(spark, driver_max_edges):
    # path 1-2-3-4-5 plus disjoint edge 10-11: propagation must cross hops;
    # runs both the driver union-find and the distributed fixpoint paths
    cc = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]),
        driver_max_edges=driver_max_edges,
    )
    got = {r["id"]: r["component"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_components_direction_and_merge(spark):
    # edges given in arbitrary direction; two chains merging via a bridge
    cc = connected_components(
        _pairs(spark, [(7, 3), (3, 9), (20, 9), (40, 41)])
    )
    got = {r["id"]: r["component"] for r in cc.collect()}
    assert got == {3: 3, 7: 3, 9: 3, 20: 3, 40: 40, 41: 40}


def test_components_random_graph_vs_bruteforce(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(100))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    # brute-force union-find
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    in_graph = {n for e in edges for n in e}
    expected = {}
    for n in in_graph:
        root = find(n)
        expected.setdefault(root, []).append(n)
    want = {}
    for members in expected.values():
        m = min(members)
        for n in members:
            want[n] = m
    for dme in (5_000_000, 0):  # driver union-find AND distributed fixpoint
        cc = connected_components(_pairs(spark, edges), driver_max_edges=dme)
        got = {r["id"]: r["component"] for r in cc.collect()}
        assert got == want


def test_cluster_report(spark):
    rep = cluster_report(_pairs(spark, [(1, 2), (2, 3), (8, 9)]))
    got = {r["component"]: r["n_members"] for r in rep.collect()}
    assert got == {1: 3, 8: 2}


def test_dedup_near_keeps_representative_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 4)])
    kept = dedup_near(docs, pairs, "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 3, 5]


def test_max_iter_caps_iterations(spark):
    # a 6-node path with max_iter=1 (distributed path): no crash
    cc = connected_components(
        _pairs(spark, [(i, i + 1) for i in range(1, 6)]),
        max_iter=1,
        driver_max_edges=0,
    )
    assert cc.count() == 6


def test_components_distributed_large_random_graph(spark):
    """Distributed fixpoint on a 5k-node / 8k-edge random graph (forced past
    the driver path) must agree with union-find."""
    import random

    rng = random.Random(11)
    edges = list({
        tuple(sorted((rng.randrange(5000), rng.randrange(5000))))
        for _ in range(8000)
    })
    edges = [(a, b) for a, b in edges if a != b]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    want = {n: find(n) for n in parent}
    cc = connected_components(_pairs(spark, edges), driver_max_edges=0)
    got = {r["id"]: r["component"] for r in cc.collect()}
    assert got == want


def test_lsh_recall_report_on_neardup_corpus(spark):
    """Measured recall on a corpus with planted near-dups must hit 1.0
    at 16 bands (pair similarity >= 0.9, miss prob < 1e-7) and the
    report's bookkeeping must be internally consistent."""
    from bitfilters_spark.operators.dedup import lsh_recall_report

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rep = lsh_recall_report(
        docs, "doc_id", "text", k=64, bands=16, threshold=0.5,
        sample_threshold=512, sample_mask=1023,  # ~half the corpus
    )
    assert rep["n_sample"] > 100
    assert rep["true_pairs"] > 0
    assert rep["recall"] == 1.0
    assert rep["hit_pairs"] == rep["true_pairs"] == rep["found_pairs"]
    assert rep["candidate_pairs"] >= rep["found_pairs"]
    assert 0 < rep["candidate_precision"] <= 1.0
    # S-curve AT the threshold: 1-(1-0.5^4)^16 = 0.6439...; measured
    # recall beats it because the planted pairs sit far above threshold
    assert rep["predicted_recall_at_threshold"] == pytest.approx(0.643926, abs=1e-6)


def test_lsh_recall_report_weak_banding_detected(spark):
    """A deliberately weak configuration (1 band of 64 rows: candidate
    prob s^64, ~0 below s=0.95) must MEASURE near-zero recall — the
    report is the tool that catches a bad config before a 100 TB run."""
    from bitfilters_spark.operators.dedup import lsh_recall_report

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rep = lsh_recall_report(
        docs, "doc_id", "text", k=64, bands=1, threshold=0.5,
        sample_threshold=512, sample_mask=1023,
    )
    assert rep["true_pairs"] > 0
    # planted near-dups sit at j ~0.9+; s^64 at 0.9 is ~0.001, at 1.0 it
    # is 1 — so exact duplicates still surface but recall is far from 1
    assert rep["recall"] < rep["predicted_recall_at_threshold"] + 0.5
    assert rep["predicted_recall_at_threshold"] < 0.01
