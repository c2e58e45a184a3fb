"""Link-graph authority (#135, operators/graph.py): quantized power
iteration — exact vs a pure-Python reference (the quantization makes
float sums order-independent, so equality is ==, not approx), SQL-oracle
self-consistency on DuckDB, and composition with the crawl frontier."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.graph import pagerank, pagerank_oracle_sql


def _reference(edges, iters, d=0.85, qbits=30):
    """Pure-Python replay of the documented arithmetic."""
    q = float(1 << qbits)
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iters):
        sums = {}
        for s, t in e:
            c = np.floor(rank[s] / deg[s] * q) / q
            sums[t] = sums.get(t, 0.0) + c
        # (1.0 - d), not a 0.15 literal: the operator computes the base
        # as lit(1.0 - damping) and the two doubles differ by one ulp
        rank = {
            n: np.floor(((1.0 - 0.85) + 0.85 * sums.get(n, 0.0)) * q) / q
            for n in nodes
        }
    return rank


@pytest.fixture(scope="module")
def edges(spark):
    rng = np.random.default_rng(5)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(300, 2))
             if a != b}
    df = spark.createDataFrame(sorted(pairs), "src long, dst long")
    return df, sorted(pairs)


def test_pagerank_exactly_matches_reference(spark, edges):
    df, pairs = edges
    got = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst", iters=4).collect()}
    want = _reference(pairs, iters=4)
    assert got == want  # bit-exact, no tolerance: the quantization law
    # authority flows: a node with many in-links outranks a sink with none
    indeg = {}
    for _, t in pairs:
        indeg[t] = indeg.get(t, 0) + 1
    hub = max(indeg, key=indeg.get)
    no_in = [n for n in got if indeg.get(n, 0) == 0]
    assert all(got[hub] > got[n] for n in no_in)


def test_pagerank_oracle_sql_matches_spark(spark, edges):
    """The unrolled-CTE SQL replay returns the same (node, rank) rows on
    DuckDB — the exactness contract the driver row relies on."""
    import duckdb

    df, pairs = edges
    got = sorted(
        (r["node"], r["rank"])
        for r in pagerank(df, "src", "dst", iters=3).collect()
    )
    con = duckdb.connect()
    con.register("edata", df.toPandas())
    sql = pagerank_oracle_sql("SELECT src, dst FROM edata", iters=3)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want


def test_pagerank_feeds_frontier_priority(spark, edges):
    """Composition: host authority becomes the frontier's priority —
    higher-ranked hosts release in earlier politeness rounds."""
    from bitfilters_spark.operators.web import url_frontier_schedule

    df, pairs = edges
    ranks = pagerank(df, "src", "dst", iters=3)
    urls = ranks.select(
        F.concat(F.lit("http://h"), "node", F.lit("/page")).alias("url"),
        F.concat(F.lit("h"), "node").alias("host"),
        F.col("rank").alias("priority"),
    )
    sched = url_frontier_schedule(
        urls, "url", host_col="host", priority_col="priority",
        per_host_per_round=1,
    )
    # one URL per host here => everything lands in round 1, but the
    # fetcher assignment and priority column must survive the compose
    rows = sched.collect()
    assert len(rows) == urls.count()


def test_pagerank_guards(spark, edges):
    df, _ = edges
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, "src", "dst", damping=1.5)
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, "src", "dst", iters=-1)
    # iters=0: everyone at the initial rank
    got = {r["rank"] for r in pagerank(df, "src", "dst", iters=0).collect()}
    assert got == {1.0}


def test_pagerank_edge_shuffle_reused_across_iterations(spark):
    """100 TB posture (r10 verdict #4): in the non-broadcast regime the
    per-iteration edge⋈ranks / edge⋈deg joins must NOT re-shuffle the
    edge list k times. localCheckpoint + AQE loses partitioning info
    (so pre-partitioning cannot satisfy the joins statically), but every
    iteration's edge Exchange is canonically identical and AQE
    materializes ONE shuffle stage reused by all k iterations — the
    executed plan carries exactly one distinct ShuffleQueryStage id over
    the edge ExistingRDD scan, independent of k."""
    import contextlib
    import io
    import re

    from pyspark.sql import functions as F

    from bitfilters_spark.operators.graph import pagerank

    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 89).alias("dst")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        stage_ids = {}
        for k in (3, 6):
            df = pagerank(edges, "src", "dst", iters=k)
            df.collect()  # materialize so the adaptive plan is final
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="simple")
            plan = buf.getvalue()
            ids = re.findall(
                r"ShuffleQueryStage (\d+)[^\n]*\n[^\n]*Exchange hashpartitioning"
                r"\(src#\d+L[^\n]*\n[^\n]*Scan ExistingRDD\[src#\d+L,dst#\d+L\]",
                plan,
            )
            assert len(set(ids)) == 1, f"k={k}: edge shuffle stages {ids}"
            stage_ids[k] = set(ids)
        # one materialized edge shuffle at k=3 AND k=6 — not k of them
        assert len(stage_ids[3]) == len(stage_ids[6]) == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _reference_dangling(edges, iters, d=0.85, qbits=30):
    """Pure-Python replay of the dangling='redistribute' arithmetic."""
    import math

    q = float(1 << qbits)
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iters):
        dm = sum(rank[n] for n in nodes if n not in deg)
        extra = math.floor(d * dm / len(nodes) * q) / q
        sums = {}
        for s, t in e:
            c = math.floor(rank[s] / deg[s] * q) / q
            sums[t] = sums.get(t, 0.0) + c
        rank = {
            n: math.floor(((1.0 - d) + d * sums.get(n, 0.0) + extra) * q) / q
            for n in nodes
        }
    return rank


def test_pagerank_dangling_redistribution_matches_reference(spark):
    """dangling='redistribute' (r11 variant): dangling-node mass is
    shared uniformly each iteration — exactly the pure-Python replay,
    and the dangling nodes' mass visibly lifts everyone vs the default
    (which lets it evaporate)."""
    # 0->1->2, 3->2; nodes 1? has out-edge; 2 is DANGLING (no out-edges)
    pairs = [(0, 1), (1, 2), (3, 2), (0, 3)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, "src", "dst", iters=4, dangling="redistribute"
        ).collect()
    }
    want = _reference_dangling(pairs, iters=4)
    assert got == want  # bit-exact
    plain = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", iters=4).collect()
    }
    assert all(got[n] >= plain[n] for n in got)
    assert sum(got.values()) > sum(plain.values())


def test_pagerank_tol_early_stop(spark):
    """tol: a generous tolerance stops after the first iteration (ranks
    equal the 1-iteration run); tol=0 runs all iterations (ranks equal
    the full run) on a graph that hasn't converged."""
    pairs = [(0, 1), (1, 0), (2, 0), (0, 2), (3, 0)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    one = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst", iters=1).collect()}
    full = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst", iters=6).collect()}
    lazy = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", iters=6, tol=1e9).collect()
    }
    strict = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", iters=6, tol=0.0).collect()
    }
    assert lazy == one
    assert strict == full
    with pytest.raises(ValueError, match="dangling"):
        pagerank(df, "src", "dst", dangling="bogus")


# ------------------------------------------------------------------ HITS ---


def _hits_reference(pairs, iters, norm):
    """Dense numpy HITS replay — same update/normalization order."""
    import numpy as np

    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in set(pairs):
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(nodes))
    a = np.zeros(len(nodes))

    def z(v):
        if norm == "l1":
            n = np.abs(v).sum()
        elif norm == "l2":
            n = np.sqrt((v * v).sum())
        else:
            n = np.abs(v).max()
        return v / max(n, 1e-300)

    for _ in range(iters):
        a = z(A.T @ h)
        h = z(A @ a)
    return {n: (h[idx[n]], a[idx[n]]) for n in nodes}


@pytest.mark.parametrize("norm", ["l1", "l2", "max"])
def test_hits_matches_numpy_reference(spark, norm):
    from bitfilters_spark.operators.graph import hits

    pairs = [
        (0, 1), (0, 2), (0, 3),       # 0 is a hub
        (4, 1), (4, 2),               # 4 a weaker hub
        (1, 5), (2, 5), (3, 5),       # 5 pointed at by authorities' targets
        (5, 0), (0, 1),               # duplicate edge collapses
    ]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, "src", "dst", iters=6, norm=norm).collect()
    }
    want = _hits_reference(pairs, 6, norm)
    assert set(got) == set(want)
    for n in want:
        assert got[n][0] == pytest.approx(want[n][0], abs=1e-9), ("hub", n)
        assert got[n][1] == pytest.approx(want[n][1], abs=1e-9), ("auth", n)
    # structural sanity: 0 out-hubs 4; 1/2 out-authority 3
    assert got[0][0] > got[4][0]
    assert got[1][1] > got[3][1]


def test_hits_guards_and_degenerate(spark):
    from bitfilters_spark.operators.graph import hits

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="norm"):
        hits(df, "src", "dst", norm="bogus")
    with pytest.raises(ValueError, match="iters"):
        hits(df, "src", "dst", iters=-1)
    # empty edges: empty result, no crash
    empty = spark.createDataFrame([], "src long, dst long")
    assert hits(empty, "src", "dst", iters=2).count() == 0
    # iters=0 returns the init vectors over the node set
    rows = {r["node"]: r for r in hits(df, "src", "dst", iters=0).collect()}
    assert rows[0]["hub"] == 1.0 and rows[0]["authority"] == 0.0
    # NULL endpoints dropped
    withnull = spark.createDataFrame(
        [(0, 1), (None, 2), (3, None)], "src long, dst long"
    )
    assert set(
        r["node"] for r in hits(withnull, "src", "dst", iters=1).collect()
    ) == {0, 1}


def test_hits_feeds_frontier_priority(spark):
    """Composition: authority scores rank the frontier exactly like
    pagerank does — the crawl loop can take either signal."""
    from bitfilters_spark.operators.graph import hits
    from bitfilters_spark.operators.web import url_frontier_schedule

    pairs = [(1, 10), (2, 10), (3, 10), (1, 20)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    auth = hits(edges, "src", "dst", iters=4).select(
        F.concat(F.lit("http://h"), F.col("node")).alias("url"),
        F.lit("hostA").alias("host"),
        F.col("authority").alias("priority"),
    )
    sched = url_frontier_schedule(
        auth, url_col="url", host_col="host", priority_col="priority",
        per_host_per_round=1,
    ).collect()
    first = [r for r in sched if r["round"] == 0]
    assert len(first) == 1 and first[0]["url"] == "http://h10"


def test_hits_quantized_oracle_sql_matches_spark(spark, edges):
    """hits_quantized's unrolled-CTE SQL replay returns the same
    (node, hub, authority) rows on DuckDB with ZERO tolerance — the
    exactness contract the r12 driver leg relies on (the signal whose
    un-quantized twin is numpy-pinned above)."""
    import duckdb

    from bitfilters_spark.operators.graph import hits_oracle_sql, hits_quantized

    df, pairs = edges
    got = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits_quantized(df, "src", "dst", iters=3).collect()
    )
    con = duckdb.connect()
    con.register("edata", df.toPandas())
    sql = hits_oracle_sql("SELECT src, dst FROM edata", iters=3)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want


def test_hits_quantized_tracks_hits(spark, edges):
    """The quantized variant stays within the accumulated quantization
    error of the float HITS (l1) — same leaders, near-identical
    values."""
    from bitfilters_spark.operators.graph import hits_quantized
    from bitfilters_spark.operators.graph import hits as hits_f

    df, pairs = edges
    a = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_f(df, "src", "dst", iters=3, norm="l1").collect()
    }
    b = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_quantized(df, "src", "dst", iters=3).collect()
    }
    assert set(a) == set(b)
    for n in a:
        assert a[n][0] == pytest.approx(b[n][0], abs=1e-6)
        assert a[n][1] == pytest.approx(b[n][1], abs=1e-6)
    top_a = max(a, key=lambda n: a[n][1])
    top_b = max(b, key=lambda n: b[n][1])
    assert top_a == top_b


def test_hits_exact_oracle_sql_matches_spark(spark, edges):
    """hits_exact's integer-CTE SQL replay returns identical rows on
    DuckDB — zero tolerance (the r12 q_pagerank hub/authority legs)."""
    import duckdb

    from bitfilters_spark.operators.graph import (
        hits_exact,
        hits_exact_oracle_sql,
    )

    df, pairs = edges
    got = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits_exact(df, "src", "dst", iters=3).collect()
    )
    con = duckdb.connect()
    con.register("edata", df.toPandas())
    sql = hits_exact_oracle_sql("SELECT src, dst FROM edata", iters=3)
    want = sorted(map(tuple, con.sql(sql).fetchall()))
    assert got == want


def test_hits_exact_is_the_exact_float_hits(spark, edges):
    """Because the HITS update is linear, per-iteration l1 normalization
    commutes out — hits_exact (integer iteration + one final division)
    IS the value the float hits() l1 path approximates; they agree to
    float tolerance and rank identically."""
    from bitfilters_spark.operators.graph import hits_exact
    from bitfilters_spark.operators.graph import hits as hits_f

    df, pairs = edges
    a = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_f(df, "src", "dst", iters=3, norm="l1").collect()
    }
    b = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_exact(df, "src", "dst", iters=3).collect()
    }
    assert set(a) == set(b)
    for n in a:
        assert a[n][0] == pytest.approx(b[n][0], rel=1e-9, abs=1e-12)
        assert a[n][1] == pytest.approx(b[n][1], rel=1e-9, abs=1e-12)
    import pytest as _p
    with _p.raises(ValueError, match="iters"):
        hits_exact(df, "src", "dst", iters=0)


def test_hits_exact_overflow_guard(spark):
    """Review fix (r12): magnitudes grow like d_max^(2*iters) — the
    guard refuses a high-degree graph before ANSI overflow (or silent
    wrap with ANSI off) instead of mid-iteration."""
    from bitfilters_spark.operators.graph import hits_exact

    # star graph: one hub pointing at 3000 nodes -> d_max = 3000
    e = spark.range(3000).select(
        F.lit(999_999).alias("src"), F.col("id").alias("dst")
    )
    with pytest.raises(ValueError, match="overflow"):
        hits_exact(e, "src", "dst", iters=4)
    # small iters on the same graph stays under the bound and runs
    got = hits_exact(e, "src", "dst", iters=1).collect()
    assert len(got) == 3001


def test_hits_exact_skip_guard_same_result(spark, edges):
    """r13 (q_pagerank trim): skip_guard=True omits the degree-stats
    job for pre-validated graphs; the result is identical, and the
    overflow graph that the guard would refuse is simply NOT checked
    (the caller's promise) — ANSI still errors rather than wrapping."""
    from bitfilters_spark.operators.graph import hits_exact

    df, pairs = edges
    a = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits_exact(df, "src", "dst", iters=3).collect()
    )
    b = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits_exact(
            df, "src", "dst", iters=3, skip_guard=True
        ).collect()
    )
    assert a == b


def test_hits_quantized_iters0_oracle_closed_form(spark, edges):
    """Review fix (r12): hits_quantized(iters=0) returns the initial
    vectors and the oracle emits the same closed form instead of
    invalid SQL; hits_exact's oracle matches its iters>=1 validation."""
    import duckdb

    from bitfilters_spark.operators.graph import (
        hits_exact_oracle_sql,
        hits_oracle_sql,
        hits_quantized,
    )

    df, pairs = edges
    got = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits_quantized(df, "src", "dst", iters=0).collect()
    )
    con = duckdb.connect()
    con.register("edata", df.toPandas())
    want = sorted(
        map(tuple, con.sql(
            hits_oracle_sql("SELECT src, dst FROM edata", iters=0)
        ).fetchall())
    )
    assert got == want
    with pytest.raises(ValueError, match="iters"):
        hits_exact_oracle_sql("SELECT 1 AS src, 2 AS dst", iters=0)


def test_label_propagation_communities(spark):
    """#183: two dense cliques joined by one bridge — CC reads one
    component, LPA separates the communities; deterministic; isolated
    and self-loop-only nodes keep their own label."""
    from bitfilters_spark.operators.clustering import connected_components
    from bitfilters_spark.operators.graph import label_propagation

    cliq_a = [(i, j) for i in range(6) for j in range(6) if i < j]
    cliq_b = [(i, j) for i in range(10, 16) for j in range(10, 16) if i < j]
    edges = cliq_a + cliq_b + [(5, 10)] + [(99, 99)]  # bridge + self-loop
    df = spark.createDataFrame(edges, "src long, dst long")

    cc = connected_components(df, "src", "dst").toPandas()
    assert cc[cc["id"] != 99]["component"].nunique() == 1  # CC: one blob

    lp = {r["node"]: r["label"] for r in label_propagation(df, iters=5).collect()}
    assert {lp[i] for i in range(6)} == {0}
    assert {lp[i] for i in range(10, 16)} == {10}
    assert lp[99] == 99  # self-loop-only node labeled as itself

    a = sorted(label_propagation(df, iters=5).collect())
    b = sorted(label_propagation(df, iters=5).collect())
    assert a == b
    # iters=0 -> everyone their own label
    lp0 = label_propagation(df, iters=0).toPandas()
    assert (lp0["node"] == lp0["label"]).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        label_propagation(df, iters=-1)


def test_triangle_counts_exact(spark):
    """#184: per-node triangles ≡ brute-force replay on a random graph,
    known closed forms (K4 all-1.0 coefficients, a path all-zero, a
    star hub 0), direction/duplicate/self-loop collapse, skewed-degree
    orientation still exact."""
    from itertools import combinations

    import numpy as np

    from bitfilters_spark.operators.graph import triangle_counts

    # K4 + disjoint path + star; duplicates/reverses/self-loops mixed in
    k4 = [(i, j) for i, j in combinations([0, 1, 2, 3], 2)]
    path = [(10, 11), (11, 12), (12, 13)]
    star = [(20, 21), (20, 22), (20, 23), (20, 24)]
    noise = [(1, 0), (2, 0), (11, 10), (5, 5), (20, 20)]
    df = spark.createDataFrame(k4 + path + star + noise, "src long, dst long")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering_coeff"])
        for r in triangle_counts(df).collect()
    }
    for n in [0, 1, 2, 3]:
        assert got[n] == (3, 3, 1.0)
    assert got[11] == (2, 0, 0.0) and got[10][1] == 0
    assert got[20] == (4, 0, 0.0) and got[21] == (1, 0, 0.0)
    assert 5 not in got  # self-loop-only node has no undirected edges

    # random graph vs brute force
    rng = np.random.default_rng(3)
    n = 30
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (150, 2)) if a != b]
    und = {tuple(sorted(e)) for e in edges}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for v, nb in adj.items():
        t = sum(1 for x, y in combinations(sorted(nb), 2) if (x, y) in und or (y, x) in und)
        d = len(nb)
        expect[v] = (d, t, 0.0 if d <= 1 else 2.0 * t / (d * (d - 1)))
    df2 = spark.createDataFrame(edges, "src long, dst long")
    got2 = {
        r["node"]: (r["degree"], r["triangles"], r["clustering_coeff"])
        for r in triangle_counts(df2).collect()
    }
    assert got2 == expect


def test_trustrank_replay_and_spam_demotion(spark):
    """#185: trustrank ≡ an exact python replay of the quantized
    recursion; trust reaches only seed-reachable pages, so a link farm
    pagerank inflates scores 0 under seeded trust."""
    import math

    from bitfilters_spark.operators.graph import pagerank, trustrank

    # trusted community 0-3 (chain + links), spam farm 10-13 (dense
    # interlinks, pointing at each other only), one spam->trusted link
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0), (0, 2),
        (10, 11), (11, 12), (12, 13), (13, 10), (10, 12), (11, 13),
        (12, 10), (13, 11),
        (10, 0),  # spam links TO trusted (earns nothing back)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["trust"] for r in trustrank(df, "src", "dst", seeds, iters=3).collect()}

    # python replay with identical floor-quantization
    Q = float(1 << 30)
    d = 0.85
    und = sorted(set(edges))
    nodes = sorted({x for e in und for x in e})
    out: dict = {}
    for s, t in und:
        out.setdefault(s, []).append(t)
    def q(x): return math.floor(x * Q) / Q
    s0 = math.floor(1.0 / 1 * Q) / Q
    tele = math.floor((1.0 - d) / 1 * Q) / Q
    trust = {n: (s0 if n == 0 else 0.0) for n in nodes}
    for _ in range(3):
        sums = {n: 0.0 for n in nodes}
        for s, ts in out.items():
            c = q(trust[s] / len(ts))
            for t in ts:
                sums[t] += c
        trust = {n: q((tele if n == 0 else 0.0) + d * sums[n]) for n in nodes}
    assert got == trust

    # demotion: spam farm holds 0 trust but top pagerank mass
    assert all(got[n] == 0.0 for n in (10, 11, 12, 13))
    assert all(got[n] > 0.0 for n in (0, 1, 2, 3))
    pr = {r["node"]: r["rank"] for r in pagerank(df, "src", "dst", iters=3).collect()}
    # the farm's interlinks EARN pagerank (above trusted non-seed pages)
    # while trust stays exactly 0 — the demotion trustrank exists for
    assert max(pr[n] for n in (10, 11, 12, 13)) > min(pr[n] for n in (1, 2, 3))

    import pytest as _pt
    with _pt.raises(ValueError):
        trustrank(df, "src", "dst", spark.createDataFrame([(99,)], "node long"))
    with _pt.raises(ValueError):
        trustrank(df, "src", "dst", seeds, damping=1.0)


def test_k_core_peeling(spark):
    """#186: K4 + a pendant chain peels to exactly the K4 at k=3; the
    chain survives k=1; cycle is its own 2-core; k too large empties;
    core_degree counts within-core edges only."""
    from bitfilters_spark.operators.graph import k_core

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    chain = [(3, 10), (10, 11), (11, 12)]  # pendant path off node 3
    df = spark.createDataFrame(k4 + chain, "src long, dst long")

    got3 = {r["node"]: r["core_degree"] for r in k_core(df, k=3).collect()}
    assert got3 == {0: 3, 1: 3, 2: 3, 3: 3}  # chain peeled; 3's degree is in-core

    got1 = {r["node"]: r["core_degree"] for r in k_core(df, k=1).collect()}
    assert set(got1) == {0, 1, 2, 3, 10, 11, 12}
    assert got1[3] == 4  # full degree at k=1 (chain edge counts)

    cyc = spark.createDataFrame([(i, (i + 1) % 5) for i in range(5)], "src long, dst long")
    got2 = {r["node"]: r["core_degree"] for r in k_core(cyc, k=2).collect()}
    assert got2 == {i: 2 for i in range(5)}
    assert k_core(cyc, k=3).count() == 0

    # cascade: a triangle hanging off the K4 by one edge dies at k=3
    tri = [(20, 21), (21, 22), (20, 22), (22, 0)]
    df2 = spark.createDataFrame(k4 + tri, "src long, dst long")
    assert {r["node"] for r in k_core(df2, k=3).collect()} == {0, 1, 2, 3}

    import pytest as _pt
    with _pt.raises(ValueError):
        k_core(df, k=0)
