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
