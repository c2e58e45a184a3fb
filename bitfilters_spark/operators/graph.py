"""Link-graph authority scoring (#135): distributed PageRank over a host
graph — the crawl-prioritization signal real pipelines feed the frontier
(CommonCrawl ranks hosts by centrality; `web.url_frontier_schedule` and
`streaming/frontier.py` take it as ``priority_col``). Power iteration in
the classic per-node form ``rank' = (1-d) + d * Σ rank(src)/out_deg(src)``
over in-links.

Plan shape per iteration (everything host-scale, ≪ corpus-scale): ranks
join out-degrees on the node key, edges join ranks on src (the edge list
is the only table that can be large), one groupBy on dst sums the
contributions, and a left join against the node set applies the damping
base to sinks with no in-links. k iterations = k of those shuffles;
``checkpoint_every`` cuts the lineage so long runs keep linear plans.
Dangling nodes (no out-edges) contribute nothing — the classic simplified
variant; ranks are then NOT normalized to sum 1, matching the
``(1-d) + d·Σ`` formulation's fixed point.

CROSS-ENGINE EXACTNESS (what makes the driver oracle possible for an
iterative float algorithm): every per-edge contribution and every updated
rank is QUANTIZED to a multiple of 2^-quantum_bits (floor after an exact
power-of-two scale). IEEE doubles add EXACTLY — in any order — when all
addends are multiples of 2^-q and every partial sum stays below
2^(53-q), so with q = 30 the per-dst sums are bit-identical on Spark and
DuckDB no matter how either engine orders the aggregation; the division
rank/out_deg and the damping multiply are single correctly-rounded IEEE
ops (identical on both engines), and floor/×2^q/÷2^q are exact. The
driver row `q_pagerank` replays k unrolled iterations in SQL and
hash-matches without rounding tolerances.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantize(col, quantum: float):
    # floor after an exact power-of-two scale: both engines floor the
    # same correctly-rounded double, so quantized values agree bitwise
    return F.floor(col * F.lit(quantum)) / F.lit(quantum)


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    damping: float = 0.85,
    quantum_bits: int = 30,
    checkpoint_every: int = 5,
    dangling: str = "ignore",
    tol: float | None = None,
    materialize: bool = True,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations from rank = 1.0.

    ``edges`` is a directed link list; duplicate edges are collapsed
    (a page linking twice votes once — the standard convention, and what
    keeps out-degree consistent with the distinct edge set). Sums stay
    exact for graphs whose total rank mass is below
    ``2^(53 - quantum_bits)`` (~8.4M unit-rank nodes at the default —
    raise quantum_bits' ceiling consciously past that).

    Documented VARIANTS (r11 — both off by default, pytest-verified
    against a pure-Python replay rather than the SQL driver oracle,
    which pins the default configuration only):

    - ``dangling='redistribute'``: the classic normalized treatment —
      each iteration the rank mass sitting on dangling nodes (no
      out-edges) is shared uniformly: ``rank' = (1-d) + d*(Σ in-contrib
      + dangling_mass/N)``, with the redistribution addend quantized
      like every other term. Costs one model-scale collect per
      iteration (the dangling-mass scalar crosses the driver).
    - ``tol``: residual-based early stop — iterate until
      ``Σ|rank_i - rank_{i-1}| <= tol`` or ``iters``, whichever first.
      Costs one node-scale aggregation job per iteration; the classic
      trade for not over-running a converged graph at 100 TB.

    ``materialize=False`` skips the loop-invariant localCheckpoints
    (edges/nodes/degrees). Each checkpoint is a full Catalyst pass plus
    a job at PLAN-BUILD time (~0.3 s each on a warm local session), so
    for a SMALL pre-materialized edge list — the caller already holds a
    checkpointed/deduped leaf — they are pure overhead: AQE exchange
    reuse still executes the invariant subplans once. Leave True for
    any edge list that is itself an expensive subquery (the 100 TB
    posture: the k-fold rescan of a raw edge derivation dominates)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if dangling not in ("ignore", "redistribute"):
        raise ValueError("dangling must be 'ignore' or 'redistribute'")
    quantum = float(1 << quantum_bits)
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if iters > 1:
        # the loop's invariants (distinct edges, node set, out-degrees)
        # are referenced every iteration — materialize them ONCE so the
        # edge list is scanned/deduped a single time instead of k times
        # (at 100 TB the k-fold rescan is the dominant cost; statically
        # this also keeps the plan's Exchange count linear in k, not
        # k x the invariant subplans).
        #
        # Edge-side shuffle in the NON-broadcast regime (ranks too big
        # to broadcast — the giant-graph case): each iteration joins
        # edges⋈ranks and edges⋈deg on src. Pre-hash-partitioning the
        # edges before this checkpoint does NOT help on this Spark line:
        # under AQE, localCheckpoint returns a Scan ExistingRDD with
        # UNKNOWN output partitioning (the AdaptiveSparkPlan's
        # partitioning isn't propagated into LogicalRDD), so
        # EnsureRequirements re-inserts the src Exchange regardless and
        # a pre-repartition is purely a wasted extra shuffle (measured).
        # What DOES bound the cost is exchange/stage REUSE: every
        # iteration's edge Exchange is canonically identical, so AQE
        # materializes ONE shuffle stage for the edge list and all k
        # iterations read it — the executed plan carries a single
        # ShuffleQueryStage over the edge scan at k=3 and k=6 alike
        # (pinned by tests/test_graph.py::test_pagerank_edge_shuffle_
        # reused_across_iterations). Net: edges shuffle once per run,
        # not k times.
        if materialize:
            e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    if iters > 1 and materialize:
        nodes = nodes.localCheckpoint()
        deg = deg.localCheckpoint()
    dang = None
    n_nodes = None
    if dangling == "redistribute":
        n_nodes = nodes.count()
        dang = nodes.join(
            deg.select(F.col("src").alias("node")), "node", "left_anti"
        )
        if iters > 1:
            dang = dang.localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    base = F.lit(1.0 - damping)
    for i in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                "dst",
                _quantize(F.col("rank") / F.col("__deg"), quantum).alias("__c"),
            )
        )
        sums = contrib.groupBy("dst").agg(F.sum("__c").alias("__s"))
        extra = F.lit(0.0)
        if dang is not None and n_nodes:
            dm = (
                ranks.join(dang, "node").agg(F.sum("rank")).collect()[0][0]
                or 0.0
            )
            # same floor-quantization as every per-edge term, applied to
            # the driver-side scalar with the identical IEEE ops
            extra = F.lit(
                math.floor(damping * dm / n_nodes * quantum) / quantum
            )
        new_ranks = (
            nodes.join(sums.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                _quantize(
                    base + F.lit(damping) * F.coalesce("__s", F.lit(0.0)) + extra,
                    quantum,
                ).alias("rank"),
            )
        )
        if tol is not None:
            new_ranks = new_ranks.localCheckpoint()
            resid = (
                new_ranks.join(
                    ranks.withColumnRenamed("rank", "__prev"), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))))
                .collect()[0][0]
                or 0.0
            )
            ranks = new_ranks
            if resid <= tol:
                break
        else:
            ranks = new_ranks
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_oracle_sql(
    edges_sql: str, iters: int = 3, damping: float = 0.85, quantum_bits: int = 30
) -> str:
    """The ANSI-SQL replay of :func:`pagerank` with the iterations
    UNROLLED as chained CTEs (k is small by contract) — exactly the
    arithmetic the Spark plan runs, so the comparison needs no rounding
    tolerance. ``edges_sql`` must select columns (src, dst)."""
    q = float(1 << quantum_bits)
    d = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1)",
        "r0 AS (SELECT node, 1.0 AS rank FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"s{i + 1} AS (SELECT e.dst AS node, "
            f"sum(floor(r.rank / deg.d * {q}) / {q}) AS s "
            f"FROM e JOIN r{i} r ON r.node = e.src "
            "JOIN deg ON deg.src = e.src GROUP BY 1)"
        )
        parts.append(
            f"r{i + 1} AS (SELECT n.node, "
            f"floor(({1.0 - d!r} + {d!r} * coalesce(s.s, 0.0)) * {q}) / {q}"
            f" AS rank FROM nodes n LEFT JOIN s{i + 1} s ON s.node = n.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


def hits(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 8,
    norm: str = "l1",
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, hub, authority) — Kleinberg's HITS over a directed link
    list, the complementary crawl-prioritization signal to
    :func:`pagerank`: authorities are pages many good hubs point AT
    (fetch first), hubs are pages that point at many good authorities
    (re-crawl for link discovery — directory/index pages).

    Power iteration from hub = 1: each round ``auth(w) = Σ_{(u,w)} hub(u)``
    then ``hub(u) = Σ_{(u,w)} auth(w)``, each vector normalized by
    ``norm`` ('l1' sum, 'l2' Euclidean, or 'max') so the iteration
    converges to the principal eigenvector direction instead of blowing
    up. Duplicate edges collapse (a page linking twice votes once — the
    :func:`pagerank` convention).

    Plan shape per iteration: two node-keyed broadcast-or-shuffle joins
    against the edge list + two groupBys (dst then src) — everything
    node-scale except the edge list, which is deduped/materialized ONCE
    (localCheckpoint; iterations re-read its cached blocks — unlike
    :func:`pagerank`, the per-iteration lineage cuts below split the
    run into separate jobs, so AQE stage reuse does not span them and
    each iteration pays its own edge-join Exchange over the cached
    scan; the honest trade for keeping Catalyst's per-action re-derivation
    linear, see `checkpoint_every`). The
    normalization scalar rides a literal 1-row broadcast crossJoin (the
    repo's scalar-join pattern) — no per-iteration driver collect.
    Unlike pagerank, each half-iteration nests an aggregation UNDER a
    join (the scalar normalizer), so the unevaluated plan deepens ~4
    subtrees per iteration and Catalyst re-derives the whole tree at
    every action — ``checkpoint_every=1`` (default) cuts the lineage
    each iteration with a node-scale materialization, measured 35 s →
    ~3 s for 4 iterations on a 199-node graph; raise it only for tiny
    iteration counts.
    Unlike pagerank's quantized arithmetic, the normalizing DIVISION
    makes bit-exact SQL replay impractical; the contract is pytest
    equivalence to a dense numpy reference (1e-9), the #77/#99 pattern.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if norm not in ("l1", "l2", "max"):
        raise ValueError("norm must be 'l1', 'l2', or 'max'")
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if iters > 1:
        e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if iters > 1:
        nodes = nodes.localCheckpoint()

    def _normalize(df: DataFrame, col: str) -> DataFrame:
        if norm == "l1":
            z = df.agg(F.sum(F.abs(F.col(col))).alias("__z"))
        elif norm == "l2":
            z = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("__z"))
        else:
            z = df.agg(F.max(F.abs(F.col(col))).alias("__z"))
        return df.crossJoin(F.broadcast(z)).select(
            "node",
            (F.col(col) / F.greatest(F.col("__z"), F.lit(1e-300))).alias(col),
        )

    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = nodes.select("node", F.lit(0.0).alias("authority"))
    for i in range(iters):
        raw_a = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        auths = _normalize(
            nodes.join(raw_a, "node", "left").select(
                "node", F.coalesce("authority", F.lit(0.0)).alias("authority")
            ),
            "authority",
        )
        raw_h = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        hubs = _normalize(
            nodes.join(raw_h, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            hubs = hubs.localCheckpoint()
            auths = auths.localCheckpoint()
    return hubs.join(auths, "node")


def hits_quantized(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    quantum_bits: int = 30,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, hub, authority) — :func:`hits` (l1 norm) with every sum
    addend AND every normalized quotient quantized to multiples of
    ``2^-quantum_bits`` — the :func:`pagerank` trick extended through
    the normalizing division: the l1 normalizer is itself an exact sum
    of quantized values, the division is ONE correctly-rounded IEEE op
    (bit-identical across engines replaying the same expression), and
    re-quantizing the quotient makes the NEXT iteration's sums exact
    again. :func:`hits_oracle_sql` replays the whole iteration in ANSI
    SQL with ZERO tolerance — the driver-gateable form of the signal
    whose un-quantized twin is pytest-pinned to numpy (1e-9). Exact
    while node counts stay below ``2^(53 - quantum_bits)``; ranking
    differs from :func:`hits` by at most the quantization grid per
    iteration."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    quantum = float(1 << quantum_bits)
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    # LAZY checkpoints throughout (vs hits()'s eager ones): each cut
    # truncates the LOGICAL plan immediately — without it the
    # normalizer's crossJoin references its input subtree twice, so the
    # static plan doubles per half-iteration (~4^iters nodes, measured
    # 326 static Exchanges at iters=2 in the driver audit) — while the
    # RDD only materializes when the one final action pulls it, so no
    # per-iteration job overhead is paid (eager cuts measured 4.1 s vs
    # 1.35 s warm on the 50-node gate graph)
    if iters > 1:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if iters > 1:
        nodes = nodes.localCheckpoint(eager=False)

    def _qnormalize(df: DataFrame, col: str) -> DataFrame:
        z = df.agg(F.sum(F.abs(F.col(col))).alias("__z"))
        return df.crossJoin(F.broadcast(z)).select(
            "node",
            (
                F.floor(
                    F.col(col)
                    / F.greatest(F.col("__z"), F.lit(1e-300))
                    * F.lit(quantum)
                )
                / F.lit(quantum)
            ).alias(col),
        )

    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = nodes.select("node", F.lit(0.0).alias("authority"))
    for i in range(iters):
        raw_a = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        auths = _qnormalize(
            nodes.join(raw_a, "node", "left").select(
                "node", F.coalesce("authority", F.lit(0.0)).alias("authority")
            ),
            "authority",
        )
        raw_h = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        hubs = _qnormalize(
            nodes.join(raw_h, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            hubs = hubs.localCheckpoint(eager=False)
            auths = auths.localCheckpoint(eager=False)
    return hubs.join(auths, "node")


def hits_oracle_sql(
    edges_sql: str, iters: int = 3, quantum_bits: int = 30
) -> str:
    """The ANSI-SQL replay of :func:`hits_quantized` with the
    iterations unrolled as chained CTEs (the `pagerank_oracle_sql`
    shape) — exactly the arithmetic the Spark plan runs, so the
    comparison needs no rounding tolerance. ``edges_sql`` must select
    columns (src, dst)."""
    q = float(1 << quantum_bits)
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS (SELECT node, 1.0 AS hub FROM nodes)",
    ]
    if iters < 1:
        # the operator's iters=0 closed form: initial vectors
        return (
            ",\n".join(parts)
            + "\nSELECT node, 1.0 AS hub, 0.0 AS authority FROM nodes"
        )
    for i in range(iters):
        parts.append(
            f"ra{i + 1} AS (SELECT n.node, coalesce(s.v, 0.0) AS v FROM nodes n"
            f" LEFT JOIN (SELECT e.dst AS node, sum(h.hub) AS v FROM e"
            f" JOIN h{i} h ON h.node = e.src GROUP BY 1) s ON s.node = n.node)"
        )
        parts.append(
            f"za{i + 1} AS (SELECT sum(abs(v)) AS z FROM ra{i + 1})"
        )
        parts.append(
            f"a{i + 1} AS (SELECT node,"
            f" floor(v / greatest(z, 1e-300) * {q!r}) / {q!r} AS authority"
            f" FROM ra{i + 1}, za{i + 1})"
        )
        parts.append(
            f"rh{i + 1} AS (SELECT n.node, coalesce(s.v, 0.0) AS v FROM nodes n"
            f" LEFT JOIN (SELECT e.src AS node, sum(a.authority) AS v FROM e"
            f" JOIN a{i + 1} a ON a.node = e.dst GROUP BY 1) s ON s.node = n.node)"
        )
        parts.append(
            f"zh{i + 1} AS (SELECT sum(abs(v)) AS z FROM rh{i + 1})"
        )
        parts.append(
            f"h{i + 1} AS (SELECT node,"
            f" floor(v / greatest(z, 1e-300) * {q!r}) / {q!r} AS hub"
            f" FROM rh{i + 1}, zh{i + 1})"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.node, h.hub, a.authority FROM h{iters} h"
        + f" JOIN a{iters} a ON a.node = h.node"
    )


def hits_exact(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    skip_guard: bool = False,
) -> DataFrame:
    """(node, hub, authority) — the EXACT value :func:`hits` (l1 norm)
    approximates in floats: because the HITS update is LINEAR, the
    per-iteration l1 normalization commutes out as a scalar factor, so
    the iteration runs UNNORMALIZED in pure 64-bit INTEGER arithmetic
    (hub starts at 1; every update is a sum of longs — no rounding
    anywhere) and ONE final l1 division per vector lands the same
    direction per-iteration normalization would. That makes the result
    (a) bit-replayable in ANSI SQL with zero tolerance
    (:func:`hits_exact_oracle_sql` — integer CTE sums + one division,
    unlike the float twins' crossJoin-per-normalize plans) and (b)
    CHEAP: the plan is pagerank-shaped — one join + one groupBy per
    half-iteration, linear lineage, no normalizer subtree doubling.

    Bound: TWO integer matrix products run per iteration (auth then
    hub), so magnitudes grow like d_max^(2·iters) — d_max the maximum
    node degree — and the final l1 sums like n·d_max^(2·iters). A
    runtime guard measures (d_max, n) in one pass over the deduped
    edges and refuses when ``2·iters·log2(d_max) + log2(n) > 62``,
    instead of letting ANSI mode kill the job mid-iteration (or, ANSI
    off, letting values silently wrap while the DuckDB oracle's
    HUGEINT sums keep going — a parity break with no error). For
    graphs past the bound lower ``iters`` or use :func:`hits_quantized`
    (floats never overflow). ``skip_guard=True`` omits the guard's
    degree-stats job for graphs the CALLER has already validated
    against the bound (a repeated run over a known graph — e.g. the
    driver gate's 50-node fixture — where the extra agg+collect per
    call is pure overhead); ANSI mode still errors loudly rather than
    wrapping if the promise was wrong. Scale posture: node-keyed
    shuffles only; the edge list materializes once (the guard's pass
    doubles as the materialization when it runs) like
    :func:`pagerank`."""
    import math as _math

    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if iters > 1:
        e = e.localCheckpoint(eager=False)
    if not skip_guard:
        # overflow guard: combined degree bounds both d_in and d_out max
        g = (
            e.select(F.explode(F.array("src", "dst")).alias("n"))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.max("d").alias("dmax"), F.count(F.lit(1)).alias("nn"))
            .collect()[0]
        )
        dmax, n_nodes = int(g["dmax"] or 0), int(g["nn"] or 0)
        if dmax and (
            2 * iters * _math.log2(max(dmax, 2)) + _math.log2(max(n_nodes, 2))
            > 62
        ):
            raise ValueError(
                f"hits_exact: {iters} iterations at max degree {dmax} over "
                f"{n_nodes} nodes can overflow 64-bit sums (bound "
                "n*d_max^(2*iters)); lower iters or use hits_quantized"
            )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    hubs = nodes.select("node", F.lit(1).cast("long").alias("hub"))
    # zero-fill only ONCE, after the loop (r14 trim): a node missing
    # from an iteration's aggregate holds 0, and 0 contributes nothing
    # to the next sum — so the per-iteration nodes-left-join coalesce
    # the original loop carried was 2 joins/iteration of pure plan
    # weight with bit-identical sums. Only the OUTPUT needs every node.
    for _ in range(iters):
        auths = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        hubs = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
    # one lazy barrier before the final normalize: the two aggregate
    # scalars and the output select would otherwise each re-inline the
    # whole iteration chain (4x the static plan for one division)
    joined = (
        nodes.join(hubs, "node", "left")
        .join(auths, "node", "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0).cast("long")).alias("hub"),
            F.coalesce("authority", F.lit(0).cast("long")).alias("authority"),
        )
        .localCheckpoint(eager=False)
    )
    zs = joined.agg(
        F.sum("hub").alias("__zh"), F.sum("authority").alias("__za")
    )
    return joined.crossJoin(F.broadcast(zs)).select(
        "node",
        (
            F.col("hub").cast("double")
            / F.greatest(F.col("__zh").cast("double"), F.lit(1.0))
        ).alias("hub"),
        (
            F.col("authority").cast("double")
            / F.greatest(F.col("__za").cast("double"), F.lit(1.0))
        ).alias("authority"),
    )


def hits_exact_oracle_sql(
    edges_sql: str, iters: int = 3
) -> str:
    """The ANSI-SQL replay of :func:`hits_exact`: unrolled integer CTE
    sums (every intermediate a BIGINT — nothing to round) and the one
    final l1 division. ``edges_sql`` must select columns (src, dst);
    ``iters >= 1``, matching the operator's own validation."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS (SELECT node, CAST(1 AS BIGINT) AS hub FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"a{i + 1} AS (SELECT n.node,"
            f" CAST(coalesce(s.v, 0) AS BIGINT) AS authority FROM nodes n"
            f" LEFT JOIN (SELECT e.dst AS node, sum(h.hub) AS v FROM e"
            f" JOIN h{i} h ON h.node = e.src GROUP BY 1) s ON s.node = n.node)"
        )
        parts.append(
            f"h{i + 1} AS (SELECT n.node,"
            f" CAST(coalesce(s.v, 0) AS BIGINT) AS hub FROM nodes n"
            f" LEFT JOIN (SELECT e.src AS node, sum(a.authority) AS v FROM e"
            f" JOIN a{i + 1} a ON a.node = e.dst GROUP BY 1) s ON s.node = n.node)"
        )
    parts.append(
        f"z AS (SELECT CAST(sum(hub) AS BIGINT) AS zh FROM h{iters})"
    )
    parts.append(
        f"za AS (SELECT CAST(sum(authority) AS BIGINT) AS zaa FROM a{iters})"
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.node,"
        f" CAST(h.hub AS DOUBLE) / greatest(CAST(z.zh AS DOUBLE), 1.0) AS hub,"
        f" CAST(a.authority AS DOUBLE)"
        f" / greatest(CAST(za.zaa AS DOUBLE), 1.0) AS authority"
        f" FROM h{iters} h JOIN a{iters} a ON a.node = h.node, z, za"
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
) -> DataFrame:
    """(node, label) — synchronous label-propagation communities
    (Raghavan et al. 2007): finer than :func:`connected_components`
    when everything connects (a real link graph is usually ONE weak
    component — CC says nothing; LPA finds the dense regions: link
    farms, forums, mirror constellations).

    Deterministic variant of the classically-random algorithm: labels
    init to own node id; each round every node adopts the MAJORITY
    label among its undirected neighbors PLUS ITS OWN current label
    (the self-vote damps the two-coloring oscillation synchronous LPA
    is known for), ties broken by smallest label. Fixed ``iters``
    rounds (no RNG, no async order-dependence), then communities are
    canonicalized to their minimum member id so output labels are
    stable identifiers.

    Spark shape per round: one edge⋈label join (shuffle on node id,
    the same key every round), one (node, label) count, one max-struct
    argmax — no windows, no collects; ``localCheckpoint`` per round
    cuts the iterative lineage. Edge list is corpus-DERIVED scale.
    Isolated nodes (present only via self) keep their own label."""
    from pyspark.sql import Window

    if iters < 0:
        raise ValueError("iters must be >= 0")
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # node set from the RAW edge list (before the self-edge filter), so
    # a node with only self-loops still gets labeled — as itself
    labels = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(iters):
        nbr_votes = und.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        votes = nbr_votes.unionByName(labels.select("node", "label"))
        counted = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("__n")
        )
        labels = (
            counted.groupBy("node")
            .agg(F.max(F.struct(F.col("__n"), (-F.col("label")).alias("__neg"))).alias("__w"))
            .select("node", (-F.col("__w.__neg")).alias("label"))
            .localCheckpoint()
        )
    # canonicalize: a community's label becomes its min member id —
    # via a window on the label key (the canon table is node-scale at
    # iters=0 or on sparse graphs; no broadcast bound to hit)
    wl = Window.partitionBy("label")
    return labels.select(
        "node", F.min("node").over(wl).alias("label")
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, degree, triangles, clustering_coeff) — per-node triangle
    participation over the UNDIRECTED simple graph (direction and
    duplicate edges collapse; self-loops drop), plus the local
    clustering coefficient 2·T/(d·(d−1)) — the classic link-spam
    signal: organic neighborhoods interlink (high coefficient), link
    farms are stars around a hub (near 0), cliques of mutual boosters
    are exactly 1.

    Spark shape — the degree-ordered orientation (Schank & Wagner
    2005) that makes distributed triangle counting feasible: each
    undirected edge orients from its LOWER-(degree, id) endpoint, so
    every wedge is generated at its smallest-degree apex and the
    wedge-join volume is O(Σ d_oriented²) = O(m^1.5) instead of
    Σ d² (a celebrity node with a million followers generates no
    wedges — its neighbors do, a few each). Three node-keyed shuffles:
    degrees, the apex self-join, the closing-edge semi-join; counts
    are exact integers, the coefficient is one double division."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # orient: from the lower (degree, id) endpoint to the higher
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("__db"))
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("__da") < F.col("__db"))
                | ((F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e")
        )
        .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
        .localCheckpoint(eager=False)
    )
    # wedges at their smallest-degree apex; close with the third edge
    # (membership in `und` checked canonically on (least, greatest))
    wedges = (
        oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("x"))
        .join(
            oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("y")),
            "apex",
        )
        .where(F.col("x") < F.col("y"))
    )
    tris = wedges.join(
        und.select(
            F.col("a").alias("__ca"), F.col("b").alias("__cb")
        ),
        (F.least("x", "y") == F.col("__ca"))
        & (F.greatest("x", "y") == F.col("__cb")),
    ).select("apex", "x", "y")
    per_node = (
        tris.select(F.col("apex").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(F.col("degree") <= 1, F.lit(0.0))
            .otherwise(
                (F.lit(2.0) * F.coalesce("triangles", F.lit(0)))
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            )
            .alias("clustering_coeff"),
        )
    )


def trustrank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    seeds: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    quantum_bits: int = 30,
) -> DataFrame:
    """(node, trust) — seed-personalized PageRank (TrustRank, Gyöngyi/
    Garcia-Molina/Pedersen 2004): teleport mass flows ONLY to a
    hand-verified trusted seed set, so trust propagates outward along
    links and pages reachable only from spam neighborhoods score ~0 —
    the standard link-spam demotion complement to :func:`pagerank`
    (which a link farm can inflate) and :func:`triangle_counts` (which
    it can evade by interlinking).

    Same exact-arithmetic discipline as :func:`pagerank`: trust starts
    at the quantized 1/|seeds| on seeds (0 elsewhere), every
    contribution quantizes to multiples of 2^-``quantum_bits`` (sums
    order-independent ⇒ bit-replayable), update
    ``trust' = (1-d)·s + d·Σ in-contribs`` with the per-node teleport
    term a literal on the seed indicator. Same plan shape too: the
    edge list, node set and out-degrees materialize once; one
    edges⋈trust join + one groupBy per iteration. ``seeds`` is a
    one-column DataFrame of node ids; seeds outside the graph's node
    set are ignored (they can neither receive nor forward trust)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    quantum = float(1 << quantum_bits)
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    if iters > 1:
        e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    if iters > 1:
        nodes = nodes.localCheckpoint()
        deg = deg.localCheckpoint()
    seed_nodes = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("node"))
        .where(F.col("node").isNotNull())
        .distinct()
        .join(nodes, "node")  # in-graph seeds only
        .localCheckpoint()
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("trustrank needs at least one seed present in the graph")
    # the two driver scalars, floor-quantized with the same IEEE ops as
    # every per-edge term
    s0 = math.floor(1.0 / n_seeds * quantum) / quantum
    tele = math.floor((1.0 - damping) / n_seeds * quantum) / quantum
    marked = nodes.join(
        seed_nodes.withColumn("__seed", F.lit(1)), "node", "left"
    ).select("node", F.coalesce("__seed", F.lit(0)).alias("__seed"))
    if iters > 1:
        marked = marked.localCheckpoint()
    trust = marked.select(
        "node",
        F.when(F.col("__seed") == 1, F.lit(s0)).otherwise(F.lit(0.0)).alias("trust"),
    )
    base = F.when(F.col("__seed") == 1, F.lit(tele)).otherwise(F.lit(0.0))
    for it in range(iters):
        contrib = (
            e.join(trust.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                "dst",
                _quantize(F.col("trust") / F.col("__deg"), quantum).alias("__c"),
            )
        )
        sums = contrib.groupBy("dst").agg(F.sum("__c").alias("__s"))
        trust = (
            marked.join(sums.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                "__seed",
                _quantize(
                    base + F.lit(damping) * F.coalesce("__s", F.lit(0.0)),
                    quantum,
                ).alias("trust"),
            )
        ).select("node", "__seed", "trust")
        if (it + 1) % 5 == 0 and it + 1 < iters:
            # the one frame that grows per iteration — cut its lineage
            # on the pagerank checkpoint_every=5 cadence
            trust = trust.localCheckpoint()
    return trust.select("node", "trust")


def k_core(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 2,
    max_iter: int = 100,
) -> DataFrame:
    """(node, core_degree) — the k-CORE of the undirected simple graph:
    the maximal subgraph where every node keeps degree ≥ k after
    everything below is peeled away (Seidman 1983). The robustness
    complement to :func:`triangle_counts`: a link farm can fake
    triangles cheaply, but sustaining a high core number needs k
    MUTUALLY well-connected neighbors that themselves survive peeling —
    and dense organic cores (forums, wikis) are exactly what crawl
    prioritization wants surfaced. ``core_degree`` is the node's degree
    WITHIN the core (≥ k by construction).

    Spark shape: iterative peel to fixpoint — per round one degree
    groupBy and two semi-joins restricting the edge list to surviving
    endpoints, with ``localCheckpoint`` cutting the loop lineage and a
    node-count fixpoint test (one count job per round; peeling
    converges in at most the graph's degeneracy-ordering depth, tens of
    rounds on real webs). Loud error if ``max_iter`` rounds don't reach
    the fixpoint."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint()
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        )

    cur = und
    n_prev = None
    for _ in range(max_iter):
        deg = degrees(cur).localCheckpoint()
        keep = deg.where(F.col("core_degree") >= k).select("node")
        n_keep = keep.count()
        if n_keep == n_prev:
            return deg.where(F.col("core_degree") >= k)
        n_prev = n_keep
        if n_keep == 0:
            return deg.where(F.lit(False))
        cur = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint()
        )
    raise RuntimeError(
        f"k_core did not reach a fixpoint in {max_iter} rounds"
    )
