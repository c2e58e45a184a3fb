"""Near-duplicate clustering: connected components over candidate pairs.

The pair generators (``minhash_lsh_pairs``, ``shingle_jaccard_pairs``,
``simhash_near_pairs``, ``cosine_neardup_pairs``) emit EDGES; turning edges
into dedup decisions needs the transitive closure — if A~B and B~C, then
A, B, C are one cluster even when A~C was never emitted. This module closes
that gap: ``connected_components`` labels every node with the minimum id
reachable from it, and ``dedup_near`` keeps exactly one representative (the
minimum id) per cluster.

Scale posture (100 TB):
* min-label propagation — per iteration ONE co-partitioned join (edges ⨝
  labels on the source id) + ONE groupBy(id) min-agg; both shuffles hash on
  the node id, so AQE reuses the partitioning across iterations. Rows are
  (long, long) — the shuffle is tiny relative to the corpus even for
  billions of edges.
* iterations = cluster diameter. Near-dup graphs are star/clique-shaped
  (diameter 2–4 in practice); ``max_iter`` caps pathological chains, and a
  per-iteration convergence count exits early. For adversarial
  high-diameter graphs swap in the alternating large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14) — O(log²n) rounds regardless of diameter; not needed
  for dedup workloads.
* each iteration ends in ``localCheckpoint`` — iterative DataFrame plans
  otherwise grow O(iterations) deep and re-execute from the source. On a
  real cluster prefer ``spark.sparkContext.setCheckpointDir`` + reliable
  ``checkpoint`` so executor loss cannot lose the truncated lineage.

Reference scope note: the bitfilters extension stops at pair detection
(filters find duplicate *candidates*, docs/README.md "Duplicate
detection"); clustering is the pipeline step above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    driver_max_edges: int = 5_000_000,
) -> DataFrame:
    """(id, component) for every node in ``pairs``; component = min reachable id.

    Size-aware hybrid (the same switch Spark itself makes for broadcast
    joins): the edge list is a tiny DERIVED set — near-dup pairs, not the
    corpus — so when it has at most ``driver_max_edges`` rows (≈80 MB at
    the 5M default) an exact path-compressed union-find on the driver
    finishes in ONE job instead of a multi-job iterative fixpoint. Above
    the threshold, distributed min-label propagation with pointer jumping
    (labels only decrease, so the fixpoint is the per-component minimum;
    path halving collapses chains in O(log diameter) rounds).
    Set ``driver_max_edges=0`` to force the distributed path.
    """
    dedup = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).distinct()
    if driver_max_edges > 0:
        head = dedup.limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in head:
                a, b = r["a"], r["b"]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN root so the label is the component min
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            rows = [(n, find(n)) for n in parent]
            return pairs.sparkSession.createDataFrame(
                rows, "id long, component long"
            )
    edges = (
        dedup.union(dedup.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )

    def _label_sum(lb: DataFrame) -> int:
        # labels only DECREASE, so the fixpoint test is "sum unchanged" —
        # one scan of the checkpointed labels instead of an old-vs-new
        # join. decimal(38) keeps the sum exact at any node count.
        return lb.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = None
    for _ in range(max_iter):
        # (1) min over neighbors' labels
        prop = edges.join(labels, edges["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("component")
        )
        stepped = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # (2) pointer jumping (path halving): follow component -> its own
        # label, collapsing chains exponentially — O(log diameter) rounds
        # instead of O(diameter)
        parents = stepped.select(
            F.col("id").alias("component"), F.col("component").alias("grand")
        )
        labels = (
            stepped.join(parents, "component", "left")
            .select("id", F.coalesce("grand", "component").alias("component"))
            .localCheckpoint()
        )
        s = _label_sum(labels)
        if s == prev_sum:
            break
        prev_sum = s
    edges.unpersist()
    return labels


def cluster_report(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(component, n_members) per near-dup cluster (members >= 2 by construction)."""
    return (
        connected_components(pairs, id_a, id_b)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


def dedup_near(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every row belonging to a near-dup cluster except the minimum-id
    representative. Rows absent from ``pairs`` (singletons) pass through.

    The drop set (non-representative cluster members) is a tiny fraction of
    the corpus, and the anti-join's build side is just (id) longs — at scale
    Spark broadcasts it and the corpus never shuffles.
    """
    drop = connected_components(pairs, id_a, id_b).where(
        F.col("id") != F.col("component")
    )
    return df.join(
        drop.select(F.col("id").alias(id_col)), on=id_col, how="left_anti"
    )


def mutual_knn_clusters(
    knn: DataFrame,
    threshold: float = 0.0,
    max_iter: int = 50,
    driver_max_edges: int = 5_000_000,
) -> DataFrame:
    """(id, component, n_members) — clusters from a kNN graph's MUTUAL
    edges: (a, b) counts only when a lists b AND b lists a (both at
    ``sim >= threshold``).

    The consumer that turns :func:`similarity.nn_descent_graph`'s output
    into dedup/clustering decisions. Mutuality is the standard guard
    against the asymmetric-hub failure of raw kNN graphs (a generic
    near-centroid vector appears in EVERYONE's top-k list and a naive
    sweep chains the whole corpus into one cluster; the hub doesn't
    reciprocate, so mutual edges cut it loose — shared-nearest-neighbor
    clustering's first step, Jarvis & Patrick 1973).

    Spark shape: mutuality is ONE self-join on the canonicalized pair
    (min, max) — edge-list scale, never the corpus — then
    :func:`connected_components` labels and a groupBy counts. Nodes
    whose edges are all non-mutual come back as singletons (component =
    own id, n_members = 1): a node the graph can't place is its own
    cluster, not a dropped row."""
    edges = knn.select(
        F.least("id", "nbr").alias("a"),
        F.greatest("id", "nbr").alias("b"),
        # direction survives canonicalization so mutuality counts
        # DIRECTIONS, not rows — a duplicated one-way edge (e.g. a
        # union of two kNN sources) must NOT read as reciprocated
        (F.col("id") < F.col("nbr")).alias("__fwd"),
        F.col("sim"),
    ).where(F.col("sim") >= F.lit(float(threshold)))
    mutual = (
        edges.groupBy("a", "b")
        .agg(F.count_distinct("__fwd").alias("__n"))
        .where(F.col("__n") >= 2)
        .select("a", "b")
    )
    # node universe from BOTH columns: a node appearing only as someone
    # else's nbr still gets its singleton row (the docstring contract)
    nodes = (
        knn.select(F.col("id"))
        .unionByName(knn.select(F.col("nbr").alias("id")))
        .distinct()
    )
    cc = connected_components(
        mutual, "a", "b", max_iter=max_iter, driver_max_edges=driver_max_edges
    )
    labeled = nodes.join(cc, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )
    # member counts via a window over the component partition — the
    # size table is NODE-scale in the singleton-heavy regime, far past
    # any broadcast bound; the window rides the same shuffle key
    from pyspark.sql import Window

    wc = Window.partitionBy("component")
    return labeled.select(
        "id",
        "component",
        F.count(F.lit(1)).over(wc).cast("long").alias("n_members"),
    )
