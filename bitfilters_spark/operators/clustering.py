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
) -> DataFrame:
    """(id, component) for every node in ``pairs``; component = min reachable id.

    Min-label propagation to a fixpoint: every node repeatedly takes the
    minimum label among itself and its neighbors. Labels only decrease, so
    the fixpoint is exactly the per-component minimum id.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = edges.join(labels, edges["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("component")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
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
