"""Token-budget shard packing: the two-phase distributed prefix sum must
equal the sequential greedy assignment for any partitioning and any
(unsorted) input order."""

import random

from pyspark.sql import functions as F

from bitfilters_spark.operators.packing import pack_shards


def _expected(rows, shard_weight):
    out = {}
    prefix = 0
    for i, w in sorted(rows):
        out[i] = (w, prefix, prefix // shard_weight)
        prefix += w
    return out


def test_pack_matches_sequential_greedy(spark):
    rng = random.Random(5)
    rows = [(i, rng.randrange(0, 500)) for i in range(1000)]
    shuffled = rows[:]
    rng.shuffle(shuffled)
    df = spark.createDataFrame(shuffled, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["w"], r["prefix_weight"], r["shard"])
        for r in pack_shards(df, "doc_id", "w", 3000, n_partitions=7).collect()
    }
    assert got == _expected(rows, 3000)


def test_pack_single_partition_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5), (4, 10)], "doc_id long, w long"
    )
    got = {
        r["doc_id"]: (r["prefix_weight"], r["shard"])
        for r in pack_shards(df, "doc_id", "w", 12, n_partitions=1).collect()
    }
    # weights: 10, 0, 5, 10 -> prefixes 0, 10, 10, 15
    assert got == {1: (0, 0), 2: (10, 0), 3: (10, 0), 4: (15, 1)}


def test_pack_empty(spark):
    df = spark.createDataFrame([], "doc_id long, w long")
    assert pack_shards(df, "doc_id", "w", 100).count() == 0


def test_pack_shard_sizes_bounded(spark):
    # a doc straddling a boundary charges its whole weight to the earlier
    # shard, so every non-final shard's total is within one max-doc-weight
    # of the target on either side
    rng = random.Random(9)
    rows = [(i, rng.randrange(1, 200)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    per_shard = (
        pack_shards(df, "doc_id", "w", 5000, n_partitions=5)
        .groupBy("shard")
        .agg(F.sum("w").alias("t"))
        .collect()
    )
    last = max(r["shard"] for r in per_shard)
    for r in per_shard:
        if r["shard"] != last:
            assert 5000 - 200 < r["t"] < 5000 + 200
