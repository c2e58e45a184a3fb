"""Streaming deduplication (Structured Streaming, stateful).

The reference documents duplicate detection as a headline filter use case
(``docs/README.md`` §Use cases: "duplicate detection ... check if an item
might be a duplicate before an expensive lookup"). In Spark the natural
realization is a stateful streaming operator: fingerprints are hashed,
hash-sharded across ``num_shards`` groups, and each shard keeps the set of
seen fingerprint hashes in ``applyInPandasWithState`` state. First
occurrence passes through; later occurrences are dropped — across
micro-batches, exactly.

Scale posture: state is partitioned by shard (one state row per shard, not
per key), sized by distinct fingerprints / num_shards * 8 bytes. At very
large cardinality swap the exact set for a bloom partial per shard (same
shape, bounded state, no-false-negative dropping becomes approximate) —
the exact variant is the correctness baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)


def streaming_dedup_exact(
    stream: DataFrame,
    fingerprint_col: str,
    id_col: str,
    num_shards: int = 32,
) -> DataFrame:
    """First-seen rows of a stream, deduplicated by fingerprint hash.

    Returns (id, fp_hash) for each fingerprint's FIRST occurrence (min id
    within a micro-batch, arrival order across batches). State per shard:
    one binary row packing the sorted u64 hash set.
    """
    hashed = stream.select(
        F.col(id_col).alias("id"),
        F.xxhash64(F.col(fingerprint_col)).alias("fp_hash"),
        F.pmod(F.xxhash64(F.col(fingerprint_col)), F.lit(num_shards)).alias("shard"),
    )

    out_schema = StructType(
        [StructField("id", LongType()), StructField("fp_hash", LongType())]
    )
    state_schema = StructType([StructField("seen", BinaryType())])

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            (seen_blob,) = state.get
            seen = np.frombuffer(seen_blob, dtype="<u8")
        else:
            seen = np.zeros(0, dtype=np.uint64)
        out = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            # keep min id per fingerprint within the batch, then drop
            # fingerprints already in state
            pdf = pdf.sort_values("id").drop_duplicates("fp_hash", keep="first")
            h = pdf["fp_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            fresh = ~np.isin(h, seen)
            if fresh.any():
                out.append(pdf.loc[fresh, ["id", "fp_hash"]])
                seen = np.union1d(seen, h[fresh])
        state.update((seen.astype("<u8").tobytes(),))
        if out:
            yield pd.concat(out)

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_bloom(
    stream: DataFrame,
    fingerprint_col: str,
    id_col: str,
    num_shards: int = 32,
    n: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Bounded-state streaming dedup: per-shard BLOOM state instead of the
    exact seen-set. State is a fixed ``m``-bit array per shard regardless
    of stream length — the 100 TB-stream path. Semantics: a true duplicate
    is ALWAYS dropped (no false negatives in the filter), while a fresh
    item is dropped spuriously at ~fpp — i.e. exactness of deduplication
    trades for bounded memory, never the other way around.
    """
    from ..core import bloom as B

    m_bits, k = B.bloom_params(n, fpp)

    hashed = stream.select(
        F.col(id_col).alias("id"),
        F.xxhash64(F.col(fingerprint_col)).alias("fp_hash"),
        F.pmod(F.xxhash64(F.col(fingerprint_col)), F.lit(num_shards)).alias("shard"),
    )
    out_schema = StructType(
        [StructField("id", LongType()), StructField("fp_hash", LongType())]
    )
    state_schema = StructType([StructField("words", BinaryType())])

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            (blob,) = state.get
            words = np.frombuffer(blob, dtype="<u8").copy()
        else:
            words = np.zeros(m_bits // 64, dtype=np.uint64)
        serialized = B.bloom_serialize(words, k)
        out = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("id").drop_duplicates("fp_hash", keep="first")
            h = pdf["fp_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            fresh = ~B.bloom_probe(serialized, h)
            if fresh.any():
                out.append(pdf.loc[fresh, ["id", "fp_hash"]])
                words |= B.bloom_build(h[fresh], n, fpp)
                serialized = B.bloom_serialize(words, k)
        state.update((words.astype("<u8").tobytes(),))
        if out:
            yield pd.concat(out)

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_window_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window rollup with late-data watermark — the streaming twin
    of the batch q_events_window (same groupBy/agg shape; Structured
    Streaming handles incremental state and late arrivals)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n",
        )
    )
