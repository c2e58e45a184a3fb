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
    ts_col: str | None = None,
    ttl: str | None = None,
) -> DataFrame:
    """First-seen rows of a stream, deduplicated by fingerprint hash.

    Returns (id, fp_hash) for each fingerprint's FIRST occurrence (min id
    within a micro-batch, arrival order across batches). State per shard:
    one binary row packing the sorted u64 hash set.

    ``ts_col`` + ``ttl`` (e.g. "1 hour") enable WATERMARK-DRIVEN STATE
    EXPIRY — without it the seen-set grows with distinct fingerprints
    forever, which no production stream survives. Each fingerprint keeps
    its last-seen event time; a sighting within ``ttl`` (in event time) of
    the previous one is a duplicate and re-arms the clock, and entries
    whose last sighting has fallen behind the watermark
    (= max event time − ttl) are evicted, so the same fingerprint passes
    again afterwards. Shards idle long enough for everything to expire
    are removed wholesale via EventTimeTimeout — state strictly tracks
    the active working set."""
    if (ts_col is None) != (ttl is None):
        raise ValueError("ts_col and ttl must be provided together")
    fph = F.xxhash64(F.col(fingerprint_col))
    if ts_col is not None:
        ttl_ms = int(pd.Timedelta(ttl).total_seconds() * 1000)
        hashed = stream.withWatermark(ts_col, ttl).select(
            F.col(id_col).alias("id"),
            fph.alias("fp_hash"),
            F.pmod(fph, F.lit(num_shards)).alias("shard"),
            F.col(ts_col).alias("ts"),
        )
    else:
        hashed = stream.select(
            F.col(id_col).alias("id"),
            fph.alias("fp_hash"),
            F.pmod(fph, F.lit(num_shards)).alias("shard"),
        )

    out_schema = StructType(
        [StructField("id", LongType()), StructField("fp_hash", LongType())]
    )
    state_schema = StructType(
        [StructField("seen", BinaryType()), StructField("tss", BinaryType())]
    )

    def dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # the timeout fires only once the watermark has passed every
            # entry's last sighting + ttl — the whole shard is stale
            state.remove()
            return
        if state.exists:
            seen_blob, tss_blob = state.get
            seen = np.frombuffer(seen_blob, dtype="<u8")
            tss = np.frombuffer(tss_blob, dtype="<i8")
        else:
            seen = np.zeros(0, dtype=np.uint64)
            tss = np.zeros(0, dtype=np.int64)
        with_ttl = ts_col is not None
        if with_ttl:
            wm = state.getCurrentWatermarkMs()
            live = tss >= wm
            seen, tss = seen[live], tss[live]
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
            if with_ttl:
                ev_ms = (
                    pdf["ts"].to_numpy(dtype="datetime64[ms]").astype(np.int64)
                )
                # every sighting (fresh or duplicate) re-arms its entry
                order = np.argsort(h, kind="stable")
                h_s, ev_s = h[order], ev_ms[order]
                if len(seen):
                    idx = np.searchsorted(seen, h_s)
                    hit = (idx < len(seen)) & (
                        seen[np.minimum(idx, len(seen) - 1)] == h_s
                    )
                else:
                    idx = np.zeros(len(h_s), dtype=np.int64)
                    hit = np.zeros(len(h_s), dtype=bool)
                np.maximum.at(tss, idx[hit], ev_s[hit])
                add = ~hit
                if add.any():
                    merged = np.concatenate([seen, h_s[add]])
                    mtss = np.concatenate([tss, ev_s[add]])
                    o = np.argsort(merged, kind="stable")
                    seen, tss = merged[o], mtss[o]
            elif fresh.any():
                seen = np.union1d(seen, h[fresh])
        state.update((seen.astype("<u8").tobytes(), tss.astype("<i8").tobytes()))
        if with_ttl:
            wm = state.getCurrentWatermarkMs()
            horizon = int(tss.max()) + ttl_ms if len(tss) else wm + ttl_ms
            state.setTimeoutTimestamp(max(horizon, wm + 1))
        if out:
            yield pd.concat(out)

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if ts_col is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_dedup_bloom(
    stream: DataFrame,
    fingerprint_col: str,
    id_col: str,
    num_shards: int = 32,
    n: int = 1_000_000,
    fpp: float = 0.01,
    ts_col: str | None = None,
    ttl: str | None = None,
) -> DataFrame:
    """Bounded-state streaming dedup: per-shard BLOOM state instead of the
    exact seen-set. State is a fixed ``m``-bit array per shard regardless
    of stream length — the 100 TB-stream path. Semantics: a true duplicate
    is ALWAYS dropped (no false negatives in the filter), while a fresh
    item is dropped spuriously at ~fpp — i.e. exactness of deduplication
    trades for bounded memory, never the other way around.

    ``ts_col`` + ``ttl`` add GENERATIONAL EXPIRY: bloom bits cannot be
    deleted individually, so the state keeps TWO generations (current +
    previous), each covering one ttl of event time. Probes check both;
    inserts go to current; when the watermark crosses a generation
    boundary the previous generation is dropped and current rotates back.
    A fingerprint therefore stays suppressed for between ttl and 2×ttl
    after its last insertion — the rotating-bloom standard — with state
    still exactly 2 fixed bitmaps per shard. Fully idle shards are
    removed via EventTimeTimeout."""
    from ..core import bloom as B

    m_bits, k = B.bloom_params(n, fpp)
    if (ts_col is None) != (ttl is None):
        raise ValueError("ts_col and ttl must be provided together")
    with_ttl = ts_col is not None
    ttl_ms = int(pd.Timedelta(ttl).total_seconds() * 1000) if with_ttl else 0

    cols = [
        F.col(id_col).alias("id"),
        F.xxhash64(F.col(fingerprint_col)).alias("fp_hash"),
        F.pmod(F.xxhash64(F.col(fingerprint_col)), F.lit(num_shards)).alias("shard"),
    ]
    src = stream.withWatermark(ts_col, ttl) if with_ttl else stream
    if with_ttl:
        cols.append(F.col(ts_col).alias("ts"))
    hashed = src.select(*cols)

    out_schema = StructType(
        [StructField("id", LongType()), StructField("fp_hash", LongType())]
    )
    state_schema = StructType(
        [
            StructField("words", BinaryType()),
            StructField("prev_words", BinaryType()),
            StructField("gen_start", LongType()),
        ]
    )
    n_words = m_bits // 64

    def dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            blob, prev_blob, gen_start = state.get
            words = np.frombuffer(blob, dtype="<u8").copy()
            prev = (
                np.frombuffer(prev_blob, dtype="<u8").copy()
                if prev_blob is not None
                else np.zeros(n_words, dtype=np.uint64)
            )
        else:
            words = np.zeros(n_words, dtype=np.uint64)
            prev = np.zeros(n_words, dtype=np.uint64)
            gen_start = None
        if with_ttl and gen_start is not None:
            wm = state.getCurrentWatermarkMs()
            if wm >= gen_start + 2 * ttl_ms:
                words[:] = 0
                prev[:] = 0
                gen_start = (wm // ttl_ms) * ttl_ms
            elif wm >= gen_start + ttl_ms:
                prev, words = words, np.zeros(n_words, dtype=np.uint64)
                gen_start += ttl_ms
        s_cur = B.bloom_serialize(words, k)
        s_prev = B.bloom_serialize(prev, k)
        out = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            if with_ttl and gen_start is None:
                ev = pdf["ts"].to_numpy(dtype="datetime64[ms]").astype(np.int64)
                gen_start = (int(ev.min()) // ttl_ms) * ttl_ms
            pdf = pdf.sort_values("id").drop_duplicates("fp_hash", keep="first")
            h = pdf["fp_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            fresh = ~(B.bloom_probe(s_cur, h) | B.bloom_probe(s_prev, h))
            if fresh.any():
                out.append(pdf.loc[fresh, ["id", "fp_hash"]])
                words |= B.bloom_build(h[fresh], n, fpp)
                s_cur = B.bloom_serialize(words, k)
        state.update(
            (
                words.astype("<u8").tobytes(),
                prev.astype("<u8").tobytes(),
                gen_start if gen_start is not None else 0,
            )
        )
        if with_ttl:
            wm = state.getCurrentWatermarkMs()
            base = gen_start if gen_start is not None else wm
            state.setTimeoutTimestamp(max(base + 2 * ttl_ms, wm + 1))
        if out:
            yield pd.concat(out)

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if with_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_window_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window rollup with late-data watermark — the streaming twin
    of the batch q_timeseries win leg (same groupBy/agg shape; Structured
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
