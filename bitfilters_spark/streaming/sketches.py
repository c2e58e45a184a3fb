"""Streaming sketch aggregation: per-window distinct counts with BOUNDED
state.

Exact streaming COUNT(DISTINCT) needs state proportional to the number of
distinct keys — unbounded on an unbounded stream. A KMV sketch per window
caps state at ``k`` u64 values (8k bytes at k=1024) regardless of stream
length, stays exact while under-full, and merges associatively across
micro-batches (the same algebra the batch build uses). This is the
100 TB-stream cardinality profile: state size = #open-windows × k × 8 B.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_distinct_counts(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    k: int = 1024,
    watermark: str | None = None,
) -> DataFrame:
    """(window_start, est_distinct, n_rows) per tumbling window, updated
    every micro-batch. est_distinct is the KMV estimate — exact while a
    window has seen < k distinct keys; use outputMode("update") and read
    the LATEST row per window (estimates only improve as batches arrive).

    ``watermark`` (e.g. "30 minutes") bounds OPEN-WINDOW state: once the
    event-time watermark passes a window's end + allowance, its sketch row
    is dropped via EventTimeTimeout — without it, every window ever seen
    stays in the store forever. (A straggler arriving after eviction would
    restart that window's count from empty; pick the allowance to cover
    the stream's real lateness.)
    """
    from ..core.kmv import kmv_build, kmv_deserialize, kmv_estimate, kmv_merge

    src = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    win_ms = int(pd.Timedelta(window).total_seconds() * 1000)
    allow_ms = 0 if watermark is None else int(pd.Timedelta(watermark).total_seconds() * 1000)
    cols = [
        F.window(F.col(ts_col), window).start.alias("win_start"),
        F.xxhash64(F.col(key_col)).alias("h"),
    ]
    if watermark is not None:
        # the event-time-tagged column must survive projection for
        # EventTimeTimeout's analysis check (window(...).start drops the tag)
        cols.append(F.col(ts_col).alias("__ts"))
    keyed = src.select(*cols)

    out_schema = StructType(
        [
            StructField("win_start", TimestampType()),
            StructField("est_distinct", LongType()),
            StructField("n_rows", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("sketch", BinaryType()), StructField("n", LongType())]
    )

    def agg(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # watermark passed this window's end + allowance: final value
            # was already emitted in update mode; free the sketch row
            state.remove()
            return
        if state.exists:
            blob, n = state.get
            blob = bytes(blob)
        else:
            blob, n = None, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            part = kmv_build(h, k)
            blob = part if blob is None else kmv_merge([blob, part])
            n += len(h)
        if blob is not None:
            state.update((blob, n))
            if watermark is not None:
                win_end = int(pd.Timestamp(key[0]).value // 1_000_000) + win_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(win_end + allow_ms, wm + 1))
            yield pd.DataFrame(
                {
                    "win_start": [key[0]],
                    "est_distinct": [kmv_estimate(blob)],
                    "n_rows": [n],
                }
            )

    return keyed.groupBy("win_start").applyInPandasWithState(
        agg,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_cms_counts(
    stream: DataFrame,
    key_col: str,
    tracked: list,
    ts_col: str = "ts",
    window: str = "1 hour",
    d: int = 4,
    w: int = 16384,
    watermark: str | None = None,
) -> DataFrame:
    """Per-window frequency estimates for a watchlist of keys with
    BOUNDED state — the frequency sibling of
    :func:`streaming_distinct_counts`.

    Exact per-key streaming counts need a counter per distinct key
    (unbounded). A Count-Min sketch per window caps state at d×w u64
    counters (fixed bytes) regardless of how many distinct keys flow
    through; micro-batch partials merge by ADDITION (the batch CMS
    algebra), and each update emits ``(win_start, key, est_count,
    n_rows)`` for every tracked key — estimates are exact-or-over, never
    under, and exact while a window's distinct keys colliding into any
    tracked counter stay absent. ``tracked`` is the dashboard watchlist
    (small by contract); its hashes are computed once at query
    construction with the same JVM ``xxhash64`` the stream uses.
    ``watermark`` evicts closed windows' sketches via EventTimeTimeout,
    exactly like the KMV variant.
    """
    from ..core.cms import cms_counts, cms_deserialize, cms_estimate, cms_merge, cms_serialize

    spark = stream.sparkSession
    trows = spark.createDataFrame(
        [(t,) for t in tracked], f"k {stream.schema[key_col].dataType.simpleString()}"
    ).select("k", F.xxhash64("k").alias("h")).collect()
    tracked_keys = [r["k"] for r in trows]
    tracked_hs = np.array([r["h"] for r in trows], dtype=np.int64).view(np.uint64)

    src = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    win_ms = int(pd.Timedelta(window).total_seconds() * 1000)
    allow_ms = 0 if watermark is None else int(
        pd.Timedelta(watermark).total_seconds() * 1000
    )
    cols = [
        F.window(F.col(ts_col), window).start.alias("win_start"),
        F.xxhash64(F.col(key_col)).alias("h"),
    ]
    if watermark is not None:
        cols.append(F.col(ts_col).alias("__ts"))
    keyed = src.select(*cols)

    key_dt = stream.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField("win_start", TimestampType()),
            StructField("key", key_dt),
            StructField("est_count", LongType()),
            StructField("n_rows", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("sketch", BinaryType()), StructField("n", LongType())]
    )

    def agg(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            blob, n = state.get
            blob = bytes(blob)
        else:
            blob, n = None, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            part = cms_serialize(cms_counts(h, d, w))
            blob = part if blob is None else cms_merge([blob, part])
            n += len(h)
        if blob is not None:
            state.update((blob, n))
            if watermark is not None:
                win_end = int(pd.Timestamp(key[0]).value // 1_000_000) + win_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(win_end + allow_ms, wm + 1))
            ests = cms_estimate(blob, tracked_hs)
            yield pd.DataFrame(
                {
                    "win_start": [key[0]] * len(tracked_keys),
                    "key": tracked_keys,
                    "est_count": ests.astype(np.int64),
                    "n_rows": [n] * len(tracked_keys),
                }
            )

    return keyed.groupBy("win_start").applyInPandasWithState(
        agg,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_quantiles(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    k: int = 1024,
    qs: tuple = (0.5, 0.9, 0.99),
    watermark: str | None = None,
) -> DataFrame:
    """Per-window value quantiles with BOUNDED state — the third member
    of the streaming sketch family (KMV: distinct, CMS: frequency, BKS:
    sample/quantiles).

    A bottom-k hash sample per open window caps state at 16k bytes
    regardless of stream length; micro-batch partials merge with the
    family algebra (order-independent — replays and batch boundaries
    can't change the sample), and each update emits nearest-rank
    quantile estimates (EXACT while a window has seen < k distinct
    keys). ``key_col`` should uniquely identify rows (the hash decides
    sample membership); ``watermark`` evicts closed windows via
    EventTimeTimeout like the siblings.
    """
    from ..core.bksample import bks_build, bks_merge, bks_quantile

    src = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    win_ms = int(pd.Timedelta(window).total_seconds() * 1000)
    allow_ms = 0 if watermark is None else int(
        pd.Timedelta(watermark).total_seconds() * 1000
    )
    cols = [
        F.window(F.col(ts_col), window).start.alias("win_start"),
        F.xxhash64(F.col(key_col)).alias("h"),
        F.col(value_col).cast("long").alias("v"),
    ]
    if watermark is not None:
        cols.append(F.col(ts_col).alias("__ts"))
    keyed = src.select(*cols)

    out_fields = [
        StructField("win_start", TimestampType()),
        StructField("n_rows", LongType()),
    ] + [StructField(f"p{int(q * 100)}", LongType()) for q in qs]
    out_schema = StructType(out_fields)
    state_schema = StructType(
        [StructField("sketch", BinaryType()), StructField("n", LongType())]
    )

    def agg(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            blob, n = state.get
            blob = bytes(blob)
        else:
            blob, n = None, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            v = pdf["v"].to_numpy(dtype=np.int64)
            part = bks_build(h, v, k)
            blob = part if blob is None else bks_merge([blob, part])
            n += len(h)
        if blob is not None:
            state.update((blob, n))
            if watermark is not None:
                win_end = int(pd.Timestamp(key[0]).value // 1_000_000) + win_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(win_end + allow_ms, wm + 1))
            row = {"win_start": [key[0]], "n_rows": [n]}
            for q in qs:
                row[f"p{int(q * 100)}"] = [bks_quantile(blob, q)]
            yield pd.DataFrame(row)

    return keyed.groupBy("win_start").applyInPandasWithState(
        agg,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_topk(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    k: int = 256,
    top_k: int = 10,
    watermark: str | None = None,
) -> DataFrame:
    """Per-window heavy hitters with BOUNDED state — the fourth member of
    the streaming sketch family (KMV: distinct, CMS: frequency for a
    KNOWN watchlist, BKS: quantiles, MG: WHICH keys are frequent).

    Unlike :func:`streaming_cms_counts` this needs no up-front watchlist:
    a Misra-Gries summary per open window tracks at most ``k`` counters
    (16k bytes at k=1024) and DISCOVERS the hot keys. Micro-batch
    partials merge with the PODS'12 counter algebra, so over any batch
    split each emitted count is a lower bound with undercount
    <= n/(k+1), every key whose true in-window count exceeds n/(k+1) is
    guaranteed emitted, and counts are EXACT while a window's distinct
    keys stay <= k. Each update emits the current top ``top_k``
    candidates as ``(win_start, key_hash, est_count, n_rows)`` —
    key_hash is the stream-side ``xxhash64(key)``; join back to raw keys
    on the same expression. ``watermark`` evicts closed windows via
    EventTimeTimeout like the siblings.
    """
    from ..core.mg import mg_build, mg_merge, mg_topk

    src = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    win_ms = int(pd.Timedelta(window).total_seconds() * 1000)
    allow_ms = 0 if watermark is None else int(
        pd.Timedelta(watermark).total_seconds() * 1000
    )
    cols = [
        F.window(F.col(ts_col), window).start.alias("win_start"),
        F.xxhash64(F.col(key_col)).alias("h"),
    ]
    if watermark is not None:
        cols.append(F.col(ts_col).alias("__ts"))
    keyed = src.select(*cols)

    out_schema = StructType(
        [
            StructField("win_start", TimestampType()),
            StructField("key_hash", LongType()),
            StructField("est_count", LongType()),
            StructField("n_rows", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("sketch", BinaryType()), StructField("n", LongType())]
    )

    def agg(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            blob, n = state.get
            blob = bytes(blob)
        else:
            blob, n = None, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            part = mg_build(h, k)
            blob = part if blob is None else mg_merge([blob, part])
            n += len(h)
        if blob is not None:
            state.update((blob, n))
            if watermark is not None:
                win_end = int(pd.Timestamp(key[0]).value // 1_000_000) + win_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(win_end + allow_ms, wm + 1))
            keys, counts = mg_topk(blob, top_k)
            yield pd.DataFrame(
                {
                    "win_start": [key[0]] * len(keys),
                    "key_hash": keys.view(np.int64),
                    "est_count": counts.astype(np.int64),
                    "n_rows": [n] * len(keys),
                }
            )

    return keyed.groupBy("win_start").applyInPandasWithState(
        agg,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_drift(
    stream: DataFrame,
    value_col: str,
    baseline: dict,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per-window distribution drift against a frozen baseline — the
    streaming sibling of the batch ``drift_report`` (operators/text.py):
    a live "did this hour's value distribution move?" alarm.

    ``baseline`` is ``{"min": float, "max": float, "counts": [int…]}``
    — the batch histogram of the reference snapshot (its bucket count
    fixes ``n_buckets``). State per open window is that fixed counts
    array (n_buckets longs — bounded regardless of stream length);
    micro-batch partials ADD, and each update emits
    ``(win_start, n_rows, psi)`` with the same PSI convention and
    1e-6 zero-floor as the batch operator, values outside the baseline
    range clamping into the edge buckets. Watermark evicts closed
    windows via EventTimeTimeout like the sketch siblings.
    """
    import math

    mn, mx = float(baseline["min"]), float(baseline["max"])
    base_counts = np.asarray(baseline["counts"], dtype=np.float64)
    n_buckets = len(base_counts)
    if n_buckets < 2 or mx <= mn:
        raise ValueError("baseline needs >= 2 buckets and max > min")
    base_p = np.maximum(
        base_counts / max(base_counts.sum(), 1.0), 1e-6
    )
    width = (mx - mn) / n_buckets

    src = stream if watermark is None else stream.withWatermark(ts_col, watermark)
    win_ms = int(pd.Timedelta(window).total_seconds() * 1000)
    allow_ms = 0 if watermark is None else int(
        pd.Timedelta(watermark).total_seconds() * 1000
    )
    bucket = F.greatest(
        F.least(
            F.floor((F.col(value_col).cast("double") - F.lit(mn)) / F.lit(width)),
            F.lit(n_buckets - 1),
        ),
        F.lit(0),
    ).cast("int")
    cols = [
        F.window(F.col(ts_col), window).start.alias("win_start"),
        bucket.alias("b"),
    ]
    if watermark is not None:
        cols.append(F.col(ts_col).alias("__ts"))
    keyed = src.where(F.col(value_col).isNotNull()).select(*cols)

    out_schema = StructType(
        [
            StructField("win_start", TimestampType()),
            StructField("n_rows", LongType()),
            StructField("psi", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("counts", BinaryType())])

    def agg(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            counts = np.frombuffer(bytes(state.get[0]), dtype="<i8").copy()
        else:
            counts = np.zeros(n_buckets, dtype=np.int64)
        for pdf in pdfs:
            if not len(pdf):
                continue
            np.add.at(counts, pdf["b"].to_numpy(dtype=np.int64), 1)
        n = int(counts.sum())
        if n:
            state.update((counts.astype("<i8").tobytes(),))
            if watermark is not None:
                win_end = int(pd.Timestamp(key[0]).value // 1_000_000) + win_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(win_end + allow_ms, wm + 1))
            p = np.maximum(counts / n, 1e-6)
            psi = float(np.sum((p - base_p) * np.log(p / base_p)))
            yield pd.DataFrame(
                {"win_start": [key[0]], "n_rows": [n], "psi": [round(psi, 6)]}
            )

    return keyed.groupBy("win_start").applyInPandasWithState(
        agg,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
