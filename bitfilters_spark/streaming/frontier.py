"""Streaming URL frontier — the Structured Streaming twin of the batch
``operators.web.url_frontier_schedule`` (same politeness semantics), for a
LIVE crawl: URLs arrive continuously, and each WAVE (one state invocation
for a host — a data micro-batch containing the host, or its
watermark-driven drain timeout) releases at most ``per_wave`` URLs for
that host, highest priority first. Everything a host may not fetch yet
waits in BOUNDED per-host state (a priority backlog capped at
``max_backlog`` — overflow is emitted as ``dropped`` rows, never silently
discarded), and backlogged hosts keep draining as the watermark advances
even when no new URL for them arrives (EventTimeTimeout — the same
quiet-key drain mechanism as streaming sessionization/dedup; a
ProcessingTimeTimeout variant spins no-data micro-batches under
``processAllAvailable`` on this Spark line, so event time it is).

State per host is ``O(max_backlog)`` strings + one counter — independent
of stream length; the only wide op is the groupBy on the host key, the
same shuffle a fetcher fleet partitions by. Released rows carry a
per-host ``wave`` counter (1, 2, ...) — the streaming analogue of the
batch operator's ``round`` (a host's wave-k URLs are exactly the rows the
batch schedule puts in its first k rounds, priority order preserved).

Politeness is WAVE-based, not wall-clock-based: watermark advances can
flush several waves of a host's backlog within one trigger, so
``per_wave`` bounds the release count per wave, never the fetch rate per
second. Downstream fetchers MUST pace by the ``wave`` column (fetch wave
k+1 only after wave k completes plus the crawl delay) — the wave number
is the politeness contract, the micro-batch boundary is not.

Re-submission contract — READ THIS BEFORE WIRING A LINK EXTRACTOR IN:
the default frontier is AT-LEAST-ONCE per submission. Released URLs
leave state entirely, so a URL re-discovered in a later micro-batch (the
normal case for a crawler that feeds extracted links back in) is
scheduled and released AGAIN. Pass ``dedupe=True`` to suppress
re-arrivals of URLs this host has already released or still holds in its
backlog: the state then also carries a per-host released-set (8-byte
URL digests, capped at ``seen_cap`` newest entries — a host that
releases more than ``seen_cap`` URLs can re-release its OLDEST ones,
so the guarantee is exactly-once within the remembered window, and
state stays bounded at ``max_backlog`` strings + ``seen_cap`` longs).
Duplicate suppression is what the caller asked for, so suppressed
re-arrivals emit nothing (unlike backlog overflow, which loses NEW work
and is always emitted as ``dropped``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("priority", DoubleType()),
        StructField("wave", LongType()),
        StructField("status", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("urls", ArrayType(StringType())),
        StructField("prios", ArrayType(DoubleType())),
        StructField("wave", LongType()),
        StructField("seen", BinaryType()),
    ]
)


def _url_digest(url: str) -> int:
    """Deterministic 8-byte URL digest (blake2b — Python's str hash is
    process-salted and executor-dependent, so it can never touch state)."""
    return int.from_bytes(
        hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(),
        "little",
        signed=True,  # int64 range, so the state blob packs as np.int64
    )


def streaming_frontier(
    stream: DataFrame,
    url_col: str,
    host_col: str,
    ts_col: str = "ts",
    priority_col: str | None = None,
    per_wave: int = 2,
    max_backlog: int = 10_000,
    watermark: str = "0 seconds",
    dedupe: bool = False,
    seen_cap: int = 100_000,
    seen_ttl_ms: int = 86_400_000,
) -> DataFrame:
    """(host, url, priority, wave, status) — ``status`` is ``released``
    for URLs cleared to fetch this wave (``wave`` = 1, 2, ... per host),
    or ``dropped`` for backlog overflow beyond ``max_backlog``
    (lowest-priority first out). Dropped rows carry ``wave = -1``: they
    were never scheduled into any wave, and tagging them with the
    releasing wave's number would imply they were.

    ``priority_col`` None ranks by URL (deterministic). ``ts_col``
    carries the event time that drives the watermark; a backlogged host
    drains one wave per watermark advance past its timer. ``dedupe``
    opts into released/pending re-submission suppression (see the module
    docstring for the exact at-least-once vs remembered-window
    exactly-once contracts).

    Wave numbers are DENSE: the counter bumps only when URLs are
    actually released, so ``wave k`` is the host's k-th release round
    even when an invocation's incoming rows were all suppressed as
    duplicates. With ``dedupe``, a fully-drained host's remaining state
    (the seen-window) ages out ``seen_ttl_ms`` of event time past the
    last activity — total state tracks active hosts, not hosts ever
    seen; a URL re-submitted after the TTL is released again (the
    remembered-window contract, now time- as well as size-bounded).
    """
    if per_wave <= 0:
        raise ValueError("per_wave must be positive")
    if max_backlog < 0:
        raise ValueError("max_backlog must be >= 0")
    if seen_cap <= 0:
        raise ValueError("seen_cap must be positive")

    prio = (
        F.col(priority_col).cast("double")
        if priority_col is not None
        else F.lit(0.0)
    )
    keyed = stream.withWatermark(ts_col, watermark).select(
        F.col(host_col).cast("string").alias("host"),
        F.col(url_col).cast("string").alias("url"),
        prio.alias("priority"),
        F.col(ts_col).alias("ts"),
    )

    cap = int(per_wave)
    backlog_cap = int(max_backlog)
    seen_max = int(seen_cap)
    drop_dupes = bool(dedupe)

    def _emit(host, rows, wave, status):
        return pd.DataFrame(
            {
                "host": [host] * len(rows),
                "url": [u for u, _ in rows],
                "priority": [p for _, p in rows],
                "wave": [wave] * len(rows),
                "status": [status] * len(rows),
            }
        )

    def release(key, pdfs, state: GroupState):
        host = key[0]
        if state.exists:
            urls, prios, wave, seen_blob = state.get
            pending = list(zip(list(urls), list(prios)))
            seen = (
                np.frombuffer(seen_blob, dtype=np.int64).tolist()
                if seen_blob
                else []
            )
        else:
            pending, wave, seen = [], 0, []
        ev_ms = 0  # also read on the timed-out drain path below
        if not state.hasTimedOut:
            incoming = []
            for pdf in pdfs:
                incoming.extend(
                    zip(pdf["url"].tolist(), pdf["priority"].tolist())
                )
                if len(pdf):
                    ev_ms = max(
                        ev_ms, int(pdf["ts"].max().timestamp() * 1000)
                    )
        elif not pending:
            # the idle (seen-window) timer fired on a fully-drained host:
            # the state holds only the dedupe seen-set — age it out so
            # total state size tracks ACTIVE hosts, not hosts ever seen
            if state.exists:
                state.remove()
            return
        if not state.hasTimedOut:
            if drop_dupes and incoming:
                # suppress re-arrivals of released URLs (the remembered
                # window) and of URLs already waiting in the backlog
                seen_set = set(seen)
                held = {u for u, _ in pending}
                incoming = [
                    (u, p)
                    for u, p in incoming
                    if u not in held and _url_digest(u) not in seen_set
                ]
                # collapse duplicates WITHIN the batch: keep max priority
                best: dict = {}
                for u, p in incoming:
                    if u not in best or p > best[u]:
                        best[u] = p
                incoming = list(best.items())
            pending.extend(incoming)
        # highest priority first; URL tiebreak keeps waves deterministic
        pending.sort(key=lambda r: (-r[1], r[0]))
        released = pending[:cap]
        rest = pending[cap:]
        dropped = rest[backlog_cap:]
        rest = rest[:backlog_cap]
        if released:
            # wave bumps ONLY when URLs are actually released, so the
            # persisted numbering stays dense — 'wave k = the host's
            # k-th release round' even when an invocation's incoming
            # rows were all suppressed as duplicates
            wave += 1
            if drop_dupes:
                seen.extend(_url_digest(u) for u, _ in released)
                seen = seen[-seen_max:]  # newest-entries window
        if rest or (drop_dupes and seen):
            blob = (
                np.asarray(seen, dtype=np.int64).tobytes()
                if drop_dupes
                else None
            )
            state.update(
                ([u for u, _ in rest], [p for _, p in rest], wave, blob)
            )
            if rest:
                # drain on the next watermark advance (must be > watermark)
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            else:
                # seen-window only: a LONG idle timer ages the dedupe
                # memory out instead of holding it forever. Base it on
                # the batch's own max event time, not just the current
                # watermark — the watermark lags one batch (and is 0
                # before the first advance), which would put the timer
                # in the past and expire the window immediately.
                state.setTimeoutTimestamp(
                    max(state.getCurrentWatermarkMs(), ev_ms) + seen_ttl_ms
                )
        elif state.exists:
            state.remove()
        if released:
            yield _emit(host, released, wave, "released")
        if dropped:
            # wave = -1: overflow rows were never scheduled into a wave
            yield _emit(host, dropped, -1, "dropped")

    return keyed.groupBy("host").applyInPandasWithState(
        release,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
