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
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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
    ]
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
) -> DataFrame:
    """(host, url, priority, wave, status) — ``status`` is ``released``
    for URLs cleared to fetch this wave, ``dropped`` for backlog
    overflow beyond ``max_backlog`` (lowest-priority first out).

    ``priority_col`` None ranks by URL (deterministic). ``ts_col``
    carries the event time that drives the watermark; a backlogged host
    drains one wave per watermark advance past its timer.
    """
    if per_wave <= 0:
        raise ValueError("per_wave must be positive")
    if max_backlog < 0:
        raise ValueError("max_backlog must be >= 0")

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
            urls, prios, wave = state.get
            pending = list(zip(list(urls), list(prios)))
        else:
            pending, wave = [], 0
        if not state.hasTimedOut:
            for pdf in pdfs:
                pending.extend(zip(pdf["url"].tolist(), pdf["priority"].tolist()))
        # highest priority first; URL tiebreak keeps waves deterministic
        pending.sort(key=lambda r: (-r[1], r[0]))
        wave += 1
        released = pending[:cap]
        rest = pending[cap:]
        dropped = rest[backlog_cap:]
        rest = rest[:backlog_cap]
        if rest:
            state.update(([u for u, _ in rest], [p for _, p in rest], wave))
            # drain on the next watermark advance (must be > watermark)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        elif state.exists:
            state.remove()
        if released:
            yield _emit(host, released, wave, "released")
        if dropped:
            yield _emit(host, dropped, wave, "dropped")

    return keyed.groupBy("host").applyInPandasWithState(
        release,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
