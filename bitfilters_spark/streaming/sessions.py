"""Streaming sessionization — the Structured Streaming twin of the batch
``operators.timeseries.sessionize`` (same gap semantics), with
watermark-closed emission.

Batch sessionization is a window function; on a stream the open session is
STATE: one (start, end, n_events) triple per entity, extended while events
keep arriving within ``gap`` (event time), closed and EMITTED once either
(a) a later event opens the next session, or (b) the watermark passes the
open session's end + gap (EventTimeTimeout — sessions of entities that
simply stop emitting still close). State per entity is constant-size; the
only wide op is the groupBy on the entity key — identical shuffle shape to
the batch operator.

Ordering note: events are processed in event-time order WITHIN a batch and
best-effort across batches (an out-of-order event still inside the open
session's gap envelope extends it; one older than watermark is dropped by
Spark's late-row filter before reaching the operator). With the watermark
delay >= gap, any event that could still legally extend a session arrives
before the session times out, so emitted sessions are final.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """(key, session_start, session_end, n_events) per CLOSED session.

    ``watermark`` defaults to ``gap`` (the smallest delay that keeps
    emitted sessions final — see module docstring).
    """
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    src = stream.withWatermark(ts_col, watermark or gap)
    keyed = src.select(
        F.col(key_col).alias("k"), F.col(ts_col).alias("ts")
    )

    out_schema = StructType(
        [
            StructField("k", keyed.schema["k"].dataType),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_ms", LongType()),
            StructField("end_ms", LongType()),
            StructField("n", LongType()),
        ]
    )

    def _row(key, start_ms: int, end_ms: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
            }
        )

    def sessionize(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield _row(key, start, end, n)
            return
        cur = state.get if state.exists else None
        out = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ev = (
                pdf["ts"].to_numpy(dtype="datetime64[ms]").astype("int64")
            )
            ev.sort()
            for t in ev:
                t = int(t)
                if cur is None:
                    cur = (t, t, 1)
                elif t <= cur[1] + gap_ms:
                    # inside the gap envelope: extend (covers mild
                    # out-of-order arrivals too — min/max bounds)
                    cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1)
                else:
                    out.append(cur)
                    cur = (t, t, 1)
        if cur is not None:
            state.update(cur)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(cur[1] + gap_ms, wm + 1))
        for start, end, n in out:
            yield _row(key, start, end, n)

    return keyed.groupBy("k").applyInPandasWithState(
        sessionize,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    ).select(
        F.col("k").alias(key_col),
        "session_start",
        "session_end",
        "n_events",
    )
