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
) -> DataFrame:
    """(window_start, est_distinct, n_rows) per tumbling window, updated
    every micro-batch. est_distinct is the KMV estimate — exact while a
    window has seen < k distinct keys; use outputMode("update") and read
    the LATEST row per window (estimates only improve as batches arrive).
    """
    from ..core.kmv import kmv_build, kmv_deserialize, kmv_estimate, kmv_merge

    keyed = stream.select(
        F.window(F.col(ts_col), window).start.alias("win_start"),
        F.xxhash64(F.col(key_col)).alias("h"),
    )

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
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
