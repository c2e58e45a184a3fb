"""Streaming as-of enrichment: attach, to every stream row, the latest
STATIC right-side value with ``right.ts <= row.ts`` for its key.

The batch ``operators.timeseries.asof_join`` realizes as-of with a union +
carry-forward window — a shuffle on the entity key. On a stream the right
side is typically a small, slowly-built reference table (exchange rates,
model versions, config history), so the streaming realization is a
BROADCAST BINARY SEARCH: collect the right table once at
query-construction time, sort each key's (ts, value) history, broadcast
the dict, and resolve every micro-batch row map-side with
``np.searchsorted``. Zero added shuffle, zero state — the stream side is
a pure projection, identical plan shape at any stream rate.

(For a STREAMING right side, the carry-forward becomes keyed state — the
``last-known value per key`` pattern via applyInPandasWithState; this
module covers the static-right case, which is the overwhelmingly common
enrichment shape.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf

import pyarrow as pa


def streaming_asof_enrich(
    stream: DataFrame,
    right: DataFrame,
    by: str,
    value_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``value_col``) holding the latest right
    ``value_col`` at-or-before each stream row's ``left_ts`` within its
    ``by`` key (NULL where no right row precedes). Ties at equal ts take
    the right row — matching the batch ``asof_join``'s `<=` semantics."""
    out_col = out_col or value_col
    hist: dict = {}
    for row in (
        right.select(by, right_ts, value_col).orderBy(by, right_ts).collect()
    ):
        hist.setdefault(row[by], ([], []))
        ts_list, val_list = hist[row[by]]
        ts_list.append(pd.Timestamp(row[right_ts]).value // 1_000_000)
        val_list.append(row[value_col])
    packed = {
        k: (np.asarray(ts, dtype=np.int64), vals) for k, (ts, vals) in hist.items()
    }
    val_type = right.schema[value_col].dataType
    from pyspark.sql.pandas.types import to_arrow_type

    arrow_val_type = to_arrow_type(val_type)

    @arrow_udf(val_type)
    def _lookup(keys: pa.Array, tss: pa.Array) -> pa.Array:
        ks = keys.to_pylist()
        ts = (
            pd.Series(tss.to_pandas())
            .to_numpy(dtype="datetime64[ms]")
            .astype(np.int64)
        )
        out = []
        for k, t in zip(ks, ts):
            h = packed.get(k)
            if h is None:
                out.append(None)
                continue
            idx = int(np.searchsorted(h[0], t, side="right")) - 1
            out.append(h[1][idx] if idx >= 0 else None)
        # explicit type: an all-miss batch would otherwise infer pa.null()
        return pa.array(out, type=arrow_val_type)

    return stream.withColumn(out_col, _lookup(F.col(by), F.col(left_ts)))
