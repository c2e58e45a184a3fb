"""Streaming as-of enrichment: attach, to every stream row, the latest
right-side value with ``right.ts <= row.ts`` for its key.

Two realizations, matching the two shapes the right side takes:

- **Static right** (`streaming_asof_enrich`): the right side is a small,
  slowly-built reference table (exchange rates, model versions, config
  history), so the realization is a BROADCAST BINARY SEARCH: collect the
  right table once at query-construction time, sort each key's
  (ts, value) history, broadcast the dict, and resolve every micro-batch
  row map-side with one vectorized ``np.searchsorted`` per key present in
  the batch. Zero added shuffle, zero state — the stream side is a pure
  projection, identical plan shape at any stream rate. The collect is
  guarded: a right side above ``max_right_rows`` fails fast at
  construction (use `streaming_asof_join` for a large / unbounded right).

- **Streaming right** (`streaming_asof_join`): the right side is itself a
  stream, so the carry-forward becomes KEYED STATE — the last-known-values
  history per key via ``applyInPandasWithState``. Both streams union into
  one keyed shuffle; each micro-batch merges the right rows into the
  key's sorted (ts, value) history and resolves the left rows against it
  with the same ``<=`` tie semantics as the batch
  ``operators.timeseries.asof_join``. State per key is capped at
  ``max_history`` most-recent entries.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

import pyarrow as pa


def streaming_asof_enrich(
    stream: DataFrame,
    right: DataFrame,
    by: str,
    value_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    out_col: str | None = None,
    max_right_rows: int = 1_000_000,
) -> DataFrame:
    """Add ``out_col`` (default ``value_col``) holding the latest right
    ``value_col`` at-or-before each stream row's ``left_ts`` within its
    ``by`` key (NULL where no right row precedes). Ties at equal ts take
    the right row — matching the batch ``asof_join``'s `<=` semantics.

    Raises ``ValueError`` if the right side exceeds ``max_right_rows``
    (it is collected to the driver and broadcast — the static-reference
    contract). For a large or unbounded right side use
    ``streaming_asof_join``, which keeps the history as keyed state.
    """
    out_col = out_col or value_col
    # Fail fast BEFORE collecting an arbitrarily large table to the driver
    # (same contract gate as clustering's <=5M-edge check).
    if right.limit(max_right_rows + 1).count() > max_right_rows:
        raise ValueError(
            f"streaming_asof_enrich: right side exceeds max_right_rows="
            f"{max_right_rows}; it is collected and broadcast, so it must "
            "be a bounded reference table. For a large or streaming right "
            "side use streaming_asof_join (keyed state)."
        )
    # Epoch conversion happens IN SPARK on both sides (unix_millis after a
    # cast to timestamp), so driver and executor agree byte-for-byte in any
    # session timezone. Converting the collected driver rows with pandas
    # while the executor converted Arrow arrays mixed epoch bases: naive
    # wall-clock treated as UTC on one side, true UTC on the other.
    hist: dict = {}
    for row in (
        right.select(
            by,
            F.unix_millis(F.col(right_ts).cast("timestamp")).alias("__ms"),
            value_col,
        )
        .orderBy(by, "__ms")
        .collect()
    ):
        hist.setdefault(row[by], ([], []))
        ts_list, val_list = hist[row[by]]
        ts_list.append(row["__ms"])
        val_list.append(row[value_col])
    packed = {
        k: (np.asarray(ts, dtype=np.int64), np.asarray(vals, dtype=object))
        for k, (ts, vals) in hist.items()
    }
    val_type = right.schema[value_col].dataType
    from pyspark.sql.pandas.types import to_arrow_type

    arrow_val_type = to_arrow_type(val_type)

    @arrow_udf(val_type)
    def _lookup(keys: pa.Array, ms: pa.Array) -> pa.Array:
        ks = np.asarray(keys.to_pylist(), dtype=object)
        ts = np.asarray(ms.to_pylist(), dtype=np.int64)
        out = np.full(len(ks), None, dtype=object)
        if len(ks):
            # one vectorized searchsorted per key PRESENT IN THE BATCH —
            # not one Python call per row
            positions = pd.Series(np.arange(len(ks))).groupby(ks, sort=False)
            for k, pos in positions.indices.items():
                h = packed.get(k)
                if h is None:
                    continue
                loc = np.searchsorted(h[0], ts[pos], side="right") - 1
                hit = loc >= 0
                vals = np.full(len(pos), None, dtype=object)
                vals[hit] = h[1][loc[hit]]
                out[pos] = vals
        # explicit type: an all-miss batch would otherwise infer pa.null()
        return pa.array(out.tolist(), type=arrow_val_type)

    left_ms = F.unix_millis(F.col(left_ts).cast("timestamp"))
    return stream.withColumn(out_col, _lookup(F.col(by), left_ms))


def streaming_asof_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    by: str,
    value_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    out_col: str | None = None,
    max_history: int = 10_000,
) -> DataFrame:
    """STREAM-RIGHT as-of: enrich ``left_stream`` rows with the latest
    ``value_col`` from ``right_stream`` at-or-before each row's ts for its
    ``by`` key — the last-known-values-per-key pattern as keyed state.

    Realization: tag and union the two streams (one shuffle on the key —
    the same shape as the batch ``asof_join``'s union-window), then
    ``applyInPandasWithState`` per key: merge the batch's right rows into
    the state's sorted (epoch-ms, value) history, resolve the batch's left
    rows with one vectorized ``searchsorted`` (side='right': a right row
    at the same ts wins, matching batch ``<=`` tie semantics), emit the
    left rows + ``out_col``.

    State per key is the history, capped at the ``max_history`` most
    recent entries (a left row older than the capped horizon resolves
    against the oldest retained entry's predecessor as NULL). Rows are
    final on emission: a right row arriving AFTER a left row it should
    have matched (cross-batch disorder beyond the history) does not
    retract the emitted row — pick micro-batch boundaries / source
    ordering accordingly, as with any append-mode stateful operator.

    Left rows pass through with all their columns; ``out_col`` (default
    ``value_col``) must not collide.
    """
    out_col = out_col or value_col
    if out_col in left_stream.columns:
        raise ValueError(f"out_col {out_col!r} collides with a left column; rename first")
    payload = list(left_stream.columns)
    val_type = right_stream.schema[value_col].dataType

    # Identical Spark-side epoch conversion on both branches (see
    # streaming_asof_enrich) — no pandas/driver epoch mixing.
    tagged_l = left_stream.select(
        F.col(by).alias("__k"),
        F.unix_millis(F.col(left_ts).cast("timestamp")).alias("__ms"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(val_type).alias("__val"),
        *[F.col(c) for c in payload],
    )
    tagged_r = right_stream.select(
        F.col(right_ts).alias("__rts"),  # keep original for the cast below
        F.col(by).alias("__k"),
        F.col(value_col).alias("__val"),
    ).select(
        "__k",
        F.unix_millis(F.col("__rts").cast("timestamp")).alias("__ms"),
        F.lit(1).alias("__side"),
        "__val",
        *[
            F.lit(None).cast(left_stream.schema[c].dataType).alias(c)
            for c in payload
        ],
    )
    both = tagged_l.unionByName(tagged_r)

    out_schema = StructType(
        [StructField(c, left_stream.schema[c].dataType) for c in payload]
        + [StructField(out_col, val_type)]
    )
    state_schema = StructType(
        [
            StructField("ts", ArrayType(LongType())),
            StructField("vals", ArrayType(val_type)),
        ]
    )

    def _resolve(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_hist, val_hist = state.get
            ts_hist = list(ts_hist)
            val_hist = list(val_hist)
        else:
            ts_hist, val_hist = [], []
        batches = [p for p in pdfs if len(p)]
        if batches:
            batch = pd.concat(batches, ignore_index=True)
            r = batch[batch["__side"] == 1]
            if len(r):
                ts_hist.extend(int(t) for t in r["__ms"])
                val_hist.extend(r["__val"].tolist())
                order = np.argsort(np.asarray(ts_hist, dtype=np.int64), kind="stable")
                ts_hist = [ts_hist[i] for i in order][-max_history:]
                val_hist = [val_hist[i] for i in order][-max_history:]
            state.update((ts_hist, val_hist))
            left = batch[batch["__side"] == 0]
            if len(left):
                ts_arr = np.asarray(ts_hist, dtype=np.int64)
                val_arr = np.asarray(val_hist, dtype=object)
                loc = (
                    np.searchsorted(
                        ts_arr, left["__ms"].to_numpy(dtype=np.int64), side="right"
                    )
                    - 1
                )
                vals = np.full(len(left), None, dtype=object)
                hit = loc >= 0
                vals[hit] = val_arr[loc[hit]]
                out = left[payload].copy()
                out[out_col] = vals
                yield out

    return both.groupBy("__k").applyInPandasWithState(
        _resolve, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
