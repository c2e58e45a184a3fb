"""Streaming embedding moments → PCA that is always up to date (#109).

`operators/similarity.embedding_moments` reduces a corpus to the
ADDITIVE sufficient statistic (n, Σx, ΣxxT); addition is exactly the
merge a stream needs, so the streaming fit is: each micro-batch computes
its own moment partial (same BLAS mapInPandas kernel — the batch never
leaves the executors) and folds it into a persisted state row. At any
moment `load_moments` + `pca_from_moments` yields the PCA of EVERYTHING
streamed so far — loadable mid-stream, by other sessions, with no
state-store coupling (the same contract as `streaming_filter_build`).

Exactly-once: state is written under ``state_path/batch=<id>/`` keyed by
the micro-batch id — a replayed batch overwrites its own directory with
identical content instead of double-adding (the crash-idempotency
pattern `streaming/neardup.py` established); `load_moments` reads the
HIGHEST batch id, which always holds the fold of every batch up to it.

``state_path`` is any Hadoop-FS URI (``s3a://``, ``hdfs://``, local) —
all I/O goes through `state_io` (driver-side, scheme-agnostic), and
readers skip a ``batch=`` directory whose npz is not yet written, so a
crash between mkdirs and the payload write falls back to the previous
committed batch instead of raising.
"""

from __future__ import annotations

import io

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import embedding_moments
from . import state_io


def _state_dirs(state_path: str) -> list[tuple[int, str]]:
    return state_io.batch_state_dirs(state_path, "moments.npz")


def _load_npz(path: str):
    return np.load(io.BytesIO(state_io.read_bytes(path)))


def load_moments(state_path: str):
    """(n, s, g) folded over every micro-batch so far, or None."""
    dirs = _state_dirs(state_path)
    if not dirs:
        return None
    blob = _load_npz(state_io.join(dirs[-1][1], "moments.npz"))
    return int(blob["n"]), blob["s"], blob["g"]


def streaming_embedding_moments(
    stream: DataFrame, vec_col: str, state_path: str
):
    """Returns a ``foreachBatch`` writer folding each micro-batch's
    moment partial into ``state_path``. Start like any stream::

        q = streaming_embedding_moments(emb_stream, "embedding", state) \\
            .option("checkpointLocation", ckpt).start()

    Empty micro-batches are no-ops. Fold with `fold_moments_batch` when
    driving batches by hand (tests, backfills)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_moments_batch(batch_df, vec_col, state_path, batch_id)

    return stream.writeStream.outputMode("update").foreachBatch(fold)


def fold_moments_batch(
    batch_df: DataFrame, vec_col: str, state_path: str, batch_id: int
) -> None:
    """One fold step, idempotent per ``batch_id``: recomputing a batch
    after a crash rewrites the same ``batch=<id>`` directory with the
    same content (prior state + this batch), never double-adds."""
    if batch_df.isEmpty():
        return
    n_b, s_b, g_b = embedding_moments(batch_df, vec_col)
    prior = None
    for bid, path in reversed(_state_dirs(state_path)):
        if bid < batch_id:  # fold onto the state BEFORE this batch only
            blob = _load_npz(state_io.join(path, "moments.npz"))
            prior = (int(blob["n"]), blob["s"], blob["g"])
            break
    if prior is not None:
        n_b, s_b, g_b = n_b + prior[0], s_b + prior[1], g_b + prior[2]
    buf = io.BytesIO()
    np.savez(buf, n=n_b, s=s_b, g=g_b)
    state_io.write_bytes(
        state_io.join(state_path, f"batch={batch_id}", "moments.npz"),
        buf.getvalue(),
    )


def streaming_pca(spark: SparkSession, state_path: str, k: int, center: bool = True):
    """The current PCA over everything streamed so far (None if no data
    yet) — call mid-stream from any session."""
    from ..operators.similarity import pca_from_moments

    got = load_moments(state_path)
    if got is None:
        return None
    n, s, g = got
    return pca_from_moments(n, s, g, k, center)
