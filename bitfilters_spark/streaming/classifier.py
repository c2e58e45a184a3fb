"""Streaming classifier training (#111): mini-batch SGD over a document
stream, one persisted weight state the batch scorer can read mid-stream.

Each micro-batch takes ``steps_per_batch`` full-gradient steps ON THAT
BATCH (classic mini-batch SGD — the stream provides the batching), using
the SAME distributed gradient machinery as the batch trainer: features
explode/aggregate JVM-side, the driver sees only model-scale gradient
rows. Weight state is batch-id-keyed (``state_path/batch=<id>/``) like
`streaming/pca.py`: a replayed batch re-derives FROM THE PRIOR state and
overwrites its own directory — crash redelivery can never double-step.

At any moment `load_streaming_classifier` yields a model dict usable by
`classifier_score` / `classifier_filter` from any session — the "score
today's crawl with the model as of now" loop with no retraining job.
"""

from __future__ import annotations

import io

import numpy as np
from pyspark.sql import DataFrame

from ..operators.classifier import _margins, _weight_df, hashed_features
from . import state_io


def _state_dirs(state_path: str) -> list[tuple[int, str]]:
    # batch= dirs whose weights.npz exists (crash between mkdirs and the
    # payload write leaves an empty dir readers must not trip on);
    # state_path is any Hadoop-FS URI — see streaming/state_io.py
    return state_io.batch_state_dirs(state_path, "weights.npz")


def _load_npz(path: str):
    return np.load(io.BytesIO(state_io.read_bytes(path)))


def load_streaming_classifier(state_path: str) -> dict | None:
    dirs = _state_dirs(state_path)
    if not dirs:
        return None
    blob = _load_npz(state_io.join(dirs[-1][1], "weights.npz"))
    return {
        "weights": blob["w"],
        "bias": float(blob["bias"]),
        "n_buckets": int(blob["n_buckets"]),
        "losses": list(blob["losses"]),
    }


def fold_classifier_batch(
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    state_path: str,
    batch_id: int,
    n_buckets: int = 1 << 17,
    steps_per_batch: int = 1,
    lr: float = 2.0,
    l2: float = 0.0,
) -> None:
    """One idempotent fold: start from the state BEFORE ``batch_id``,
    take ``steps_per_batch`` gradient steps on this batch, write
    ``batch=<id>``."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    prior = None
    for bid, path in reversed(_state_dirs(state_path)):
        if bid < batch_id:
            blob = _load_npz(state_io.join(path, "weights.npz"))
            prior = (blob["w"].copy(), float(blob["bias"]), list(blob["losses"]))
            break
    if prior is None:
        w, bias, losses = np.zeros(n_buckets, dtype="float64"), 0.0, []
    else:
        w, bias, losses = prior
        if w.shape[0] != n_buckets:
            raise ValueError(
                f"state has n_buckets={w.shape[0]}, fold called with {n_buckets}"
            )

    from pyspark.sql import functions as F

    labels = batch_df.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    )
    labels = labels.persist()
    feats = hashed_features(batch_df, id_col, text_col, n_buckets).persist()
    n = float(labels.count())
    for _ in range(steps_per_batch):
        m = _margins(feats, labels, _weight_df(spark, w), bias)
        errs = m.select(
            "id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))) - F.col("y"))
            .alias("err"),
            (
                F.greatest(F.col("margin"), F.lit(0.0))
                + F.log1p(F.exp(-F.abs(F.col("margin"))))
                - F.col("y") * F.col("margin")
            ).alias("ll"),
        ).persist()
        grad_rows = (
            errs.join(feats.select("id", "bucket", "cnt"), "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("err") * F.col("cnt")).alias("g"),
                 F.lit(0.0).alias("ll"))
            .unionByName(
                errs.select(
                    F.lit(-1).cast("long").alias("bucket"),
                    F.col("err").alias("g"),
                    F.col("ll"),
                ).groupBy("bucket").agg(
                    F.sum("g").alias("g"), F.sum("ll").alias("ll")
                )
            )
            .collect()
        )
        errs.unpersist()
        g = np.zeros(n_buckets, dtype="float64")
        be = ll = 0.0
        for r in grad_rows:
            if r["bucket"] < 0:
                be, ll = float(r["g"]), float(r["ll"])
            else:
                g[int(r["bucket"])] = float(r["g"])
        w -= lr * (g / n + l2 * w)
        bias -= lr * be / n
        losses.append(ll / n)
    feats.unpersist()
    labels.unpersist()

    buf = io.BytesIO()
    np.savez(
        buf,
        w=w,
        bias=bias,
        n_buckets=n_buckets,
        losses=np.asarray(losses, dtype="float64"),
    )
    state_io.write_bytes(
        state_io.join(state_path, f"batch={batch_id}", "weights.npz"),
        buf.getvalue(),
    )


def streaming_classifier_train(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    state_path: str,
    n_buckets: int = 1 << 17,
    steps_per_batch: int = 1,
    lr: float = 2.0,
    l2: float = 0.0,
):
    """Returns a ``foreachBatch`` writer running mini-batch SGD over the
    labeled stream. Start like any stream; read the live model with
    `load_streaming_classifier` + `classifier_score`."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_classifier_batch(
            batch_df, id_col, text_col, label_col, state_path, batch_id,
            n_buckets, steps_per_batch, lr, l2,
        )

    return stream.writeStream.outputMode("update").foreachBatch(fold)
