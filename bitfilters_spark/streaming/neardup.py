"""Streaming NEAR-duplicate dedup: drop stream documents that
near-duplicate anything previously streamed.

``streaming_dedup_exact`` / ``streaming_dedup_bloom`` (streaming/dedup.py)
handle exact fingerprints in the state store; near-dup needs shingle
sets and band joins, which do not fit a per-key state row. Instead the
"state" here IS the persisted LSH index (operators/neardup_index.py):
every micro-batch

1. self-dedups in-batch (keep the min id of each verified near-dup
   pair — the same keep-first policy as the batch `dedup_near`),
2. probes the index for matches against everything streamed before
   (``probe_lsh_index`` — bucketed tables, index side never shuffles),
3. appends the survivors' band rows + shingle sets to the index
   (``append_to_lsh_index`` — cost ∝ batch) and writes the survivors
   to the output dataset.

Because state lives in bucketed tables on storage, it survives the
query, is readable mid-stream by the batch operators, and its size is
disk-bounded, not executor-memory-bounded — the same design choice as
``streaming_filter_build``'s persisted blob, which is why this is a
``foreachBatch`` writer too. Replay safety: a committed batch id is
recorded next to the index (atomic tmp+rename) and re-delivered batches
are skipped, so failure recovery cannot re-append or self-match.

CONTRACT: the marker is tied to the query's checkpoint lineage (batch
ids restart at 0 with a fresh checkpoint), so reset checkpoint, index,
output dataset, and marker TOGETHER — a fresh checkpoint against an
old index would silently skip every batch until the old high-water
batch id is passed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _marker_path(path: str) -> str:
    return os.path.join(path, "_last_batch")


def _read_marker(path: str) -> int:
    try:
        with open(_marker_path(path)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def _write_marker(path: str, batch_id: int) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = _marker_path(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, _marker_path(path))


def streaming_neardup_dedup(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    name: str,
    index_path: str,
    out_path: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
):
    """Returns a ``foreachBatch`` writer: survivors (stream docs that
    near-duplicate neither an earlier batch's survivor nor a smaller-id
    doc of their own batch) land in ``out_path`` (parquet, append) and
    become part of the index at ``index_path``. Start like any stream::

        q = streaming_neardup_dedup(docs, "doc_id", "text", "crawl",
                                    "/idx", "/clean") \\
            .option("checkpointLocation", ckpt).start()
    """
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.neardup_index import (
        append_to_lsh_index,
        build_lsh_index,
        probe_lsh_index,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_marker(index_path):
            return  # replayed, already folded in
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # several consumers
        # 1. in-batch self-dedup: drop the larger id of each verified pair
        pairs = minhash_lsh_pairs(
            batch_df, id_col, text_col, k, bands, shingle_n, threshold
        )
        losers = pairs.select(
            F.greatest("id_a", "id_b").alias(id_col)
        ).distinct()
        kept = batch_df.join(losers, id_col, "left_anti")
        # 2. drop matches against everything streamed before
        have_index = spark.catalog.tableExists(f"{name}_bands")
        if have_index:
            hits = probe_lsh_index(
                spark, kept, id_col, text_col, name, k, bands, shingle_n, threshold
            ).select(F.col("new_id").alias(id_col)).distinct()
            kept = kept.join(hits, id_col, "left_anti")
        kept = kept.localCheckpoint(eager=True)  # written AND appended below
        # 3. persist survivors; fold them into the index
        kept.write.mode("append").parquet(out_path)
        if have_index:
            append_to_lsh_index(kept, id_col, text_col, name, k, bands, shingle_n)
        else:
            build_lsh_index(
                kept, id_col, text_col, name, k, bands, shingle_n,
                path=index_path,
            )
        _write_marker(index_path, batch_id)

    return stream.writeStream.foreachBatch(fold).outputMode("update")
