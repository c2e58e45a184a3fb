"""Maintain a corpus-wide membership filter from a STREAM.

The batch engine builds filters with a two-phase mergeable aggregate;
the same algebra makes the filter maintainable incrementally: each
micro-batch builds a partial filter and MERGES it into a persisted blob
(``merge(build(A), build(B)) == build(A ∪ B)``, byte-exact — the tested
family invariant). The stored blob is at all times a valid filter over
every key ever streamed, loadable by the batch probe / ``antijoin_filter``
path — the bridge from streaming ingest to batch decontamination
("drop new docs whose fingerprint was ever seen in the firehose").

State lives in ONE blob file (bloom: fixed bytes forever; quotient/KMV:
bounded by their k / fingerprint capacity), not in the state store —
foreachBatch is the right tool because the result must outlive the query
and be readable by other engines/sessions mid-stream. Exactly-once:
micro-batch recomputation after failure re-merges the same keys, and
mergeable-filter insertion is idempotent (OR/union), so replays are
harmless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.filters import MERGEABLE, _merge_blobs, build_filter
from . import state_io


def load_filter_blob(path: str) -> bytes | None:
    """The blob at any Hadoop-FS URI (s3a/hdfs/local), or None — all
    state I/O is scheme-agnostic, see streaming/state_io.py."""
    return state_io.read_bytes(path)


def streaming_filter_build(
    stream: DataFrame,
    hash_col: str,
    store_path: str,
    kind: str = "bloom",
    **filter_kw,
):
    """Returns a ``foreachBatch`` writer over ``stream``: every
    micro-batch folds its keys into the blob at ``store_path`` (written
    atomically: tmp + rename). Start it like any stream::

        q = streaming_filter_build(keyed, "h", "/store/corpus.bloom",
                                   n=10**9, fpp=0.01) \\
            .option("checkpointLocation", ckpt).start()

    Mergeable kinds only (bloom / duckdb_bloom / quotient / cms / kmv).
    """
    if kind not in MERGEABLE:
        raise ValueError(
            f"streaming build needs a mergeable kind, got {kind!r}"
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        rows = build_filter(batch_df, [], hash_col, kind, **filter_kw).collect()
        if not rows:
            return
        part = bytes(rows[0]["filter"])
        prev = load_filter_blob(store_path)
        blob = part if prev is None else _merge_blobs(kind, [prev, part])
        state_io.write_bytes(store_path, blob)

    return stream.writeStream.foreachBatch(fold).outputMode("update")


def streaming_indexed_sink(
    stream: "DataFrame",
    out_path: str,
    index_path: str,
    key_cols: list,
    kind: str = "bloom",
    **filter_kw,
):
    """Parquet sink that keeps a FILE-SKIPPING INDEX current as the
    stream lands: each micro-batch appends its rows to ``out_path``,
    then runs ``refresh_file_index`` — kept files keep their blobs
    byte-identical, ONLY the batch's new files are scanned — and
    atomically replaces the index at ``index_path``. The bridge from
    streaming ingest to indexed batch reads: a `skipping_read` /
    `prune_files_range` consumer probing mid-stream sees a complete
    index for every committed file.

    Same durability design as :func:`streaming_filter_build` (state on
    storage, foreachBatch). Replays re-append rows (duplicate FILES,
    never a corrupted index — the refresh indexes whatever files exist),
    so pair with upstream `streaming_dedup_exact` or a batch-id marker
    when the sink must be exactly-once; the index overwrite is Spark's
    parquet overwrite (not atomic rename), so an index reader racing the
    replacement should retry.
    """
    from ..sources.skipping import (
        build_file_index,
        load_index,
        refresh_file_index,
        save_index,
    )

    def fold(batch_df: "DataFrame", batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.write.mode("append").parquet(out_path)
        from pyspark.errors import AnalysisException

        try:
            old = load_index(spark, index_path)
        except AnalysisException:
            # first batch: no index yet — full build over what just landed
            idx = build_file_index(spark, out_path, key_cols, kind=kind, **filter_kw)
        else:
            idx = refresh_file_index(
                spark, out_path, old, key_cols, kind=kind, **filter_kw
            )
        save_index(idx, index_path)

    return stream.writeStream.foreachBatch(fold).outputMode("append")
