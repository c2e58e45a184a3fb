"""Token-budget shard packing: assign ordered documents to training
shards of ~``shard_weight`` tokens each.

A training-data pipeline's last step is writing shards ("this shard holds
docs until ~100M tokens"). Sequential greedy packing is a prefix sum:
``shard(doc) = exclusive_prefix_tokens(doc) // shard_weight`` over a total
document order. A single ORDER BY window would compute it in one
partition — a non-starter at corpus scale — so this is the classic
TWO-PHASE DISTRIBUTED PREFIX SUM:

1. range-repartition by the order key and sort within partitions (the
   shuffle a global sort pays anyway — but nothing ever coalesces to one
   task);
2. one pass computes per-partition totals (P rows to the driver, one per
   partition — metadata-scale);
3. a second pass over the SAME cached partitioning adds each partition's
   driver-computed offset to its local running sum.

The partitioned projection is cached between the two passes because
``repartitionByRange`` samples boundaries — two independent executions
could split differently and misalign the offsets. The cache holds
(id, weight) pairs only — 16 bytes/row.

Result is EXACTLY the sequential greedy assignment, so a SQL window
(``SUM() OVER (ORDER BY id ROWS UNBOUNDED PRECEDING ... 1 PRECEDING)``)
is a bit-exact oracle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    shard_weight: int,
    n_partitions: int | None = None,
    order_cols: list | None = None,
) -> DataFrame:
    """(id, weight, prefix_weight, shard) — ``prefix_weight`` is the sum of
    weights of all ids strictly before this one (in ``id_col`` order) and
    ``shard = prefix_weight // shard_weight``. NULL weights count as 0.

    ``order_cols`` prepends sort keys to the packing order — docs pack
    in ``(order_cols..., id)`` order instead of bare id order, which is
    the in-context-pretraining trick (Shi et al. 2023: packing RELATED
    documents into the same context window beats random order): pass a
    cluster/topic/domain column (e.g. `cluster_near_duplicates` ids or
    an IVF cell) and same-cluster docs land adjacent, so shard
    boundaries cut between clusters far more often than through them.
    Same two-phase distributed prefix sum — the range partitioner just
    ranges over the richer key."""
    if shard_weight <= 0:
        raise ValueError("shard_weight must be positive")
    spark = df.sparkSession
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    ocols = list(order_cols or [])
    w = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(ocols)],
        F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias("w"),
    )
    # localCheckpoint (eager), NOT cache: the driver offsets computed below
    # are only valid for THIS materialization's range boundaries. A cached
    # plan can be evicted (clearCache by a consumer, block loss) and
    # recomputed with drifted boundaries — silently wrong shard
    # assignments; a checkpoint truncates lineage so recompute is
    # impossible, and there is no per-call unpersist leak.
    sort_keys = [F.col(f"__o{i}") for i in range(len(ocols))] + [F.col("id")]
    parts = (
        w.repartitionByRange(n_partitions, *sort_keys)
        .sortWithinPartitions(*sort_keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = {
        r["__pid"]: r["t"]
        for r in parts.groupBy("__pid").agg(F.sum("w").alias("t")).collect()
    }
    max_pid = max(totals, default=-1)
    offsets = {}
    running = 0
    for pid in range(max_pid + 1):
        offsets[pid] = running
        running += totals.get(pid, 0)

    out_schema = StructType(
        [
            StructField("id", parts.schema["id"].dataType),
            StructField("w", LongType()),
            StructField("prefix_weight", LongType()),
            StructField("shard", LongType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = None
        for pdf in batches:
            if not len(pdf):
                continue
            if local is None:
                local = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            ws = pdf["w"].to_numpy()
            prefix = local + ws.cumsum() - ws  # exclusive prefix
            local += int(ws.sum())
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "w": ws,
                    "prefix_weight": prefix,
                    "shard": prefix // shard_weight,
                }
            )

    return (
        parts.mapInPandas(assign, schema=out_schema)
        .select(
            F.col("id").alias(id_col),
            F.col("w").alias(weight_col),
            "prefix_weight",
            "shard",
        )
    )


def packing_report(
    packed: DataFrame,
    shard_col: str = "shard",
    weight_col: str | None = None,
    shard_weight: int | None = None,
) -> DataFrame:
    """One-row audit of a packing run — the numbers a training-ops
    review asks for before shards ship:

    - ``n_shards`` / ``n_docs`` / ``total_weight``;
    - ``min_fill`` / ``max_fill`` / ``mean_fill`` — per-shard weight
      sums (the `pack_shards` boundary rule lets a shard overrun by at
      most one document, so max_fill bounds the realized context
      overflow);
    - with ``shard_weight``: ``fill_rate`` = total_weight /
      (n_shards · shard_weight) — padding waste is ``1 − fill_rate``
      of every training step's FLOPs, the metric that justifies
      best-fit or cluster-aware packing over naive order.

    Works on any (shard, weight) table — `pack_shards`,
    `pack_sequences`' output exploded, or an external manifest. Two
    small aggregations (per-shard, then one row); integer outputs
    where the inputs are integers.

    ``weight_col`` defaults by schema inspection: ``pack_shards``
    names its weight column after the CALLER's ``weight_col`` (e.g.
    ``n_tokens``), so when the argument is omitted this resolves
    ``'w'`` if present, else raises a ValueError naming the available
    columns — a loud early error instead of a mid-plan
    AnalysisException."""
    wcol = weight_col or "w"
    if wcol not in packed.columns:
        raise ValueError(
            f"packing_report: weight column {wcol!r} not in input "
            f"columns {packed.columns}; pass weight_col= (pack_shards "
            "names it after the weight_col you packed with)"
        )
    per = packed.groupBy(shard_col).agg(
        F.sum(F.col(wcol).cast("long")).alias("__w"),
        F.count(F.lit(1)).alias("__n"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_shards"),
        F.sum("__n").cast("long").alias("n_docs"),
        F.sum("__w").cast("long").alias("total_weight"),
        F.min("__w").cast("long").alias("min_fill"),
        F.max("__w").cast("long").alias("max_fill"),
        F.avg("__w").alias("mean_fill"),
    )
    if shard_weight is None:
        return agg
    if shard_weight <= 0:
        raise ValueError("shard_weight must be positive")
    return agg.withColumn(
        "fill_rate",
        F.col("total_weight").cast("double")
        / (F.col("n_shards").cast("double") * F.lit(float(shard_weight))),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    capacity: int,
) -> DataFrame:
    """Training example packing: combine variable-length documents into
    fixed-``capacity`` token sequences (the T5/GPT "pack short examples
    together so no context window is wasted on padding" step; pair with
    ``chunk_documents`` (operators/text.py) upstream so no row exceeds
    the capacity — an oversize row raises).

    Returns ``(id, weight, seq, offset)``: per-sequence weights sum to
    <= capacity and ``offset`` is the row's start position inside its
    sequence.

    Spark realization: packing has no cross-partition semantics (any
    bin cover works; FILL FACTOR is the objective), so each partition
    packs independently with BEST-FIT-DECREASING over (weight desc, id)
    — embarrassingly parallel, ZERO shuffle, and only (id, weight) pairs
    are held (16 B/row; the text never moves). Best-fit keeps the open
    bins in a remaining-capacity-sorted list probed by bisect (O(log B)
    search per row — a first-fit index scan would be O(B) per row, and
    B = partition_tokens/capacity is huge at corpus scale). Any-fit
    algorithms share the classical guarantee that makes waste testable:
    no two bins can end <= half full (the later bin's rows would have
    fit in the earlier), so per partition at most ONE sequence is under
    half capacity. Sequence ids are globally unique via
    (partition_id << 40) | local index — deterministic for a fixed
    partitioning of ids."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    proj = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias("w"),
        F.spark_partition_id().alias("__pid"),
    )
    out_schema = StructType(
        [
            StructField("id", proj.schema["id"].dataType),
            StructField("w", LongType()),
            StructField("seq", LongType()),
            StructField("offset", LongType()),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        pid = int(pdf["__pid"].iloc[0])
        too_big = pdf["w"] > capacity
        if too_big.any():
            bad = pdf.loc[too_big].iloc[0]
            raise ValueError(
                f"row {bad['id']!r} has weight {int(bad['w'])} > capacity "
                f"{capacity}; chunk oversize documents first "
                "(operators/text.py chunk_documents)"
            )
        pdf = pdf.sort_values(["w", "id"], ascending=[False, True])
        import bisect

        rems: list = []  # open-bin remaining capacities, ascending
        rem_bins: list = []  # bin index aligned with rems
        fills: list = []  # fill level per bin index
        seqs = []
        offs = []
        for w in pdf["w"].to_numpy():
            w = int(w)
            # best-fit: tightest bin with room (leftmost rem >= w)
            i = bisect.bisect_left(rems, w)
            if i < len(rems):
                rem, b = rems.pop(i), rem_bins.pop(i)
                seqs.append(b)
                offs.append(fills[b])
                fills[b] += w
                nr = rem - w
                j = bisect.bisect_left(rems, nr)
                rems.insert(j, nr)
                rem_bins.insert(j, b)
            else:
                b = len(fills)
                seqs.append(b)
                offs.append(0)
                fills.append(w)
                nr = capacity - w
                j = bisect.bisect_left(rems, nr)
                rems.insert(j, nr)
                rem_bins.insert(j, b)
        base = pid << 40
        yield pd.DataFrame(
            {
                "id": pdf["id"],
                "w": pdf["w"],
                "seq": [base | s for s in seqs],
                "offset": offs,
            }
        )

    return proj.mapInPandas(pack, schema=out_schema).select(
        F.col("id").alias(id_col),
        F.col("w").alias(weight_col),
        "seq",
        "offset",
    )


def write_training_shards(
    assigned: DataFrame,
    payload: DataFrame,
    id_col: str,
    path: str,
    weight_col: str = "n_tokens",
    shard_col: str = "shard",
) -> dict:
    """Materialize a shard assignment (the output of :func:`pack_shards`)
    as on-disk training shards plus a manifest.

    Joins the (metadata-scale) assignment back to the payload rows,
    writes ``path/shard=N/`` via ``partitionBy`` — each shard's rows land
    in their own directory, written sort-ordered within the shard so
    readers stream documents in packing order — and returns the manifest
    ``{shard: {"n_rows": int, "weight": int}}`` from one aggregate over
    the assignment (never the payload). The join shuffles on the id;
    pre-bucketed payload tables (``write_bucketed``) skip their side."""
    a = assigned.select(id_col, shard_col, "prefix_weight")
    joined = payload.join(a, id_col)
    (
        joined.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, "prefix_weight")
        .drop("prefix_weight")
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )
    manifest = {
        int(r[shard_col]): {"n_rows": int(r["n"]), "weight": int(r["wt"])}
        for r in assigned.groupBy(shard_col)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(weight_col).alias("wt"))
        .collect()
    }
    return manifest


def assign_row_ids(
    df: DataFrame,
    order_col: str,
    id_name: str = "row_id",
    n_partitions: int | None = None,
    check_unique: bool = True,
) -> DataFrame:
    """Contiguous ``0..N-1`` ids in ``order_col`` order — the DataFrame
    answer to RDD ``zipWithIndex`` (which Spark's DataFrame API lacks;
    ``monotonically_increasing_id`` leaves gaps and tracks partition
    layout, not a data order). Exactly :func:`pack_shards`' two-phase
    distributed prefix machinery with weight 1: the exclusive prefix
    COUNT is the row id, no single-partition window anywhere.

    ``order_col`` values MUST be unique — ids are joined back on it, so
    a duplicate key would silently multiply rows and hand out duplicate
    ids. ``check_unique`` (default on) fails fast instead: one
    lightweight job over the already-checkpointed (key, id) frame; pass
    ``check_unique=False`` only when uniqueness is guaranteed upstream
    (e.g. the key is itself a generated id)."""
    assigned = pack_shards(
        df.select(F.col(order_col).alias("__k")).withColumn("__one", F.lit(1)),
        "__k",
        "__one",
        shard_weight=1 << 62,
        n_partitions=n_partitions,
    ).select(F.col("__k").alias(order_col), F.col("prefix_weight").alias(id_name))
    if check_unique:
        dup = (
            assigned.groupBy(order_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"assign_row_ids: order_col {order_col!r} is not unique "
                f"(e.g. {dup[0][order_col]!r} appears {dup[0]['__n']} times); "
                f"row ids would be duplicated and rows multiplied"
            )
    return df.join(assigned, order_col)


def materialize_sequences(
    assignment: DataFrame,
    encoded: DataFrame,
    id_col: str,
    token_col: str = "token_ids",
    eos_id: int | None = None,
    pad_to: int | None = None,
    pad_id: int = 0,
) -> DataFrame:
    """The last dataloader step: turn :func:`pack_sequences`' assignment
    (id_col, weight, seq, offset — pack_sequences output as-is) plus per-document token arrays (e.g.
    `encode_documents` output) into the ACTUAL packed training rows —
    (seq, token_ids, n_docs, n_tokens), documents concatenated in
    offset order, ``eos_id`` appended after each document when given
    (the separator convention; budget for it in the packing weights),
    ``pad_to`` right-padding with ``pad_id`` for fixed-shape tensors.

    Plan: ONE join of the (id, seq, offset) assignment — 24 B/row —
    against the token arrays, then the per-seq ordered regroup
    (``array_sort(collect_list(struct(offset, tokens)))`` + flatten),
    the same single-shuffle shape as `encode_documents`. Token arrays
    move exactly once; nothing is ever collected."""
    toks = encoded.select(F.col(id_col).alias("id"), F.col(token_col).alias("__t"))
    if eos_id is not None:
        toks = toks.withColumn(
            "__t", F.concat("__t", F.array(F.lit(int(eos_id)).cast("long")))
        )
    joined = assignment.select(
        F.col(id_col).alias("id"), "seq", "offset"
    ).join(toks, "id")
    out = (
        joined.groupBy("seq")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("offset"), F.col("__t")))
                    ),
                    lambda s: s["__t"],
                )
            ).alias(token_col),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn("n_tokens", F.size(token_col))
    )
    if pad_to is not None:
        pad = F.array_repeat(
            F.lit(int(pad_id)).cast("long"),
            F.greatest(F.lit(pad_to) - F.col("n_tokens"), F.lit(0)),
        )
        out = out.withColumn(token_col, F.concat(F.col(token_col), pad))
    return out.select("seq", token_col, "n_docs", "n_tokens")


def materialize_masked_sequences(
    assignment: DataFrame,
    encoded: DataFrame,
    id_col: str,
    token_col: str = "token_ids",
    spans_col: str = "spans",
    eos_id: int | None = None,
    pad_to: int | None = None,
    pad_id: int = 0,
) -> DataFrame:
    """:func:`materialize_sequences` with LOSS-MASK propagation — the
    packing step for SFT data (`chat.assistant_token_spans`): each
    document carries per-doc token spans marking the positions a
    trainer keeps loss on; packing shifts every span by the document's
    ``offset`` inside its sequence, and the output row carries both the
    packed ``token_ids`` and an aligned 0/1 ``loss_mask`` (padding and
    ``eos_id`` separators are 0 — the separator is template, not
    assistant output; a chatml span already covers its own merged
    ``<|im_end|>``, see operators/chat.py).

    Same single-shuffle plan as :func:`materialize_sequences` (spans
    ride the one join + per-seq regroup); the mask expands from the
    shifted spans with one JVM ``transform(sequence(...))`` per row —
    O(capacity · n_spans) comparisons, both small by construction."""
    toks = encoded.select(
        F.col(id_col).alias("id"),
        F.col(token_col).alias("__t"),
        F.coalesce(
            F.col(spans_col),
            F.array().cast("array<struct<start:int,end:int>>"),
        ).alias("__s"),
    )
    if eos_id is not None:
        toks = toks.withColumn(
            "__t", F.concat("__t", F.array(F.lit(int(eos_id)).cast("long")))
        )
    joined = assignment.select(
        F.col(id_col).alias("id"), "seq", "offset"
    ).join(toks, "id")
    shifted = F.transform(
        F.col("__s"),
        lambda sp: F.struct(
            (sp["start"] + F.col("offset")).cast("long").alias("start"),
            (sp["end"] + F.col("offset")).cast("long").alias("end"),
        ),
    )
    out = (
        joined.withColumn("__sh", shifted)
        .groupBy("seq")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("offset"), F.col("__t")))
                    ),
                    lambda s: s["__t"],
                )
            ).alias(token_col),
            F.array_sort(F.flatten(F.collect_list("__sh"))).alias("__spans"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn("n_tokens", F.size(token_col))
    )
    if pad_to is not None:
        pad = F.array_repeat(
            F.lit(int(pad_id)).cast("long"),
            F.greatest(F.lit(pad_to) - F.col("n_tokens"), F.lit(0)),
        )
        out = out.withColumn(token_col, F.concat(F.col(token_col), pad))
    # guard the empty row: sequence(0, -1) DESCENDS (yielding [0, -1] —
    # a 2-element mask against 0 tokens); an empty sequence gets an
    # empty mask instead
    mask = F.when(
        F.size(token_col) == 0, F.array().cast("array<int>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(token_col) - 1),
            lambda i: F.when(
                F.exists(
                    F.col("__spans"),
                    lambda sp: (i >= sp["start"]) & (i < sp["end"]),
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
    )
    return out.select(
        "seq",
        token_col,
        mask.alias("loss_mask"),
        "n_docs",
        "n_tokens",
    )


def export_hf_layout(
    assigned: DataFrame,
    payload: DataFrame,
    id_col: str,
    path: str,
    split: str = "train",
    weight_col: str = "n_tokens",
    shard_col: str = "shard",
) -> dict:
    """Materialize a shard assignment as the FLAT deterministic layout
    the HF-datasets/webdataset ecosystem reads:
    ``path/<split>-00000-of-000NN.parquet`` ... plus one
    ``<split>_manifest.json`` — the publishable form of
    :func:`write_training_shards`' ``shard=N/`` directories (loaders
    that glob `train-*-of-*.parquet` neither understand Hive
    partitioning nor tolerate nondeterministic part names; shard N must
    be the SAME bytes on every rebuild for cache keys to hold).

    Write path: the payload joins its (metadata-scale) assignment,
    repartitions BY the shard column (all of a shard's rows land in one
    task ⇒ exactly one file per shard directory — asserted, not
    assumed), stages under ``path/__stage`` via ``partitionBy``, then
    the driver renames each shard's single part-file to its
    ``<split>-{i:05d}-of-{total:05d}.parquet`` name through the Hadoop
    FileSystem API (`streaming.state_io` — works on file:/hdfs:/s3a:
    alike) in shard order and drops the staging dir. Rows inside a
    shard are sorted by packing order (``prefix_weight``), so shard
    bytes are a pure function of the assignment. Returns the manifest
    dict (also written as JSON): per-shard file name, rows, weight."""
    import json as _json

    from ..streaming import state_io

    spark = payload.sparkSession
    stage = state_io.join(path, "__stage")
    a = assigned.select(id_col, shard_col, "prefix_weight")
    (
        # id_col as the final sort key: prefix_weight ties (zero/NULL
        # weight docs) would otherwise leave shuffle-order rows in the
        # file — nondeterministic bytes, the exact thing this exists
        # to prevent (r13 review)
        payload.join(a, id_col)
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, "prefix_weight", id_col)
        .drop("prefix_weight")
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(stage)
    )
    # stats over assigned ids that the payload ACTUALLY has (left_semi
    # mirrors the write's inner join): a manifest computed from the
    # bare assignment would overstate shard contents whenever the
    # payload lost ids after packing (r13 review)
    stats = {
        int(r[shard_col]): (int(r["n"]), int(r["wt"]))
        for r in assigned.join(
            payload.select(id_col), id_col, "left_semi"
        )
        .groupBy(shard_col)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(weight_col).alias("wt"))
        .collect()
    }
    shards = sorted(stats)
    total = len(shards)
    # Crash-safe publish order (r14, closes the r13 delete-before-rename
    # window): (1) rename every NEW file into place FIRST — names can
    # only collide with a prior export when its total equals ours, and
    # then only that one destination is deleted immediately before its
    # atomic per-file rename; (2) write the manifest only after ALL
    # renames — it is the commit point, so a crash mid-renames leaves
    # the OLD manifest naming files that all still exist; (3) sweep
    # stale old-total files LAST, when the new manifest already
    # describes a complete export. At no point does a manifest on disk
    # reference a deleted file set.
    manifest = {"split": split, "n_shards": total, "shards": {}}
    for i, s in enumerate(shards):
        sdir = state_io.join(stage, f"{shard_col}={s}")
        parts = [
            n
            for n in state_io.list_names(sdir, spark)
            if n.startswith("part-") and n.endswith(".parquet")
        ]
        if len(parts) != 1:
            raise RuntimeError(
                f"export_hf_layout: shard {s} staged {len(parts)} part "
                "files (expected exactly 1 — the repartition-by-shard "
                "write guarantees it; was the staging dir modified?)"
            )
        fname = f"{split}-{i:05d}-of-{total:05d}.parquet"
        dest = state_io.join(path, fname)
        if state_io.exists(dest, spark):
            # Hadoop rename refuses existing destinations; the delete
            # is scoped to this single colliding file, immediately
            # before its replacement lands
            state_io.delete(dest, spark)
        state_io.rename(state_io.join(sdir, parts[0]), dest, spark)
        manifest["shards"][fname] = {
            "shard": s,
            "n_rows": stats[s][0],
            "weight": stats[s][1],
        }
    state_io.write_bytes(
        state_io.join(path, f"{split}_manifest.json"),
        _json.dumps(manifest, indent=1, sort_keys=True).encode(),
        spark,
    )
    # sweep stale files from a prior export with a DIFFERENT shard
    # count (same-count names were replaced in place above); the new
    # manifest is already the committed source of truth
    for n in state_io.list_names(path, spark):
        if (
            n.startswith(f"{split}-")
            and n.endswith(".parquet")
            and "-of-" in n
            and n not in manifest["shards"]
        ):
            state_io.delete(state_io.join(path, n), spark)
    state_io.delete(stage, spark)
    return manifest
