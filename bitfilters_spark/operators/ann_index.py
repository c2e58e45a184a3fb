"""Persisted IVF-routed ANN index (#132) — the embedding twin of the
persisted BM25 index (`bm25_index.py`) and LSH index (`neardup_index.py`):
``similarity.ivf_topk`` re-routes the WHOLE corpus through the coarse
quantizer on every call, which is the right shape for one-shot jobs but
wrong for the serve-many-query-batches pattern (ANN against a frozen
training corpus: contamination probes, SemDeDup candidate lookups,
nearest-neighbor audits). This module splits the cost:

* :func:`build_ann_index` — ONE corpus pass k-means-trains (or reuses)
  the coarse quantizer, routes every vector to its nearest centroid
  cell, and persists a CELL-BUCKETED table ``<name>_cells``
  (cell, id, vec — the vector stored L2-NORMALIZED in float64, so probe
  scoring replays `ivf_topk`'s arithmetic bit-for-bit) plus the
  ``<name>_centroids`` table (model-scale). Bucketing + in-bucket cell
  sort mean a probe's candidate cells live in known buckets, in sorted
  runs parquet min/max stats prune to. Builds land in STAGING tables and
  swap on success (the `bm25_index` atomicity contract: a failed rebuild
  leaves the previous index fully queryable).
* :func:`append_to_ann_index` — fold NEW vectors in at cost ∝ the new
  data: they route through the STORED centroids (no re-training — the
  quantizer is frozen, the standard IVF maintenance trade: cell balance
  can drift as the distribution does, rebuild to re-center) and append
  into the bucketed layout. Geometry (bucket count + centroid count) is
  stamped as table properties so a mismatched append fails loudly.
* :func:`ann_query_index` — top-k for a query batch: queries collect
  driver-side (small by contract, the `cosine_topk` convention), their
  ``nprobe`` nearest cells become a LITERAL In-filter pushed into the
  bucketed cells scan (non-candidate cells never leave parquet) plus a
  broadcast (query, cell) probe list; scoring is per-partition numpy,
  and the top-k window runs over candidates only. Probe cost ∝
  corpus × nprobe / n_centroids, never the full corpus — and the
  routing pass `ivf_topk` pays per call is already on disk.

Composition law (pytest, tests/test_similarity.py): at full probe
(``nprobe == n_centroids``) ``ann_query_index`` returns EXACTLY
``ivf_topk`` (itself exact vs brute force at full probe) — the persisted
normalized float64 vectors round-trip parquet losslessly and the scoring
expression order is identical, so the equality is bit-exact. Appending
half the corpus then probing equals a from-scratch rebuild over the
union (same frozen centroids ⇒ same cells ⇒ same candidates).

Single-writer contract (same as the LSH/BM25 indexes): appends are plain
bucketed-table appends with no transaction log; appended ids are assumed
NEW (re-appending an id duplicates its row and it can appear twice in a
top-k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..sources.io import write_bucketed
from .bm25_index import _check_name, _stage_path
from .similarity import ivf_centroids

_CELL_SCHEMA = StructType(
    [
        StructField("cell", LongType()),
        StructField("id", LongType()),
        StructField("vec", ArrayType(DoubleType())),
    ]
)


def _route(df: DataFrame, id_col: str, vec_col: str, C: np.ndarray) -> DataFrame:
    """(cell, id, vec) — vectors L2-normalized in float64 and assigned to
    their nearest centroid; one mapInPandas pass, centroids broadcast.
    EXACTLY `ivf_topk`'s assignment arithmetic, so persisted rows replay
    the in-session operator bit-for-bit."""
    bc = df.sparkSession.sparkContext.broadcast(np.asarray(C, dtype=np.float64))

    def assign(batches):
        C_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cells = np.argmax((mat / norms) @ C_.T, axis=1)
            yield pd.DataFrame(
                {"cell": cells, "id": ids, "vec": list(mat / norms)}
            )

    return df.select(id_col, vec_col).mapInPandas(assign, schema=_CELL_SCHEMA)


def _stamp(spark: SparkSession, table: str, num_buckets: int, n_centroids: int):
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('bitfilters.num_buckets'='{num_buckets}', "
        f"'bitfilters.n_centroids'='{n_centroids}')"
    )


def _stored_geometry(spark: SparkSession, name: str) -> dict:
    rows = spark.sql(f"SHOW TBLPROPERTIES {name}_cells").collect()
    props = {r["key"]: r["value"] for r in rows}
    return {
        k: int(props[f"bitfilters.{k}"])
        for k in ("num_buckets", "n_centroids")
        if f"bitfilters.{k}" in props
    }


def build_ann_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    name: str,
    n_centroids: int = 64,
    num_buckets: int = 16,
    path: str | None = None,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Build and persist the index; returns the trained centroid matrix
    (also persisted as ``<name>_centroids``). ``centroids`` reuses a
    pre-trained quantizer (`load_ivf_index` / a prior build) and skips
    the k-means pass. ``path`` makes the tables EXTERNAL, same contract
    as the BM25/LSH indexes."""
    _check_name(name)
    spark = df.sparkSession
    C = np.asarray(
        centroids
        if centroids is not None
        else ivf_centroids(df, vec_col, n_centroids, seed=seed),
        dtype=np.float64,
    )
    _write_staged(spark, name, _route(df, id_col, vec_col, C), C, num_buckets, path)
    return C


def _write_staged(
    spark: SparkSession,
    name: str,
    cells: DataFrame,
    C: np.ndarray,
    num_buckets: int,
    path: str | None,
) -> None:
    """Stage-and-swap both index tables (external data lands in
    per-rebuild ALTERNATING directories via `bm25_index._stage_path` —
    a rebuild staging into the live table's own directory would destroy
    the previous index mid-build). Shared by build and compact."""
    stage = f"{name}__stage"
    for suffix in ("cells", "centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {stage}_{suffix}")
    write_bucketed(
        cells,
        f"{stage}_cells",
        ["cell"],
        num_buckets=num_buckets,
        sort_cols=["cell"],
        path=_stage_path(spark, f"{name}_cells", path, f"{name}_cells"),
    )
    cw = spark.createDataFrame(
        [(int(i), [float(x) for x in C[i]]) for i in range(len(C))],
        "cell long, vec array<double>",
    ).write.mode("overwrite")
    if path:
        cw = cw.option(
            "path",
            _stage_path(spark, f"{name}_centroids", path, f"{name}_centroids"),
        )
    cw.saveAsTable(f"{stage}_centroids")
    _stamp(spark, f"{stage}_cells", num_buckets, len(C))
    # all staging writes succeeded — metadata-only swap
    for suffix in ("cells", "centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        spark.sql(f"ALTER TABLE {stage}_{suffix} RENAME TO {name}_{suffix}")


def compact_ann_index(
    spark: SparkSession, name: str, path: str | None = None
) -> dict:
    """Rewrite the cells table into one file-set per bucket: every
    ``append_to_ann_index`` call (and therefore every streaming
    maintenance micro-batch) adds a file-set per bucket forever; probe
    answers stay exact but probe PLANS degrade with file count. Rows,
    centroids, and geometry are unchanged, so probes are bit-identical
    before/after (per-row scoring — no order-sensitive float sums).
    Same staging-swap atomicity as a build: a crash mid-compact leaves
    the live index untouched. Returns postings file counts
    ``{"files_before": n, "files_after": n}``."""
    _check_name(name)
    _refresh(spark, name)
    geom = _stored_geometry(spark, name)
    num_buckets = geom["num_buckets"]

    def _nfiles():
        return (
            spark.table(f"{name}_cells")
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    files_before = _nfiles()
    C = load_ann_centroids(spark, name)
    # one-bucket-per-task repartition => exactly one file per bucket;
    # read the FILES so the bucketed read's advertised partitioning
    # cannot elide the repartition (see compact_bm25_index)
    from .bm25_index import _live_location

    loc = _live_location(spark, f"{name}_cells")
    cells_src = spark.read.parquet(loc) if loc else spark.table(f"{name}_cells")
    cells = cells_src.repartition(num_buckets, F.col("cell"))
    _write_staged(spark, name, cells, C, num_buckets, path)
    return {"files_before": files_before, "files_after": _nfiles()}


def _refresh(spark: SparkSession, name: str) -> None:
    """Metadata-only refresh (the `bm25_index._refresh` rationale):
    appends from another session — streaming maintenance's foreachBatch
    clone — are on disk, but this session may hold a stale cached file
    listing for the tables."""
    for suffix in ("cells", "centroids"):
        spark.catalog.refreshTable(f"{name}_{suffix}")


def load_ann_centroids(spark: SparkSession, name: str) -> np.ndarray:
    rows = sorted(
        spark.table(f"{_check_name(name)}_centroids").collect(),
        key=lambda r: r["cell"],
    )
    return np.array([r["vec"] for r in rows], dtype=np.float64)


def append_to_ann_index(
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
    name: str,
    num_buckets: int = 16,
) -> None:
    """Fold NEW vectors into the index at cost ∝ the new data: route
    through the STORED centroids (the quantizer stays frozen — identical
    cells to a rebuild with the same centroids, so append-then-probe ≡
    rebuild-then-probe, tested), append into the bucketed layout."""
    _check_name(name)
    spark = new_df.sparkSession
    geom = _stored_geometry(spark, name)
    if geom.get("num_buckets") is not None and geom["num_buckets"] != num_buckets:
        raise ValueError(
            f"ANN index '{name}' was built with num_buckets="
            f"{geom['num_buckets']}, called with {num_buckets}; appended "
            "rows would land in the wrong buckets."
        )
    C = load_ann_centroids(spark, name)
    _route(new_df, id_col, vec_col, C).write.mode("append").format(
        "parquet"
    ).bucketBy(num_buckets, "cell").sortBy("cell").saveAsTable(f"{name}_cells")


class AnnProbe:
    """Session-cached probe handle (the :class:`bm25_index.BM25Probe`
    pattern): ``ann_query_index`` re-reads the centroids table and
    refreshes the catalog on EVERY call — right for occasional probes,
    waste in a probe-per-batch loop. The handle pins the centroid matrix
    at construction; appends route through frozen centroids anyway, so a
    stale handle only misses rows appended after construction (call
    :meth:`refresh` or build a new handle to see them)."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = _check_name(name)
        self.refresh()

    def refresh(self) -> "AnnProbe":
        _refresh(self.spark, self.name)
        self.C = load_ann_centroids(self.spark, self.name)
        return self

    def query(
        self,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
        nprobe: int = 8,
        max_queries: int = 100_000,
    ) -> DataFrame:
        """(query_id, rank, neighbor_id) — identical rows to ``ivf_topk``
        on the indexed corpus with the same centroids and nprobe. The
        candidate cell list is BOTH a literal In-filter on the bucketed
        cells scan (parquet prunes non-candidate cells) and a broadcast
        (query, cell) probe join; the only wide op is the final
        per-query top-k window over candidates."""
        spark, C = self.spark, self.C
        # queries are driver-collected by contract (the cosine_topk
        # convention); max_queries turns a corpus-sized "query" set into
        # an error instead of a silent driver OOM
        qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
        if len(qrows) > max_queries:
            raise ValueError(
                f"ann_query_index collected more than max_queries="
                f"{max_queries} query rows; batch the query set, or raise "
                "max_queries consciously."
            )
        empty = spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long"
        )
        if not qrows:  # 0-row query batches must not crash (repo convention)
            return empty
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        qmat = np.array([r[1] for r in qrows], dtype=np.float64)
        qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(qmat @ C.T), axis=1)[:, : min(nprobe, len(C))]
        probe_pairs = [
            (int(qids[i]), int(c)) for i in range(len(qids)) for c in order[i]
        ]
        cand_cells = sorted({c for _, c in probe_pairs})
        probes = spark.createDataFrame(probe_pairs, "query_id long, cell long")
        qbc = spark.sparkContext.broadcast(
            {int(qids[i]): qmat[i] for i in range(len(qids))}
        )
        cells = spark.table(f"{self.name}_cells").where(
            F.col("cell").isin(cand_cells)
        )
        cand = (
            F.broadcast(probes)
            .join(cells, "cell")
            .where(F.col("query_id") != F.col("id"))
        )

        sim_schema = StructType(
            [
                StructField("query_id", LongType()),
                StructField("neighbor_id", LongType()),
                StructField("sim", DoubleType()),
            ]
        )

        def score(batches):
            qm = qbc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf["vec"]), dtype=np.float64)
                qv = np.array([qm[q] for q in pdf["query_id"]], dtype=np.float64)
                sims = np.einsum("ij,ij->i", mat, qv)
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                        "neighbor_id": pdf["id"].to_numpy(dtype=np.int64),
                        "sim": sims,
                    }
                )

        scored = cand.mapInPandas(score, schema=sim_schema)
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id")
        )


def ann_query_index(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 8,
    max_queries: int = 100_000,
) -> DataFrame:
    """One-shot form of :class:`AnnProbe` (fresh centroids read every
    call — correct for occasional probes; loops should hold a handle)."""
    return AnnProbe(spark, name).query(
        queries, id_col, vec_col, k, nprobe, max_queries
    )


def ann_index_report(spark: SparkSession, name: str) -> DataFrame:
    """Per-cell occupancy + assignment-quality report — the WHEN-to-
    rebuild measurement the estimator family (#108/#112/#114) gives
    every other approximate operator here. Appends route through FROZEN
    centroids (`append_to_ann_index`): as the data distribution drifts,
    cells fill unevenly and vectors sit farther from their centroid, so
    probe recall at fixed nprobe decays. One cells-table pass returns
    (cell, n_vecs, frac, mean_sim, min_sim): ``frac`` exposes occupancy
    skew (a few giant cells ⇒ nprobe covers less of the corpus than
    n_probed/n_centroids suggests), ``mean_sim`` is the mean cosine of
    each vector to its own centroid — WATCH it across appends; a drop
    vs the post-build reading means the frozen quantizer no longer fits
    the data: rebuild to re-center."""
    _check_name(name)
    _refresh(spark, name)
    C = load_ann_centroids(spark, name)
    bc = spark.sparkContext.broadcast(C)

    out_schema = StructType(
        [
            StructField("cell", LongType()),
            StructField("n_vecs", LongType()),
            StructField("sum_sim", DoubleType()),
            StructField("min_sim", DoubleType()),
        ]
    )

    def per_cell(batches):
        C_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["vec"]), dtype=np.float64)
            sims = np.einsum("ij,ij->i", mat, C_[cells])
            g = pd.DataFrame({"cell": cells, "sim": sims}).groupby("cell")["sim"]
            agg = g.agg(["count", "sum", "min"]).reset_index()
            yield pd.DataFrame(
                {
                    "cell": agg["cell"],
                    "n_vecs": agg["count"].astype(np.int64),
                    "sum_sim": agg["sum"],
                    "min_sim": agg["min"],
                }
            )

    partials = (
        spark.table(f"{name}_cells")
        .select("cell", "vec")
        .mapInPandas(per_cell, schema=out_schema)  # partition-local partials
        .groupBy("cell")
        .agg(
            F.sum("n_vecs").alias("n_vecs"),
            F.sum("sum_sim").alias("sum_sim"),
            F.min("min_sim").alias("min_sim"),
        )
    )
    from pyspark.sql import Window

    # cells are model-scale (n_centroids rows) — a global window is fine
    total = F.sum("n_vecs").over(Window.partitionBy())
    return partials.select(
        "cell",
        "n_vecs",
        (F.col("n_vecs") / total).alias("frac"),
        (F.col("sum_sim") / F.col("n_vecs")).alias("mean_sim"),
        "min_sim",
    )


def recenter_ann_index(
    spark: SparkSession,
    name: str,
    n_centroids: int | None = None,
    num_buckets: int | None = None,
    path: str | None = None,
    seed: int = 42,
) -> np.ndarray:
    """Re-train the quantizer FROM the index's own stored vectors and
    rebuild in place — the maintenance action `ann_index_report`'s
    drift numbers call for (appends route through frozen centroids;
    occupancy skews as the distribution drifts). Geometry defaults to
    the stored values; the rebuild inherits `build_ann_index`'s
    staging-swap atomicity, so probes stay live on the old index until
    the swap and a failed re-center leaves it untouched. Returns the
    new centroid matrix. Cost: one k-means sample pass + one full
    re-route of the stored vectors — the documented trade vs appends
    (∝ new data) that this call amortizes."""
    _check_name(name)
    spark.catalog.refreshTable(f"{name}_cells")
    geom = _stored_geometry(spark, name)
    vecs = spark.table(f"{name}_cells").select("id", "vec")
    # localCheckpoint: the rebuild DROPS the table these rows come from
    # mid-plan; materialize first so the swap can't pull the scan's
    # files out from under the write
    vecs = vecs.localCheckpoint()
    return build_ann_index(
        vecs,
        "id",
        "vec",
        name,
        n_centroids=int(n_centroids or geom["n_centroids"]),
        num_buckets=int(num_buckets or geom["num_buckets"]),
        path=path,
        seed=seed,
    )


# ------------------------------------------------------------------ IVF-PQ
#
# The FAISS IVFPQ composition (Jégou et al. 2011 §IV): the coarse
# quantizer routes each vector to a cell (#132's layout) and the
# RESIDUAL r = v − c_cell is product-quantized to m bytes — the index
# stores (cell, id, code) instead of (cell, id, vec), so a billion-
# vector store holds 16-byte codes where #132 holds 8·d-byte floats
# (768-dim float64: 6144 → m bytes). Probing combines both halves of
# the decomposition q·v = q·c_cell + q·r: the first term is computed
# EXACTLY per (query, cell) on the driver, the second approximated by
# ADC over the residual codebooks — so the only approximation is the
# residual quantization error, and in the lossless-codebook regime
# (every subspace ≤ n_codes distinct residuals) probing equals
# `ivf_topk` with the same centroids and nprobe EXACTLY (pytest).
# Codebooks are GLOBAL across cells (the FAISS default — per-cell books
# would multiply model size by n_centroids for marginal recall).

_CODE_SCHEMA = StructType(
    [
        StructField("cell", LongType()),
        StructField("id", LongType()),
        StructField("code", BinaryType()),
    ]
)


def _encode_residuals(routed: DataFrame, C: np.ndarray, cb: np.ndarray) -> DataFrame:
    """(cell, id, code) — PQ-encode each routed vector's residual
    against its cell centroid; one mapInPandas pass, both models
    broadcast. Assignment arithmetic mirrors `similarity.pq_encode`."""
    m, dsub = cb.shape[0], cb.shape[2]
    b = routed.sparkSession.sparkContext.broadcast(
        (np.asarray(C, dtype=np.float64), np.asarray(cb, dtype=np.float64))
    )

    def enc(batches):
        C_, cb_ = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["vec"]), dtype=np.float64)
            R = mat - C_[cells]
            codes = np.empty((len(R), m), dtype=np.uint8)
            for s in range(m):
                Xs = R[:, s * dsub : (s + 1) * dsub]
                Cb = cb_[s]
                dist = -2.0 * (Xs @ Cb.T) + (Cb * Cb).sum(axis=1)[None, :]
                codes[:, s] = np.argmin(dist, axis=1)
            yield pd.DataFrame(
                {
                    "cell": cells,
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "code": [c.tobytes() for c in codes],
                }
            )

    return routed.mapInPandas(enc, schema=_CODE_SCHEMA)


def _write_pq_staged(
    spark: SparkSession,
    name: str,
    codes: DataFrame,
    C: np.ndarray,
    cb: np.ndarray,
    num_buckets: int,
    path: str | None,
) -> None:
    """Stage-and-swap all three IVFPQ tables (cells=codes, centroids,
    codebooks) — the `_write_staged` contract with the PQ model added."""
    stage = f"{name}__stage"
    for suffix in ("cells", "centroids", "codebooks"):
        spark.sql(f"DROP TABLE IF EXISTS {stage}_{suffix}")
    write_bucketed(
        codes,
        f"{stage}_cells",
        ["cell"],
        num_buckets=num_buckets,
        sort_cols=["cell"],
        path=_stage_path(spark, f"{name}_cells", path, f"{name}_cells"),
    )
    cw = spark.createDataFrame(
        [(int(i), [float(x) for x in C[i]]) for i in range(len(C))],
        "cell long, vec array<double>",
    ).write.mode("overwrite")
    if path:
        cw = cw.option(
            "path",
            _stage_path(spark, f"{name}_centroids", path, f"{name}_centroids"),
        )
    cw.saveAsTable(f"{stage}_centroids")
    bw = spark.createDataFrame(
        [
            (int(s), int(j), [float(x) for x in cb[s, j]])
            for s in range(cb.shape[0])
            for j in range(cb.shape[1])
        ],
        "s long, j long, vec array<double>",
    ).write.mode("overwrite")
    if path:
        bw = bw.option(
            "path",
            _stage_path(spark, f"{name}_codebooks", path, f"{name}_codebooks"),
        )
    bw.saveAsTable(f"{stage}_codebooks")
    _stamp(spark, f"{stage}_cells", num_buckets, len(C))
    spark.sql(
        f"ALTER TABLE {stage}_cells SET TBLPROPERTIES "
        f"('bitfilters.pq_m'='{cb.shape[0]}')"
    )
    for suffix in ("cells", "centroids", "codebooks"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        spark.sql(f"ALTER TABLE {stage}_{suffix} RENAME TO {name}_{suffix}")


def build_ivfpq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    name: str,
    n_centroids: int = 64,
    m: int = 8,
    n_codes: int = 256,
    num_buckets: int = 16,
    sample_rows: int = 20_000,
    iters: int = 10,
    path: str | None = None,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> tuple:
    """Build and persist the IVFPQ index; returns (centroids,
    codebooks). Two corpus passes: a bounded residual SAMPLE trains the
    codebooks (driver-side k-means on ≤ sample_rows residuals — the
    `train_pq` cost posture, O(sample) never O(corpus)), then one full
    pass routes + encodes. Pass ``centroids``/``codebooks`` to reuse
    trained models and skip the respective training."""
    from .similarity import train_pq_books

    _check_name(name)
    spark = df.sparkSession
    C = np.asarray(
        centroids
        if centroids is not None
        else ivf_centroids(df, vec_col, n_centroids, seed=seed),
        dtype=np.float64,
    )
    routed = _route(df, id_col, vec_col, C)
    if codebooks is None:
        # deterministic training sample (r14, ADVICE): an unordered
        # limit() varies across rebuilds of the same corpus, silently
        # changing the codebooks; TakeOrdered by the unique id pins it,
        # cost O(n log sample) distributed — never a full sort
        sample = (
            routed.select("cell", "vec", "id")
            .orderBy("id")
            .limit(sample_rows)
            .collect()
        )
        if not sample:
            raise ValueError("build_ivfpq_index: empty input")
        R = np.array([r["vec"] for r in sample], dtype=np.float64) - C[
            np.array([r["cell"] for r in sample], dtype=np.int64)
        ]
        cb = train_pq_books(R, m, n_codes, iters, seed)
    else:
        cb = np.asarray(codebooks, dtype=np.float64)
    _write_pq_staged(
        spark, name, _encode_residuals(routed, C, cb), C, cb, num_buckets, path
    )
    return C, cb


def load_pq_codebooks(spark: SparkSession, name: str) -> np.ndarray:
    rows = sorted(
        spark.table(f"{_check_name(name)}_codebooks").collect(),
        key=lambda r: (r["s"], r["j"]),
    )
    m = int(rows[-1]["s"]) + 1
    k_eff = len(rows) // m
    return np.array([r["vec"] for r in rows], dtype=np.float64).reshape(
        m, k_eff, -1
    )


def append_to_ivfpq_index(
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
    name: str,
    num_buckets: int = 16,
) -> None:
    """Fold NEW vectors in at cost ∝ the new data: route through the
    STORED centroids and encode through the STORED codebooks (both
    frozen — identical cells AND codes to a rebuild with the same
    models, so append-then-probe ≡ rebuild-then-probe, tested). Same
    geometry guard and single-writer contract as
    `append_to_ann_index`."""
    _check_name(name)
    spark = new_df.sparkSession
    geom = _stored_geometry(spark, name)
    if geom.get("num_buckets") is not None and geom["num_buckets"] != num_buckets:
        raise ValueError(
            f"IVFPQ index '{name}' was built with num_buckets="
            f"{geom['num_buckets']}, called with {num_buckets}; appended "
            "rows would land in the wrong buckets."
        )
    C = load_ann_centroids(spark, name)
    cb = load_pq_codebooks(spark, name)
    _encode_residuals(_route(new_df, id_col, vec_col, C), C, cb).write.mode(
        "append"
    ).format("parquet").bucketBy(num_buckets, "cell").sortBy("cell").saveAsTable(
        f"{name}_cells"
    )


class IvfPqProbe:
    """Session-cached IVFPQ probe handle (the :class:`AnnProbe`
    pattern, models pinned at construction). Scoring decomposes
    q·v = q·c_cell (exact, driver-computed per candidate cell) +
    q·r (ADC over the residual codebooks — m byte-indexed lookups per
    candidate; the stored float vectors do not exist to be read)."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = _check_name(name)
        self.refresh()

    def refresh(self) -> "IvfPqProbe":
        _refresh(self.spark, self.name)
        self.spark.catalog.refreshTable(f"{self.name}_codebooks")
        self.C = load_ann_centroids(self.spark, self.name)
        self.cb = load_pq_codebooks(self.spark, self.name)
        return self

    def query(
        self,
        queries: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
        nprobe: int = 8,
        max_queries: int = 100_000,
    ) -> DataFrame:
        """(query_id, rank, neighbor_id) — `ann_query_index`'s contract
        over PQ codes: candidate cells are a literal In-filter on the
        bucketed codes scan + a broadcast probe list; per candidate the
        score is base[q, cell] + Σ_s LUT[q][s, code_s]."""
        spark, C, cb = self.spark, self.C, self.cb
        m, k_eff, dsub = cb.shape
        qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
        if len(qrows) > max_queries:
            raise ValueError(
                f"ivfpq_query_index collected more than max_queries="
                f"{max_queries} query rows; batch the query set, or raise "
                "max_queries consciously."
            )
        empty = spark.createDataFrame(
            [], "query_id long, rank int, neighbor_id long"
        )
        if not qrows:
            return empty
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        qmat = np.array([r[1] for r in qrows], dtype=np.float64)
        qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
        base = qmat @ C.T  # exact q . c_cell term, (nq, n_centroids)
        order = np.argsort(-base, axis=1)[:, : min(nprobe, len(C))]
        probe_pairs = [
            (int(qids[i]), int(c)) for i in range(len(qids)) for c in order[i]
        ]
        cand_cells = sorted({c for _, c in probe_pairs})
        probes = spark.createDataFrame(probe_pairs, "query_id long, cell long")
        qpos = {int(qids[i]): i for i in range(len(qids))}
        # broadcast the COMPACT models (qmat is nq x d; C/cb are tiny)
        # and derive the ADC LUT + base table ONCE PER TASK on the
        # executor: the expanded LUT is (nq, m*k_eff) — up to ~32x qmat
        # at the defaults, ~1.6 GB at max_queries — and shipping it
        # would OOM long before the query bound AnnProbe sustains; the
        # one einsum per task is nq*d*k_eff flops, noise next to scan
        bc = spark.sparkContext.broadcast((qpos, qmat, C, cb))
        cells = spark.table(f"{self.name}_cells").where(
            F.col("cell").isin(cand_cells)
        )
        cand = (
            F.broadcast(probes)
            .join(cells, "cell")
            .where(F.col("query_id") != F.col("id"))
        )

        sim_schema = StructType(
            [
                StructField("query_id", LongType()),
                StructField("neighbor_id", LongType()),
                StructField("sim", DoubleType()),
            ]
        )

        def score(batches):
            qpos_, qmat_, C_, cb_ = bc.value
            base_ = qmat_ @ C_.T
            lut_ = np.einsum(
                "qsd,sjd->qsj", qmat_.reshape(len(qmat_), m, dsub), cb_
            ).reshape(len(qmat_), m * k_eff)
            offs = np.arange(m, dtype=np.int64) * k_eff
            for pdf in batches:
                if not len(pdf):
                    continue
                qidx = np.array(
                    [qpos_[q] for q in pdf["query_id"]], dtype=np.int64
                )
                cells_ = pdf["cell"].to_numpy(dtype=np.int64)
                cm = np.frombuffer(b"".join(pdf["code"]), dtype=np.uint8).reshape(
                    -1, m
                )
                idx = cm.astype(np.int64) + offs[None, :]
                adc = lut_[qidx[:, None], idx].sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                        "neighbor_id": pdf["id"].to_numpy(dtype=np.int64),
                        "sim": base_[qidx, cells_] + adc,
                    }
                )

        scored = cand.mapInPandas(score, schema=sim_schema)
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id")
        )


def ivfpq_query_index(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 8,
    max_queries: int = 100_000,
) -> DataFrame:
    """One-shot form of :class:`IvfPqProbe` (fresh models read every
    call — correct for occasional probes; loops should hold a handle)."""
    return IvfPqProbe(spark, name).query(
        queries, id_col, vec_col, k, nprobe, max_queries
    )


def compact_ivfpq_index(
    spark: SparkSession, name: str, path: str | None = None
) -> dict:
    """`compact_ann_index` for the IVFPQ family: every append adds a
    file-set per bucket forever; rewrite the codes table to one file-set
    per bucket. Rows, centroids, codebooks, and geometry are unchanged,
    so probes are bit-identical before/after; same staging-swap
    atomicity (a crash mid-compact leaves the live index untouched).
    Returns ``{"files_before": n, "files_after": n}``."""
    _check_name(name)
    _refresh(spark, name)
    spark.catalog.refreshTable(f"{name}_codebooks")
    geom = _stored_geometry(spark, name)
    num_buckets = geom["num_buckets"]

    def _nfiles():
        return (
            spark.table(f"{name}_cells")
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    files_before = _nfiles()
    C = load_ann_centroids(spark, name)
    cb = load_pq_codebooks(spark, name)
    from .bm25_index import _live_location

    loc = _live_location(spark, f"{name}_cells")
    src = spark.read.parquet(loc) if loc else spark.table(f"{name}_cells")
    codes = src.repartition(num_buckets, F.col("cell"))
    _write_pq_staged(spark, name, codes, C, cb, num_buckets, path)
    return {"files_before": files_before, "files_after": _nfiles()}


def ivfpq_index_report(spark: SparkSession, name: str) -> DataFrame:
    """Per-cell occupancy + size accounting for an IVFPQ index —
    `ann_index_report`'s WHEN-to-rebuild occupancy half (frozen-model
    appends skew cells as the distribution drifts; a few giant cells
    mean nprobe covers less of the corpus than nprobe/n_centroids
    suggests) plus the accounting the compression exists for:
    ``code_bytes`` per cell and the index-wide bytes/vector (== m by
    construction — asserted in pytest, the claim the codes table makes
    vs #132's 8·d float layout). The centroid-distance drift half needs
    raw vectors the codes table deliberately no longer stores — decode
    error vs the ORIGINAL vectors is `similarity.pq_recall_report`'s
    job at build/validate time."""
    _check_name(name)
    _refresh(spark, name)
    cells = spark.table(f"{name}_cells")
    per = cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.octet_length("code")).cast("long").alias("code_bytes"),
    )
    tot = per.agg(F.sum("n_vecs").alias("__t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_vecs",
        (F.col("n_vecs").cast("double") / F.greatest(
            F.col("__t").cast("double"), F.lit(1.0)
        )).alias("frac"),
        "code_bytes",
    )


# ---------------------------------------------------------------------------
# Persisted binary-signature (Hamming) index — the fifth index family
# (r14): the build-once/probe-many form of `similarity.hamming_topk` /
# `hamming_rerank_topk`. The store is `<name>_sigs` (id, sig[, vec]):
# the sign signatures are the 64x-compressed coarse representation; the
# optional vec column keeps the float vectors co-located for the exact-
# cosine re-rank stage (bucketed on id, so the re-rank's re-fetch join
# reads index rows in place). Probes share `_hamming_rank` /
# `_cosine_rerank` with the in-session operators, so index and scan can
# never diverge arithmetically (pinned in pytest).
# ---------------------------------------------------------------------------


def build_sig_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    name: str,
    num_buckets: int = 16,
    keep_vectors: bool = True,
    path: str | None = None,
) -> None:
    """One corpus pass → the bucketed table ``<name>_sigs``.
    ``keep_vectors=False`` stores signatures only (8 B/vector at 64
    dims) — probes then serve the coarse Hamming ranking and refuse
    re-ranking loudly."""
    from .similarity import binary_signatures

    _check_name(name)
    spark = df.sparkSession
    base = binary_signatures(df.select(id_col, vec_col), vec_col)
    cols = [F.col(id_col).alias("id"), F.col("sig")]
    if keep_vectors:
        cols.append(F.col(vec_col).alias("vec"))
    write_bucketed(
        base.select(*cols),
        f"{name}_sigs",
        ["id"],
        num_buckets=num_buckets,
        sort_cols=["id"],
        path=None if path is None else f"{path}/sigs",
    )
    spark.sql(
        f"ALTER TABLE {name}_sigs SET TBLPROPERTIES "
        f"('bitfilters.num_buckets'='{num_buckets}', "
        f"'bitfilters.keep_vectors'='{int(keep_vectors)}')"
    )


def append_to_sig_index(
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
    name: str,
    num_buckets: int = 16,
) -> None:
    """Fold NEW vectors in at cost ∝ new data (signature packing is
    scan-speed); the stored layout decides whether vectors ride along.
    Same geometry guard and single-writer contract as the other index
    families."""
    from .similarity import binary_signatures

    _check_name(name)
    spark = new_df.sparkSession
    rows = spark.sql(f"SHOW TBLPROPERTIES {name}_sigs").collect()
    props = {r["key"]: r["value"] for r in rows}
    stored_nb = props.get("bitfilters.num_buckets")
    if stored_nb is not None and int(stored_nb) != num_buckets:
        raise ValueError(
            f"signature index '{name}' was built with num_buckets="
            f"{stored_nb}, called with {num_buckets}; appended rows "
            "would land in the wrong buckets."
        )
    keep_vectors = props.get("bitfilters.keep_vectors", "1") == "1"
    base = binary_signatures(new_df.select(id_col, vec_col), vec_col)
    cols = [F.col(id_col).alias("id"), F.col("sig")]
    if keep_vectors:
        cols.append(F.col(vec_col).alias("vec"))
    base.select(*cols).write.mode("append").format("parquet").bucketBy(
        num_buckets, "id"
    ).sortBy("id").saveAsTable(f"{name}_sigs")


def sig_query_index(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank_overfetch: int = 0,
    max_queries: int = 100_000,
) -> DataFrame:
    """Probe the persisted signature store. ``rerank_overfetch=0``:
    the pure coarse pass — (query_id, rank, neighbor_id, hamming),
    identical to `hamming_topk` against the indexed corpus. ``>= 1``:
    the two-stage shape — k·overfetch Hamming survivors re-ranked by
    exact cosine from the CO-LOCATED stored vectors (no second corpus
    scan; requires keep_vectors=True, else a loud error), identical to
    `hamming_rerank_topk`. Query signatures are computed in-session;
    the index side streams its stored ones."""
    from .similarity import (
        _check_query_count,
        _cosine_rerank,
        _hamming_rank,
        binary_signatures,
    )

    _check_name(name)
    _check_query_count(queries, max_queries, "sig_query_index")
    sigs = spark.table(f"{name}_sigs")
    q = binary_signatures(queries.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("sig").alias("__sq"),
        F.col(vec_col).alias("__qv"),
    )
    c = sigs.select(F.col("id").alias("neighbor_id"), F.col("sig").alias("__sc"))
    if rerank_overfetch < 1:
        return _hamming_rank(c, q.drop("__qv"), k)
    if "vec" not in sigs.columns:
        raise ValueError(
            f"signature index '{name}' was built with keep_vectors=False; "
            "it cannot serve an exact-cosine re-rank. Rebuild with "
            "keep_vectors=True or probe with rerank_overfetch=0."
        )
    coarse = _hamming_rank(c, q.drop("__qv"), k * rerank_overfetch).select(
        "query_id", "neighbor_id"
    )
    nvec = sigs.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("__nv"))
    return _cosine_rerank(coarse, nvec, q.select("query_id", "__qv"), k)


def compact_sig_index(spark: SparkSession, name: str, path: str | None = None) -> dict:
    """Rewrite the signature table into one file-set per bucket —
    rows/probe results unchanged, staging-swap atomicity with the
    alternating external directories (the family contract)."""
    from .bm25_index import _live_location

    _check_name(name)
    spark.catalog.refreshTable(f"{name}_sigs")
    rows = spark.sql(f"SHOW TBLPROPERTIES {name}_sigs").collect()
    props = {
        r["key"]: r["value"] for r in rows if r["key"].startswith("bitfilters.")
    }
    if "bitfilters.num_buckets" not in props:
        raise ValueError(
            f"signature index '{name}' carries no stored geometry; "
            "compaction needs the bucket count to preserve the layout."
        )
    nb = int(props["bitfilters.num_buckets"])

    def _nfiles():
        return (
            spark.table(f"{name}_sigs")
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    files_before = _nfiles()
    stage = f"{name}__stage"
    spark.sql(f"DROP TABLE IF EXISTS {stage}_sigs")
    loc = _live_location(spark, f"{name}_sigs")
    src = spark.read.parquet(loc) if loc else spark.table(f"{name}_sigs")
    write_bucketed(
        src.repartition(nb, F.col("id")),
        f"{stage}_sigs",
        ["id"],
        num_buckets=nb,
        sort_cols=["id"],
        path=_stage_path(spark, f"{name}_sigs", path, f"{name}_sigs"),
    )
    kv = ", ".join(f"'{k_}'='{v}'" for k_, v in props.items())
    spark.sql(f"ALTER TABLE {stage}_sigs SET TBLPROPERTIES ({kv})")
    spark.sql(f"DROP TABLE IF EXISTS {name}_sigs")
    spark.sql(f"ALTER TABLE {stage}_sigs RENAME TO {name}_sigs")
    return {"files_before": files_before, "files_after": _nfiles()}
