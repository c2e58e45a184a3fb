"""Persisted MinHash-LSH near-dup index: dedup an incoming crawl against
a reference corpus WITHOUT rescanning the reference.

`cross_dedup` (operators/dedup.py) re-derives shingles and band keys for
BOTH sides on every run — correct, but at 100 TB the reference side
dominates and never changes between crawls. This module splits that cost:

* :func:`build_lsh_index` — one-time scan of the reference that persists
  two BUCKETED tables: ``<name>_bands`` (id, band, bh) bucketed on the
  band-bucket join key, and ``<name>_shingles`` (id, sh) bucketed on id
  for the exact-Jaccard verify. The bucketing pre-pays the probe-time
  shuffle: probing never moves an index row.
* :func:`probe_lsh_index` — candidate pairs for NEW docs only: the new
  (small) side computes signatures, shuffles into the index's bucket
  layout, and joins; survivors verify with exact Jaccard against the
  stored shingle sets. Cost ∝ new data, never ∝ reference size.
* :func:`append_to_lsh_index` — extends the index with the new docs
  (append into the same bucketed layout) so the next crawl sees them;
  incremental-maintenance cost ∝ new data, like
  ``refresh_file_index`` (sources/skipping.py) for the file-skipping
  blobs.

Composition law (pytest, tests/test_incremental.py):
``probe_lsh_index(new, index(ref))`` returns exactly the cross-side
pairs of ``minhash_lsh_pairs(ref ∪ new)`` — same permutations, same
band hashing, same exact verification, so an index probe is
indistinguishable from a full-corpus run with the reference frozen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import write_bucketed
from .dedup import minhash_signatures
from .text import word_shingles


def _banded(sig: DataFrame, id_col: str, k: int, bands: int) -> DataFrame:
    """(id, band, bh) — one row per (doc, band). Unlike minhash_lsh_pairs'
    (band, bh) composite keys, the band index is SALTED INTO the hash
    (``xxhash64(band, slice…)``) so the band-bucket join needs only the
    single ``bh`` column — which then exactly matches the index table's
    bucket column and lets the bucketed scan satisfy the join's
    distribution with zero Exchange. A cross-band xxhash64 collision can
    only add a spurious CANDIDATE, which the exact-Jaccard verify drops."""
    r = k // bands
    band_cols = [
        F.xxhash64(
            F.lit(b),
            F.concat_ws(",", *[F.col("sig")[i] for i in range(b * r, (b + 1) * r)]),
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    return (
        sig.select(id_col, *band_cols)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bh"))
                        for b in range(bands)
                    ]
                )
            ).alias("e"),
        )
        .select("id", "e.band", "e.bh")
    )


_GEOM_KEYS = ("k", "bands", "shingle_n", "num_buckets")


def _write_geom(spark: SparkSession, name: str, geom: dict) -> None:
    """Persist the index geometry as table properties on ``<name>_bands``.
    Probe/append with a different geometry would not error — band hashes
    simply never collide — so it must be an explicit failure instead of
    silent zero recall."""
    props = ", ".join(f"'bitfilters.{g}'='{geom[g]}'" for g in _GEOM_KEYS)
    spark.sql(f"ALTER TABLE {name}_bands SET TBLPROPERTIES ({props})")


def _check_geom(spark: SparkSession, name: str, geom: dict) -> None:
    """Fail fast when the caller's geometry disagrees with the persisted
    one. Indexes built before geometry stamping (no properties) pass."""
    try:
        rows = spark.sql(f"SHOW TBLPROPERTIES {name}_bands").collect()
    except Exception:
        return
    props = {r["key"]: r["value"] for r in rows}
    for g, want in geom.items():
        have = props.get(f"bitfilters.{g}")
        if have is not None and int(have) != want:
            raise ValueError(
                f"LSH index '{name}' was built with {g}={have}, called with "
                f"{g}={want}; mismatched geometry yields near-zero recall. "
                f"Rebuild the index or pass the stored geometry."
            )


def lsh_index_geometry(spark: SparkSession, name: str) -> dict:
    """The stored {k, bands, shingle_n, num_buckets} of a persisted index
    (empty dict for pre-stamping indexes) — pass these to probe/append."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {name}_bands").collect()
    props = {r["key"]: r["value"] for r in rows}
    return {
        g: int(props[f"bitfilters.{g}"])
        for g in _GEOM_KEYS
        if f"bitfilters.{g}" in props
    }


def build_lsh_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    name: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """One-time reference scan → two bucketed tables ``<name>_bands`` and
    ``<name>_shingles``. The scan computes each doc's signature once (the
    same single-xxhash + affine-permutation min-agg as
    ``minhash_signatures``); the only shuffles are the per-doc signature
    groupBy and the bucketed writes — both ∝ corpus size, paid once."""
    sig = minhash_signatures(df, id_col, text_col, k, shingle_n)
    write_bucketed(
        _banded(sig, id_col, k, bands),
        f"{name}_bands",
        ["bh"],
        num_buckets=num_buckets,
        path=None if path is None else f"{path}/bands",
    )
    shset = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
    )
    write_bucketed(
        shset,
        f"{name}_shingles",
        ["id"],
        num_buckets=num_buckets,
        path=None if path is None else f"{path}/shingles",
    )
    _write_geom(
        df.sparkSession,
        name,
        {"k": k, "bands": bands, "shingle_n": shingle_n, "num_buckets": num_buckets},
    )


def append_to_lsh_index(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    name: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    num_buckets: int = 32,
) -> None:
    """Fold new docs into the index (append into the bucketed layout —
    Spark routes appended rows to their buckets, so probe-time plans are
    unchanged). Cost ∝ new data; the reference is never rescanned.

    Single-writer contract: appends are plain parquet-table appends with
    no transaction log, so concurrent appenders can interleave files but
    never corrupt the bucketing; serialize appends (as
    ``streaming_neardup_dedup``'s per-micro-batch fold does) when probe
    results must reflect a consistent index version."""
    _check_geom(
        new_df.sparkSession,
        name,
        {"k": k, "bands": bands, "shingle_n": shingle_n, "num_buckets": num_buckets},
    )
    sig = minhash_signatures(new_df, id_col, text_col, k, shingle_n)
    _banded(sig, id_col, k, bands).write.mode("append").format("parquet").bucketBy(
        num_buckets, "bh"
    ).saveAsTable(f"{name}_bands")
    new_df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh"),
    ).write.mode("append").format("parquet").bucketBy(num_buckets, "id").saveAsTable(
        f"{name}_shingles"
    )


def probe_lsh_index(
    spark: SparkSession,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    name: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(new_id, ref_id, jaccard) for every new doc near-duplicating an
    indexed reference doc. The index tables never shuffle (bucketed on
    the join keys); only the new side's band rows and candidate shingle
    sets move. LSH recall semantics are exactly ``minhash_lsh_pairs``:
    candidates from any shared band, then exact Jaccard >= threshold."""
    _check_geom(spark, name, {"k": k, "bands": bands, "shingle_n": shingle_n})
    sig = minhash_signatures(new_df, id_col, text_col, k, shingle_n)
    new_bands = _banded(sig, id_col, k, bands)
    ref_bands = spark.table(f"{name}_bands")
    cands = (
        new_bands.alias("n")
        .join(ref_bands.alias("r"), ["bh"])
        .select(F.col("n.id").alias("new_id"), F.col("r.id").alias("ref_id"))
        .distinct()
    )
    new_sh = new_df.select(
        F.col(id_col).alias("new_id"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh_n"),
    )
    ref_sh = spark.table(f"{name}_shingles").select(
        F.col("id").alias("ref_id"), F.col("sh").alias("sh_r")
    )
    return (
        cands.join(new_sh, "new_id")
        .join(ref_sh, "ref_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_n", "sh_r")).cast("double")
            / F.size(F.array_union("sh_n", "sh_r")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "ref_id", F.round("jaccard", 6).alias("jaccard"))
    )


def dedup_against_index(
    spark: SparkSession,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    name: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """New docs with every near-duplicate of an indexed doc dropped — the
    `cross_dedup` contract (reference immutable, new-new dups kept for a
    subsequent `dedup_near` pass) at index-probe cost."""
    hits = probe_lsh_index(
        spark, new_df, id_col, text_col, name, k, bands, shingle_n, threshold
    ).select(F.col("new_id").alias(id_col)).distinct()
    return new_df.join(hits, id_col, "left_anti")


def compact_lsh_index(spark: SparkSession, name: str, path: str | None = None) -> dict:
    """Rewrite both index tables into one file-set per bucket: every
    `append_to_lsh_index` call (and every `streaming_neardup_dedup`
    micro-batch fold) appends a file-set per bucket forever; probe
    answers stay exact but probe plans degrade with file count. Rows and
    geometry are unchanged — probe results are identical before/after
    (joins + per-pair Jaccard, nothing order-sensitive). Staging-swap
    atomicity (the `bm25_index` pattern, with per-rebuild ALTERNATING
    external directories): a crash mid-compact leaves the live index
    untouched and fully queryable. Returns bands-table file counts
    ``{"files_before": n, "files_after": n}``."""
    from .bm25_index import _check_name, _live_location, _stage_path

    _check_name(name)
    for suffix in ("bands", "shingles"):
        spark.catalog.refreshTable(f"{name}_{suffix}")
    geom = lsh_index_geometry(spark, name)
    if "num_buckets" not in geom:
        raise ValueError(
            f"LSH index '{name}' carries no stored geometry; compaction "
            "needs the bucket count to preserve the layout."
        )
    nb = geom["num_buckets"]

    def _nfiles():
        return (
            spark.table(f"{name}_bands")
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    files_before = _nfiles()
    stage = f"{name}__stage"
    for suffix in ("bands", "shingles"):
        spark.sql(f"DROP TABLE IF EXISTS {stage}_{suffix}")
    # one-bucket-per-task repartition => exactly one file per bucket;
    # read the FILES so the bucketed read's advertised partitioning
    # cannot elide the repartition (see compact_bm25_index)
    def _src(table):
        loc = _live_location(spark, table)
        return spark.read.parquet(loc) if loc else spark.table(table)

    write_bucketed(
        _src(f"{name}_bands").repartition(nb, F.col("bh")),
        f"{stage}_bands",
        ["bh"],
        num_buckets=nb,
        path=_stage_path(spark, f"{name}_bands", path, f"{name}_bands"),
    )
    write_bucketed(
        _src(f"{name}_shingles").repartition(nb, F.col("id")),
        f"{stage}_shingles",
        ["id"],
        num_buckets=nb,
        path=_stage_path(spark, f"{name}_shingles", path, f"{name}_shingles"),
    )
    # re-stamp whatever geometry keys the live index carried (pre-swap,
    # so a crash between swap statements never leaves a stampless index)
    props = ", ".join(f"'bitfilters.{g}'='{v}'" for g, v in geom.items())
    spark.sql(f"ALTER TABLE {stage}_bands SET TBLPROPERTIES ({props})")
    for suffix in ("bands", "shingles"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        spark.sql(f"ALTER TABLE {stage}_{suffix} RENAME TO {name}_{suffix}")
    return {"files_before": files_before, "files_after": _nfiles()}
