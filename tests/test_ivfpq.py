"""IVF-PQ composed ANN index (#162, r13): coarse cells + residual PQ
codes — the FAISS IVFPQ shape. The index stores m-byte codes instead of
8·d-byte float vectors; probing combines the EXACT q·c_cell term with
ADC over the residual codebooks, so the only approximation is residual
quantization error — zero in the lossless-codebook regime, where probe
rows equal `ivf_topk` exactly."""

import numpy as np
import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_ivfpq_lossless_regime_equals_ivf_topk(spark, tmp_path):
    """Corpus of 200 vectors with n_codes=256: every residual subvector
    becomes (and stays) its own PQ centroid, encoding is lossless, and
    the probe equals ivf_topk with the same centroids at full AND
    partial nprobe. The codes scan must carry the In(cell) pushdown."""
    import contextlib
    import io

    from bitfilters_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_query_index,
    )
    from bitfilters_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(EMB).where(F.col("vec_id") < 200)
    queries = emb.where(F.col("vec_id") < 8)
    C, cb = build_ivfpq_index(
        emb, "vec_id", "embedding", "ivfpq_ll", n_centroids=8, m=8,
        n_codes=256, num_buckets=4, path=str(tmp_path / "ll"),
    )
    for nprobe in (8, 3):
        got = sorted(map(tuple, ivfpq_query_index(
            spark, "ivfpq_ll", queries, "vec_id", "embedding",
            k=5, nprobe=nprobe,
        ).collect()))
        want = sorted(map(tuple, ivf_topk(
            emb, queries, "vec_id", "embedding", k=5, n_centroids=8,
            nprobe=nprobe, centroids=C,
        ).select("query_id", "rank", "neighbor_id").collect()))
        assert got == want and len(got) > 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivfpq_query_index(
            spark, "ivfpq_ll", queries, "vec_id", "embedding", k=5, nprobe=3
        ).explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "In(cell" in plan


def test_ivfpq_code_size_and_neardup_recall(spark, tmp_path):
    """The point of the composition: the cells table holds m BYTES per
    vector (no float vec column at all — a 64-dim float64 store shrinks
    512 -> 8 bytes/vector), and lossy coding still retrieves planted
    near-duplicates (cos > 0.99 vs ~0 background — the ANN workload the
    index serves; uniform-random top-k, where all margins are within PQ
    noise, is the documented adversarial non-case)."""
    import numpy as np

    from bitfilters_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_query_index,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((120, 64))
    rows = [(i, base[i].tolist()) for i in range(120)]
    partners = {}
    for j in range(12):  # near-duplicate of vector 3j, planted as 120+j
        noisy = base[3 * j] + 0.01 * rng.standard_normal(64)
        rows.append((120 + j, noisy.tolist()))
        partners[120 + j] = 3 * j
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    build_ivfpq_index(
        df, "vec_id", "embedding", "ivfpq_rc", n_centroids=8, m=8,
        n_codes=64, num_buckets=4, path=str(tmp_path / "rc"),
    )
    cells = spark.table("ivfpq_rc_cells")
    assert "vec" not in cells.columns and "code" in cells.columns
    row = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("code")).alias("bytes"),
    ).collect()[0]
    assert row["n"] == 132 and row["bytes"] == 132 * 8
    queries = df.where(F.col("vec_id") >= 120)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in ivfpq_query_index(
            spark, "ivfpq_rc", queries, "vec_id", "embedding", k=1, nprobe=8
        ).collect()
    }
    hits = sum(1 for q, p in partners.items() if top1.get(q) == p)
    assert hits >= 10, f"only {hits}/12 planted near-dups recovered"
    # partial probe returns a subset of the full-probe candidate space
    part = ivfpq_query_index(
        spark, "ivfpq_rc", queries, "vec_id", "embedding", k=10, nprobe=2
    )
    assert 0 < part.count() <= 10 * queries.count()


def test_ivfpq_append_equals_rebuild(spark, tmp_path):
    """Append routes + encodes through the FROZEN stored centroids AND
    codebooks — probe rows equal a from-scratch rebuild over the union
    with the same models; mismatched bucket count fails loudly."""
    from bitfilters_spark.operators.ann_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_query_index,
        load_pq_codebooks,
    )

    emb = spark.read.parquet(EMB)
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    queries = emb.where(F.col("vec_id") < 6)
    C, cb = build_ivfpq_index(
        old, "vec_id", "embedding", "ivfpq_app", n_centroids=8, m=8,
        n_codes=32, num_buckets=4, path=str(tmp_path / "app"),
    )
    append_to_ivfpq_index(new, "vec_id", "embedding", "ivfpq_app", num_buckets=4)
    build_ivfpq_index(
        emb, "vec_id", "embedding", "ivfpq_full", n_centroids=8, m=8,
        n_codes=32, num_buckets=4, path=str(tmp_path / "full"),
        centroids=C, codebooks=cb,
    )
    a = sorted(map(tuple, ivfpq_query_index(
        spark, "ivfpq_app", queries, "vec_id", "embedding", k=5, nprobe=8
    ).collect()))
    b = sorted(map(tuple, ivfpq_query_index(
        spark, "ivfpq_full", queries, "vec_id", "embedding", k=5, nprobe=8
    ).collect()))
    assert a == b and len(a) > 0
    np.testing.assert_array_equal(
        load_pq_codebooks(spark, "ivfpq_app"),
        load_pq_codebooks(spark, "ivfpq_full"),
    )
    with pytest.raises(ValueError, match="num_buckets"):
        append_to_ivfpq_index(
            new, "vec_id", "embedding", "ivfpq_app", num_buckets=8
        )


def test_ivfpq_probe_handle_and_empty_queries(spark, tmp_path):
    """IvfPqProbe pins models at construction; a 0-row query batch
    returns an empty typed frame; max_queries guards the collect."""
    from bitfilters_spark.operators.ann_index import (
        IvfPqProbe,
        build_ivfpq_index,
    )

    emb = spark.read.parquet(EMB).where(F.col("vec_id") < 100)
    build_ivfpq_index(
        emb, "vec_id", "embedding", "ivfpq_h", n_centroids=4, m=4,
        n_codes=16, num_buckets=2, path=str(tmp_path / "h"),
    )
    probe = IvfPqProbe(spark, "ivfpq_h")
    empty = probe.query(emb.where(F.lit(False)), "vec_id", "embedding")
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "query_id", "rank", "neighbor_id",
    ]
    got = probe.query(emb.where(F.col("vec_id") < 3), k=3, nprobe=4)
    assert got.count() > 0
    with pytest.raises(ValueError, match="max_queries"):
        probe.query(emb, "vec_id", "embedding", max_queries=5)


def test_streaming_ivfpq_index_maintenance(spark, tmp_path):
    """Streaming IVFPQ maintenance (#165): micro-batches route + encode
    through BOTH frozen models; after the drain, probes equal a rebuild
    over the union with the same centroids and codebooks; replaying an
    applied batch id is a no-op."""
    from bitfilters_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_query_index,
    )
    from bitfilters_spark.streaming import (
        ivfpq_maintenance_fold,
        streaming_ivfpq_index,
    )

    emb = spark.read.parquet(EMB)
    seed = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    C, cb = build_ivfpq_index(
        seed, "vec_id", "embedding", "sivfpq", n_centroids=8, m=8,
        n_codes=32, num_buckets=4, path=str(tmp_path / "ix"),
    )
    src = str(tmp_path / "in")
    rest.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(rest.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        streaming_ivfpq_index(
            stream.select("vec_id", "embedding"), "vec_id", "embedding",
            "sivfpq", str(tmp_path / "markers"), num_buckets=4,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    build_ivfpq_index(
        emb, "vec_id", "embedding", "sivfpq_full", n_centroids=8, m=8,
        n_codes=32, num_buckets=4, path=str(tmp_path / "full"),
        centroids=C, codebooks=cb,
    )
    queries = emb.where(F.col("vec_id") < 6)
    a = sorted(map(tuple, ivfpq_query_index(
        spark, "sivfpq", queries, "vec_id", "embedding", k=5, nprobe=8
    ).collect()))
    b = sorted(map(tuple, ivfpq_query_index(
        spark, "sivfpq_full", queries, "vec_id", "embedding", k=5, nprobe=8
    ).collect()))
    assert a == b and len(a) > 0
    fold = ivfpq_maintenance_fold(
        "vec_id", "embedding", "sivfpq", str(tmp_path / "m2"), num_buckets=4
    )
    extra = emb.where(F.col("vec_id") == 2).select("vec_id", "embedding")
    fold(extra, 3)
    before = spark.table("sivfpq_cells").count()
    fold(extra, 3)
    assert spark.table("sivfpq_cells").count() == before


def test_compact_ivfpq_index_probe_identical(spark, tmp_path):
    """compact_ivfpq_index collapses append-accumulated file-sets to one
    per bucket; probes are bit-identical before/after and the models
    are unchanged."""
    from bitfilters_spark.operators.ann_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        compact_ivfpq_index,
        ivfpq_query_index,
        load_pq_codebooks,
    )

    emb = spark.read.parquet(EMB).where(F.col("vec_id") < 200)
    seed = emb.where(F.col("vec_id") % 2 == 0)
    build_ivfpq_index(
        seed, "vec_id", "embedding", "ivfpq_c", n_centroids=4, m=4,
        n_codes=16, num_buckets=2, path=str(tmp_path / "c"),
    )
    for lo, hi in ((1, 60), (61, 120), (121, 200)):
        append_to_ivfpq_index(
            emb.where(
                (F.col("vec_id") % 2 == 1)
                & F.col("vec_id").between(lo, hi)
            ),
            "vec_id", "embedding", "ivfpq_c", num_buckets=2,
        )
    queries = emb.where(F.col("vec_id") < 5)
    before = sorted(map(tuple, ivfpq_query_index(
        spark, "ivfpq_c", queries, "vec_id", "embedding", k=5, nprobe=4
    ).collect()))
    cb_before = load_pq_codebooks(spark, "ivfpq_c")
    rep = compact_ivfpq_index(spark, "ivfpq_c", path=str(tmp_path / "c"))
    assert rep["files_after"] < rep["files_before"]
    after = sorted(map(tuple, ivfpq_query_index(
        spark, "ivfpq_c", queries, "vec_id", "embedding", k=5, nprobe=4
    ).collect()))
    assert before == after and len(after) > 0
    np.testing.assert_array_equal(cb_before, load_pq_codebooks(spark, "ivfpq_c"))


def test_ivfpq_index_report_occupancy_and_bytes(spark, tmp_path):
    """Report fractions sum to 1, vector counts match the build, and
    bytes/vector == m — the compression claim, measured."""
    from bitfilters_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_report,
    )

    emb = spark.read.parquet(EMB).where(F.col("vec_id") < 300)
    build_ivfpq_index(
        emb, "vec_id", "embedding", "ivfpq_rep", n_centroids=8, m=8,
        n_codes=32, num_buckets=4, path=str(tmp_path / "rep"),
    )
    rep = ivfpq_index_report(spark, "ivfpq_rep").collect()
    assert sum(r["n_vecs"] for r in rep) == 300
    assert abs(sum(r["frac"] for r in rep) - 1.0) < 1e-9
    assert all(r["code_bytes"] == 8 * r["n_vecs"] for r in rep)
