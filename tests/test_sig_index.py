"""Persisted binary-signature (Hamming) index (#177,
operators/ann_index.py): probe ≡ the in-session operators (shared
`_hamming_rank`/`_cosine_rerank` cores), append ≡ rebuild, loud guards,
staging-swap compaction."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _corpus(spark, n=60, d=64, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, d))
    df = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    return df


def test_sig_index_probe_equals_in_session(spark, tmp_path):
    """Coarse probe ≡ hamming_topk; re-rank probe ≡ hamming_rerank_topk
    — the persisted store and the in-session scan share their ranking
    cores, so the equality is row-for-row."""
    from bitfilters_spark.operators.ann_index import (
        build_sig_index,
        sig_query_index,
    )
    from bitfilters_spark.operators.similarity import (
        hamming_rerank_topk,
        hamming_topk,
    )

    df = _corpus(spark)
    queries = df.where(F.col("vec_id") < 5)
    spark.sql("DROP TABLE IF EXISTS sigix_sigs")
    build_sig_index(df, "vec_id", "embedding", "sigix", num_buckets=4,
                    path=str(tmp_path / "sigix"))

    got = sorted(map(tuple, sig_query_index(
        spark, "sigix", queries, k=4).collect()))
    want = sorted(map(tuple, hamming_topk(df, queries, k=4).collect()))
    assert got == want and len(got) == 20

    got_rr = sorted(map(tuple, sig_query_index(
        spark, "sigix", queries, k=4, rerank_overfetch=3).collect()))
    want_rr = sorted(map(tuple, hamming_rerank_topk(
        df, queries, k=4, overfetch=3).collect()))
    assert got_rr == want_rr and len(got_rr) == 20


def test_sig_index_append_equals_rebuild_and_guards(spark, tmp_path):
    """append-then-probe ≡ rebuild-over-union; bucket mismatch and
    missing-vector re-rank fail loudly; keep_vectors=False still serves
    the coarse pass."""
    from bitfilters_spark.operators.ann_index import (
        append_to_sig_index,
        build_sig_index,
        sig_query_index,
    )

    df = _corpus(spark, n=80)
    half1, half2 = df.where("vec_id < 40"), df.where("vec_id >= 40")
    queries = df.where(F.col("vec_id") < 3)
    for t in ("sigap_sigs", "sigfull_sigs", "signv_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    build_sig_index(half1, "vec_id", "embedding", "sigap", num_buckets=4,
                    path=str(tmp_path / "sigap"))
    append_to_sig_index(half2, "vec_id", "embedding", "sigap",
                        num_buckets=4)
    build_sig_index(df, "vec_id", "embedding", "sigfull", num_buckets=4,
                    path=str(tmp_path / "sigfull"))
    for kw in (dict(k=4), dict(k=4, rerank_overfetch=2)):
        got = sorted(map(tuple, sig_query_index(
            spark, "sigap", queries, **kw).collect()))
        want = sorted(map(tuple, sig_query_index(
            spark, "sigfull", queries, **kw).collect()))
        assert got == want and len(got) == 12

    with pytest.raises(ValueError, match="num_buckets"):
        append_to_sig_index(half2, "vec_id", "embedding", "sigap",
                            num_buckets=8)

    build_sig_index(df, "vec_id", "embedding", "signv", num_buckets=4,
                    keep_vectors=False, path=str(tmp_path / "signv"))
    got = sorted(map(tuple, sig_query_index(
        spark, "signv", queries, k=4).collect()))
    want = sorted(map(tuple, sig_query_index(
        spark, "sigfull", queries, k=4).collect()))
    assert got == want  # signatures alone serve the coarse ranking
    with pytest.raises(ValueError, match="keep_vectors"):
        sig_query_index(spark, "signv", queries, k=4, rerank_overfetch=2)


def test_sig_index_compact_preserves_probe(spark, tmp_path):
    """Compaction collapses append file-sets to one per bucket; probe
    rows (coarse AND re-ranked) identical before/after."""
    from bitfilters_spark.operators.ann_index import (
        append_to_sig_index,
        build_sig_index,
        compact_sig_index,
        sig_query_index,
    )

    df = _corpus(spark, n=90)
    queries = df.where(F.col("vec_id") < 3)
    spark.sql("DROP TABLE IF EXISTS sigcp_sigs")
    build_sig_index(df.where("vec_id < 30"), "vec_id", "embedding",
                    "sigcp", num_buckets=4, path=str(tmp_path / "sigcp"))
    for lo, hi in ((30, 60), (60, 90)):
        append_to_sig_index(
            df.where(f"vec_id >= {lo} and vec_id < {hi}"),
            "vec_id", "embedding", "sigcp", num_buckets=4,
        )
    before = sorted(map(tuple, sig_query_index(
        spark, "sigcp", queries, k=4, rerank_overfetch=2).collect()))
    stats = compact_sig_index(spark, "sigcp", path=str(tmp_path / "sigcp"))
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 4
    after = sorted(map(tuple, sig_query_index(
        spark, "sigcp", queries, k=4, rerank_overfetch=2).collect()))
    assert after == before


def test_streaming_sig_index_maintenance(spark, tmp_path):
    """Streaming signature maintenance: micro-batches pack and append;
    after the drain, probes (coarse AND re-ranked) equal a rebuild over
    the union — sign packing is model-free, so the equality is exact;
    replaying an applied batch id is a no-op."""
    from bitfilters_spark.operators.ann_index import (
        build_sig_index,
        sig_query_index,
    )
    from bitfilters_spark.streaming import (
        sig_maintenance_fold,
        streaming_sig_index,
    )

    df = _corpus(spark, n=80, seed=9)
    seed_df = df.where("vec_id % 2 = 0")
    rest = df.where("vec_id % 2 = 1")
    for t in ("ssig_sigs", "ssig_full_sigs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    build_sig_index(seed_df, "vec_id", "embedding", "ssig", num_buckets=4,
                    path=str(tmp_path / "ssig"))
    src = str(tmp_path / "in")
    rest.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(rest.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    markers = str(tmp_path / "markers")
    q = (
        streaming_sig_index(
            stream.select("vec_id", "embedding"), "vec_id", "embedding",
            "ssig", markers, num_buckets=4,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    build_sig_index(df, "vec_id", "embedding", "ssig_full", num_buckets=4,
                    path=str(tmp_path / "full"))
    queries = df.where(F.col("vec_id") < 4)
    for kw in (dict(k=4), dict(k=4, rerank_overfetch=2)):
        a = sorted(map(tuple, sig_query_index(
            spark, "ssig", queries, **kw).collect()))
        b = sorted(map(tuple, sig_query_index(
            spark, "ssig_full", queries, **kw).collect()))
        assert a == b and len(a) == 16
    # crash-replay: re-applying batch 0 must not duplicate rows
    n_before = spark.table("ssig_sigs").count()
    sig_maintenance_fold(
        "vec_id", "embedding", "ssig", markers, num_buckets=4
    )(rest.limit(5), 0)
    assert spark.table("ssig_sigs").count() == n_before == 80
