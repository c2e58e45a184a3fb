"""Incremental-pipeline operators: snapshot diff and cross-corpus dedup."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.dedup import cross_dedup, snapshot_diff


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "ccc")], "doc_id long, fp string"
    )
    new = spark.createDataFrame(
        [(2, "bbb"), (3, "CHANGED"), (4, "ddd")], "doc_id long, fp string"
    )
    got = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(old, new, "doc_id", "fp").collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged


def test_snapshot_diff_accepts_column_fingerprint(spark):
    old = spark.createDataFrame([(1, "x y"), (2, "k l")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "x y"), (2, "k CHANGED")], "doc_id long, text string")
    got = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(old, new, "doc_id", F.xxhash64("text")).collect()
    }
    assert got == {2: "changed"}


def _jaccard(a, b, n=3):
    sa = {" ".join(a.split()[i : i + n]) for i in range(len(a.split()) - n + 1)}
    sb = {" ".join(b.split()[i : i + n]) for i in range(len(b.split()) - n + 1)}
    return len(sa & sb) / max(len(sa | sb), 1)


def test_cross_dedup_drops_only_reference_matches(spark):
    ref_text = "the cat sat on the mat and watched the birds outside all day"
    other = "completely different words about spark engines and parquet files here"
    new_rows = [
        (1, ref_text),  # exact copy of a reference doc -> dropped
        (2, ref_text + " with a tiny suffix appended"),  # near-dup -> dropped
        (3, other),  # novel -> kept
        (4, other),  # duplicates doc 3 (new-new) -> KEPT by contract
        (5, "short text"),  # < n tokens, no shingles -> kept
    ]
    ref_rows = [(1, ref_text), (9, "some other reference document text entirely unrelated")]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in cross_dedup(new, ref, "doc_id", "text", threshold=0.5).collect()
    }
    assert kept == {3, 4, 5}
    # sanity: the brute-force jaccards agree with the drop decisions
    assert _jaccard(new_rows[0][1], ref_text) >= 0.5
    assert _jaccard(new_rows[1][1], ref_text) >= 0.5
    assert all(
        _jaccard(t, rt) < 0.5
        for _, t in [new_rows[2], new_rows[4]]
        for _, rt in ref_rows
    )


def test_cross_dedup_then_self_dedup_composes(spark):
    """cross_dedup removes vs-reference dups; a following self near-dedup
    collapses the remaining new-new group."""
    from bitfilters_spark.operators.clustering import dedup_near
    from bitfilters_spark.operators.dedup import shingle_jaccard_pairs

    base = "one two three four five six seven eight nine ten eleven twelve"
    new = spark.createDataFrame(
        [(10, base), (11, base), (12, "different corpus text goes here now ok")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(1, "reference side text that matches nothing in the new corpus")],
        "doc_id long, text string",
    )
    stage1 = cross_dedup(new, ref, "doc_id", "text", threshold=0.5)
    assert stage1.count() == 3  # nothing matches the reference
    pairs = shingle_jaccard_pairs(stage1, "doc_id", "text", threshold=0.5)
    final = dedup_near(stage1, pairs, "doc_id")
    assert {r["doc_id"] for r in final.collect()} == {10, 12}


def test_dedup_best_keeps_highest_quality_copy(spark):
    from bitfilters_spark.operators.dedup import dedup_best, dedup_exact

    rows = [
        (1, "fp1", 0.2),
        (2, "fp1", 0.9),
        (3, "fp1", 0.9),  # tie -> lower id wins
        (4, "fp2", 0.5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, fp string, q double")
    best = {
        r["doc_id"]
        for r in dedup_best(
            df, "fp", [F.col("q").desc()], id_col="doc_id"
        ).collect()
    }
    assert best == {2, 4}
    # dedup_exact ≡ dedup_best ordered by id
    a = {r["doc_id"] for r in dedup_exact(df, "fp", "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in dedup_best(df, "fp", [F.col("doc_id").asc()]).collect()
    }
    assert a == b == {1, 4}


# -------------------------------------------------------- lsh index ---


def _lsh_corpus(spark):
    ref_text = "the cat sat on the mat and watched the birds outside all day"
    docs = [
        (1, ref_text),
        (2, "an entirely different reference document about query engines"),
        (3, "third reference text with its own vocabulary and shingle set"),
    ]
    new = [
        (101, ref_text),  # exact copy -> hit
        (102, ref_text + " plus a small suffix"),  # near-dup -> hit
        (103, "novel crawl document that matches no reference text at all"),
        (104, "novel crawl document that matches no reference text at all"),
    ]
    return (
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(new, "doc_id long, text string"),
    )


def test_lsh_index_probe_matches_full_corpus_run(spark, tmp_path):
    """Composition law: probing the persisted index with the new crawl
    returns exactly the cross-side pairs of a full minhash_lsh_pairs run
    over ref ∪ new (same permutations, band hashing, exact verify)."""
    from bitfilters_spark.operators.dedup import minhash_lsh_pairs
    from bitfilters_spark.operators.neardup_index import (
        build_lsh_index,
        dedup_against_index,
        probe_lsh_index,
    )

    ref, new = _lsh_corpus(spark)
    spark.sql("DROP TABLE IF EXISTS lshix_bands")
    spark.sql("DROP TABLE IF EXISTS lshix_shingles")
    build_lsh_index(ref, "doc_id", "text", "lshix", num_buckets=4,
                    path=str(tmp_path / "lshix"))

    got = {
        (r["new_id"], r["ref_id"], r["jaccard"])
        for r in probe_lsh_index(spark, new, "doc_id", "text", "lshix").collect()
    }
    full = minhash_lsh_pairs(
        ref.unionByName(new), "doc_id", "text", threshold=0.5
    ).collect()
    want = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]), r["jaccard"])
        for r in full
        if (r["id_a"] >= 100) != (r["id_b"] >= 100)  # cross-side only
    }
    assert got == want and len(got) == 2

    kept = {
        r["doc_id"]
        for r in dedup_against_index(spark, new, "doc_id", "text", "lshix").collect()
    }
    assert kept == {103, 104}  # new-new dup kept by the cross_dedup contract


def test_lsh_index_append_then_probe_sees_new_reference(spark, tmp_path):
    """append_to_lsh_index folds a crawl in with cost ∝ new data; the next
    probe must hit documents that only exist in the appended part."""
    from bitfilters_spark.operators.neardup_index import (
        append_to_lsh_index,
        build_lsh_index,
        probe_lsh_index,
    )

    ref, new = _lsh_corpus(spark)
    spark.sql("DROP TABLE IF EXISTS lshap_bands")
    spark.sql("DROP TABLE IF EXISTS lshap_shingles")
    build_lsh_index(ref, "doc_id", "text", "lshap", num_buckets=4,
                    path=str(tmp_path / "lshap"))
    appended = spark.createDataFrame(
        [(50, "freshly appended corpus text never seen in the original index")],
        "doc_id long, text string",
    )
    append_to_lsh_index(appended, "doc_id", "text", "lshap", num_buckets=4)
    probe = spark.createDataFrame(
        [(200, "freshly appended corpus text never seen in the original index")],
        "doc_id long, text string",
    )
    hits = probe_lsh_index(spark, probe, "doc_id", "text", "lshap").collect()
    assert {(r["new_id"], r["ref_id"]) for r in hits} == {(200, 50)}
    assert hits[0]["jaccard"] == 1.0


def test_lsh_index_probe_plan_never_shuffles_index_side(spark, tmp_path):
    """Bucketing the index tables on their join keys must eliminate the
    index-side shuffles: with broadcast disabled (at real scale neither
    side broadcasts), the probe against the bucketed index plans exactly
    two fewer Exchanges than the same probe against unbucketed copies —
    one saved per index table. Only the new side moves."""
    import re

    from bitfilters_spark.operators.neardup_index import (
        build_lsh_index,
        probe_lsh_index,
    )

    ref, new = _lsh_corpus(spark)
    spark.sql("DROP TABLE IF EXISTS lshpl_bands")
    spark.sql("DROP TABLE IF EXISTS lshpl_shingles")
    spark.sql("DROP TABLE IF EXISTS lshplflat_bands")
    spark.sql("DROP TABLE IF EXISTS lshplflat_shingles")
    build_lsh_index(ref, "doc_id", "text", "lshpl", num_buckets=4,
                    path=str(tmp_path / "lshpl"))
    # unbucketed copies of the same index tables
    for t in ("bands", "shingles"):
        spark.table(f"lshpl_{t}").write.mode("overwrite").option(
            "path", str(tmp_path / f"flat_{t}")
        ).saveAsTable(f"lshplflat_{t}")

    def n_exchanges(df):
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        return len(re.findall(r"\(\d+\) Exchange", buf.getvalue()))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = n_exchanges(
            probe_lsh_index(spark, new, "doc_id", "text", "lshpl")
        )
        flat = n_exchanges(
            probe_lsh_index(spark, new, "doc_id", "text", "lshplflat")
        )
        assert flat - bucketed == 2, (bucketed, flat)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
