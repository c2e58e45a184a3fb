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
