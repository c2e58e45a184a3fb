"""Positional phrase index (operators/phrase_index.py): exact-phrase
search over a persisted positional postings table, the brute-force scan
twin, their equivalence, append maintenance, and the decontamination
composition."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.phrase_index import (
    append_to_phrase_index,
    build_phrase_index,
    phrase_contains,
    phrase_search,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown fox is quick the quick brown cat"),
    (3, "the the the repeated the the"),
    (4, "completely unrelated tokens here"),
    (5, "brown fox"),
]
PHRASES = [
    (10, "quick brown fox"),
    (11, "the quick"),
    (12, "the the"),          # repeated token phrase
    (13, "brown fox"),
    (14, "lazy dog jumps"),   # tokens present, order absent
    (15, "zebra"),            # absent token
    (16, ""),                 # empty phrase: dropped
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _phrases(spark):
    return spark.createDataFrame(PHRASES, "phrase_id long, phrase string")


def _expected():
    """Plain-Python rolling scan."""
    out = {}
    for pid, ph in PHRASES:
        q = ph.split()
        if not q:
            continue
        for did, text in DOCS:
            ts = text.split()
            starts = [
                i
                for i in range(len(ts) - len(q) + 1)
                if ts[i : i + len(q)] == q
            ]
            if starts:
                out[(pid, did)] = (len(starts), starts[0])
    return out


def test_phrase_search_matches_python_scan(spark, tmp_path):
    build_phrase_index(
        _docs(spark), "doc_id", "text", "ph_t1", num_buckets=4,
        path=str(tmp_path / "idx"),
    )
    got = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(spark, "ph_t1", _phrases(spark)).collect()
    }
    assert got == _expected()
    # notably: repeated-token phrase matches doc 3 with overlapping hits
    assert got[(12, 3)][0] >= 2
    # and order-absent phrases match nothing
    assert all(pid != 14 for pid, _ in got)


def test_phrase_contains_equivalence(spark, tmp_path):
    """Index probe ≡ the index-free scan on the same corpus."""
    build_phrase_index(
        _docs(spark), "doc_id", "text", "ph_t2", num_buckets=4,
        path=str(tmp_path / "idx"),
    )
    a = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(spark, "ph_t2", _phrases(spark)).collect()
    }
    b = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_contains(
            _docs(spark), "doc_id", "text", _phrases(spark)
        ).collect()
    }
    assert a == b


def test_phrase_index_append_and_guards(spark, tmp_path):
    half1 = _docs(spark).where("doc_id <= 2")
    half2 = _docs(spark).where("doc_id > 2")
    build_phrase_index(
        half1, "doc_id", "text", "ph_t3", num_buckets=4,
        path=str(tmp_path / "idx"),
    )
    append_to_phrase_index(half2, "doc_id", "text", "ph_t3", num_buckets=4)
    got = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(spark, "ph_t3", _phrases(spark)).collect()
    }
    assert got == _expected()
    with pytest.raises(ValueError, match="num_buckets"):
        append_to_phrase_index(half2, "doc_id", "text", "ph_t3", num_buckets=8)
    with pytest.raises(ValueError, match="identifier"):
        build_phrase_index(half1, "doc_id", "text", "bad-name;drop")
    with pytest.raises(ValueError, match="max_queries"):
        phrase_search(spark, "ph_t3", _phrases(spark), max_queries=2)
    # empty phrase set: typed empty result
    empty = spark.createDataFrame([], "phrase_id long, phrase string")
    assert phrase_search(spark, "ph_t3", empty).count() == 0


def test_phrase_search_pushes_terms_into_scan(spark, tmp_path):
    """The probe's postings scan carries an In(token, ...) pushed filter
    — non-query tokens never leave parquet (the bm25_query_index
    plan contract)."""
    build_phrase_index(
        _docs(spark), "doc_id", "text", "ph_t4", num_buckets=4,
        path=str(tmp_path / "idx"),
    )
    plan = phrase_search(
        spark, "ph_t4",
        spark.createDataFrame([(1, "quick brown")], "phrase_id long, phrase string"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "quick" in plan


def test_phrase_decontamination_composition(spark, tmp_path):
    """The use case: index the training corpus once, probe every eval
    sentence, drop the contaminated docs."""
    train = spark.createDataFrame(
        [
            (1, "some clean page about weather patterns"),
            (2, "the capital of france is paris said the exam"),
            (3, "more clean text entirely"),
        ],
        "doc_id long, text string",
    )
    build_phrase_index(
        train, "doc_id", "text", "ph_t5", num_buckets=2,
        path=str(tmp_path / "idx"),
    )
    evals = spark.createDataFrame(
        [(100, "the capital of france is paris")],
        "phrase_id long, phrase string",
    )
    dirty = phrase_search(spark, "ph_t5", evals).select("id").distinct()
    kept = train.join(dirty, train["doc_id"] == dirty["id"], "left_anti")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_phrase_index_compact_and_streaming_maintenance(spark, tmp_path):
    """Streaming folds accumulate a file-set per batch; compaction
    collapses them to one per bucket with probe results identical.
    Replayed batch ids no-op (the #133 marker contract)."""
    from bitfilters_spark.operators.phrase_index import compact_phrase_index
    from bitfilters_spark.streaming.index_maintenance import (
        phrase_maintenance_fold,
    )

    seed = _docs(spark).where("doc_id = 1")
    build_phrase_index(
        seed, "doc_id", "text", "ph_t6", num_buckets=2,
        path=str(tmp_path / "idx"),
    )
    markers = str(tmp_path / "markers")
    fold = phrase_maintenance_fold("doc_id", "text", "ph_t6", markers, 2)
    fold(_docs(spark).where("doc_id in (2, 3)"), 0)
    fold(_docs(spark).where("doc_id in (4, 5)"), 1)
    # replay: no double postings
    fold(_docs(spark).where("doc_id in (4, 5)"), 1)
    pre = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(spark, "ph_t6", _phrases(spark)).collect()
    }
    assert pre == _expected()
    stats = compact_phrase_index(spark, "ph_t6", path=str(tmp_path / "idx"))
    assert stats["files_after"] <= 2 < stats["files_before"]
    post = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(spark, "ph_t6", _phrases(spark)).collect()
    }
    assert post == pre


def test_two_indexes_one_external_path_coexist(spark, tmp_path):
    """Staging-namespace regression (r11 verdict finding 3): two phrase
    indexes built at the SAME external path= must not alternate over a
    shared `postings__stage_a/b` pair — the second build would
    mode-overwrite the first index's LIVE files. With name-prefixed
    staging bases both stay probe-correct."""
    shared = str(tmp_path / "shared")
    build_phrase_index(
        _docs(spark), "doc_id", "text", "ph_co_a", num_buckets=4, path=shared
    )
    # second index over a DIFFERENT corpus at the same path
    other = spark.createDataFrame(
        [(100, "zebra stripes zebra")], "doc_id long, text string"
    )
    build_phrase_index(
        other, "doc_id", "text", "ph_co_b", num_buckets=4, path=shared
    )
    # index A still answers from its own (un-clobbered) postings
    got = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(spark, "ph_co_a", _phrases(spark)).collect()
    }
    assert got == _expected()
    # index B answers its own corpus
    z = phrase_search(
        spark, "ph_co_b",
        spark.createDataFrame([(1, "zebra")], "phrase_id long, phrase string"),
    ).collect()
    assert [(r["id"], r["n_matches"]) for r in z] == [(100, 2)]
    # and rebuilds of A keep alternating inside A's own namespace
    build_phrase_index(
        _docs(spark), "doc_id", "text", "ph_co_a", num_buckets=4, path=shared
    )
    got2 = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(spark, "ph_co_a", _phrases(spark)).collect()
    }
    assert got2 == _expected()


def test_phrase_search_string_phrase_ids(spark, tmp_path):
    """phrase_search must preserve the caller's phrase_id type (ADVICE
    r11): string ids flow through identically to phrase_contains."""
    build_phrase_index(
        _docs(spark), "doc_id", "text", "ph_sid", num_buckets=4,
        path=str(tmp_path / "idx"),
    )
    sphrases = spark.createDataFrame(
        [("alpha", "quick brown fox"), ("beta", "the the")],
        "phrase_id string, phrase string",
    )
    a = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(spark, "ph_sid", sphrases).collect()
    }
    b = {
        (r["phrase_id"], r["id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_contains(
            _docs(spark), "doc_id", "text", sphrases
        ).collect()
    }
    assert a == b and a
    # empty phrase set keeps the string type too
    empty = spark.createDataFrame([], "phrase_id string, phrase string")
    res = phrase_search(spark, "ph_sid", empty)
    assert dict(res.dtypes)["phrase_id"] == "string"
