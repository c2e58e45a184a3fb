"""Content-defined chunking (#168, operators/cdc.py): partition law,
size bounds, mask-hit boundaries, shift invariance, and the dup report's
first-occurrence winner convention."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.cdc import (
    _boundaries,
    _gear_hashes,
    cdc_chunks,
    cdc_dup_report,
    gear_table,
)


def _mk_text(rng, n):
    return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))


def test_cdc_partition_law_and_bounds(spark):
    """Chunks partition each document exactly (concat == doc), every
    non-final length is within [min, max], and every non-forced cut
    sits on a gear-hash mask hit; identical inputs chunk identically
    across repartitioning (determinism)."""
    rng = np.random.default_rng(7)
    rows = [(i, _mk_text(rng, 200 + 300 * i)) for i in range(6)]
    rows.append((100, "tiny"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = cdc_chunks(df, "doc_id", "text", 32, 64, 256).collect()
    texts = dict(rows)
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    gear = gear_table()
    bits = int(round(np.log2(64)))
    mask = (1 << bits) - 1
    for did, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_id"])
        data = texts[did].encode("utf-8")
        # partition law (chunk_bytes is BINARY — exact at any boundary)
        assert b"".join(bytes(r["chunk_bytes"]) for r in rs) == data
        pos = 0
        h = _gear_hashes(np.frombuffer(data, dtype=np.uint8), gear)
        for i, r in enumerate(rs):
            assert r["start"] == pos
            pos += r["length"]
            if i < len(rs) - 1:
                assert 32 <= r["length"] <= 256
                end = r["start"] + r["length"]
                # a cut is a mask hit unless it was forced at max_size
                assert (int(h[end - 1]) & mask) == 0 or r["length"] == 256
        assert pos == len(data)
    again = cdc_chunks(
        df.repartition(5), "doc_id", "text", 32, 64, 256
    ).collect()
    key = lambda rws: sorted(
        (r["doc_id"], r["chunk_id"], r["start"], r["length"], r["chunk_hash"])
        for r in rws
    )
    assert key(again) == key(got)
    with pytest.raises(ValueError, match="min_size"):
        cdc_chunks(df, "doc_id", "text", 0, 64, 256)


def test_cdc_shift_invariance(spark):
    """The CDC property fixed-size chunking lacks: prepending a banner
    shifts every byte offset, yet most chunk HASHES survive, because
    boundaries re-synchronize right after the edit."""
    rng = np.random.default_rng(21)
    body = _mk_text(rng, 4000)
    df = spark.createDataFrame(
        [(1, body), (2, "INSERTED BANNER TEXT " * 3 + body)],
        "doc_id long, text string",
    )
    got = cdc_chunks(df, "doc_id", "text", 32, 64, 256, keep_bytes=False)
    h1 = {r["chunk_hash"] for r in got.where("doc_id = 1").collect()}
    h2 = {r["chunk_hash"] for r in got.where("doc_id = 2").collect()}
    shared = len(h1 & h2) / len(h1)
    assert shared >= 0.8, f"only {shared:.0%} of chunk hashes survived the shift"


def test_cdc_dup_report_winner_convention(spark):
    """First corpus-wide occurrence of a chunk stays unflagged; copies
    count with their byte mass. An exact duplicate document is ~100%
    dup bytes; an unrelated one ~0."""
    rng = np.random.default_rng(3)
    a = _mk_text(rng, 3000)
    b = _mk_text(rng, 3000)
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, b)], "doc_id long, text string"
    )
    rep = {
        r["doc_id"]: r
        for r in cdc_dup_report(df, "doc_id", "text", 32, 64, 256).collect()
    }
    assert rep[1]["n_dup_chunks"] == 0  # the winner copy
    assert rep[2]["n_dup_chunks"] == rep[2]["n_chunks"]
    assert rep[2]["dup_bytes"] == len(a.encode("utf-8"))
    assert rep[3]["n_dup_chunks"] == 0


def test_cdc_boundary_walk_pure():
    """_boundaries replay: forced cuts at max_size when no candidate is
    in range, first in-range candidate otherwise."""
    h = np.zeros(100, dtype=np.uint64)
    h[:] = 1  # no mask hits anywhere -> all cuts forced at max
    assert _boundaries(h, 100, 10, 30, 0xF) == [30, 60, 90, 100]
    h2 = np.ones(100, dtype=np.uint64)
    h2[19] = 0  # candidate cut AFTER position 19 => end 20
    h2[24] = 0  # inside the next chunk's min window -> skipped
    h2[54] = 0
    assert _boundaries(h2, 100, 10, 40, 0xF) == [20, 55, 95, 100]


def test_cdc_batched_hashing_exact_at_min64(spark):
    """r13 perf: min_size >= 64 switches to one batch-wide gear pass;
    results must equal the per-doc path exactly (contaminated window
    positions 0..62 can never be cut points when min_size >= 64) and be
    invariant to how docs co-batch."""
    rng = np.random.default_rng(13)
    rows = [(i, _mk_text(rng, 500 + 37 * i)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    key = lambda rws: sorted(
        (r["doc_id"], r["chunk_id"], r["start"], r["length"], r["chunk_hash"])
        for r in rws
    )
    a = key(cdc_chunks(df.coalesce(1), "doc_id", "text", 64, 128, 512).collect())
    b = key(cdc_chunks(df.repartition(7), "doc_id", "text", 64, 128, 512).collect())
    assert a == b and len(a) > 0
    # per-doc replay: run each doc alone (batch of one == per-doc math)
    singles = []
    for i, t in rows:
        one = spark.createDataFrame([(i, t)], "doc_id long, text string")
        singles += cdc_chunks(one, "doc_id", "text", 64, 128, 512).collect()
    assert key(singles) == a


def test_cdc_r13_review_fixes(spark):
    """r13 second review pass: (a) multi-byte text — binary chunks keep
    the partition law exact even when a cut splits a codepoint; (b) the
    TAIL honors mask-hit candidates (suffix-edited docs resynchronize);
    (c) string id columns work; (d) empty/NULL docs appear in the dup
    report with n_chunks = 0."""
    rng = np.random.default_rng(31)
    uni = "héllo wörld çafé ñiño — " * 150  # multi-byte everywhere
    rows = [("a", uni), ("b", _mk_text(rng, 900)), ("c", ""), ("d", None)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = cdc_chunks(df, "doc_id", "text", 32, 64, 128).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {"a", "b"}  # empty/NULL: no chunk rows
    for did, txt in rows[:2]:
        rs = sorted(by_doc[did], key=lambda r: r["chunk_id"])
        assert b"".join(bytes(r["chunk_bytes"]) for r in rs) == txt.encode("utf-8")
    # tail resync: body + suffix shares the body's tail-side cuts
    body = _mk_text(rng, 700)
    df2 = spark.createDataFrame(
        [(1, body), (2, body + _mk_text(rng, 500))], "doc_id long, text string"
    )
    ch = cdc_chunks(df2, "doc_id", "text", 64, 128, 1024, keep_bytes=False)
    h1 = {r["chunk_hash"] for r in ch.where("doc_id = 1").collect()}
    h2 = {r["chunk_hash"] for r in ch.where("doc_id = 2").collect()}
    # every chunk of doc 1 except (possibly) its final tail chunk is
    # also a chunk of doc 2 — the tail-candidate rule keeps shared cuts
    assert len(h1 & h2) >= len(h1) - 1
    # dup report covers EVERY input id, zeros for unchunkable docs
    rep = {r["doc_id"]: r for r in cdc_dup_report(df, "doc_id", "text").collect()}
    assert set(rep) == {"a", "b", "c", "d"}
    assert rep["c"]["n_chunks"] == 0 and rep["d"]["dup_bytes"] == 0


# ---------------------------------------------------------------------------
# Incremental CDC dedup: the persisted chunk-hash index (r14)
# ---------------------------------------------------------------------------


def _cdc_corpus(spark, seed=31):
    """ref = 6 docs; new = 2 re-crawls of ref docs with a prepended
    banner (chunk-sharing, the CDC point), 1 fresh doc, and 1 doc that
    near-copies the fresh one (new-new dup — must be KEPT by the
    against-index contract)."""
    rng = np.random.default_rng(seed)
    ref_rows = [(i, _mk_text(rng, 900 + 50 * i)) for i in range(6)]
    banner = "breaking banner added on the re-crawl * "
    fresh = _mk_text(rng, 900)
    new_rows = [
        (100, banner + ref_rows[0][1]),
        (101, banner + ref_rows[3][1]),
        (102, fresh),
        (103, fresh + " tail edit"),
    ]
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(ref_rows, schema),
        spark.createDataFrame(new_rows, schema),
    )


GEOM = dict(min_size=16, avg_size=64, max_size=256)


def test_cdc_index_probe_matches_in_session_accounting(spark, tmp_path):
    """Composition law: probe_cdc_index(new, index(ref)) returns exactly
    the accounting of an in-session join of new chunks against ref
    chunk hashes; cdc_dedup_against_index drops the banner re-crawls
    (chunk-shared) and keeps fresh + new-new-dup docs."""
    from bitfilters_spark.operators.cdc import (
        build_cdc_index,
        cdc_dedup_against_index,
        probe_cdc_index,
    )

    ref, new = _cdc_corpus(spark)
    spark.sql("DROP TABLE IF EXISTS cdcix_chunks")
    build_cdc_index(ref, "doc_id", "text", "cdcix", **GEOM,
                    num_buckets=4, path=str(tmp_path / "cdcix"))

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_bytes"], r["ref_dup_chunks"],
                      r["ref_dup_bytes"])
        for r in probe_cdc_index(
            spark, new, "doc_id", "text", "cdcix", **GEOM
        ).collect()
    }
    # in-session replay: chunk both sides, flag new chunks whose hash
    # appears anywhere in ref
    ref_hashes = {
        r["chunk_hash"]
        for r in cdc_chunks(ref, "doc_id", "text", **GEOM,
                            keep_bytes=False).collect()
    }
    want = {}
    for r in cdc_chunks(new, "doc_id", "text", **GEOM,
                        keep_bytes=False).collect():
        n, b, dn, db = want.get(r["doc_id"], (0, 0, 0, 0))
        hit = r["chunk_hash"] in ref_hashes
        want[r["doc_id"]] = (
            n + 1, b + r["length"], dn + hit, db + hit * r["length"]
        )
    assert got == want
    # the banner re-crawls share most bytes; fresh docs share ~none
    for d in (100, 101):
        assert got[d][3] / got[d][1] > 0.5, (d, got[d])
    for d in (102, 103):
        assert got[d][3] / got[d][1] < 0.3, (d, got[d])

    kept = {
        r["doc_id"]
        for r in cdc_dedup_against_index(
            spark, new, "doc_id", "text", "cdcix", threshold=0.5, **GEOM
        ).collect()
    }
    assert kept == {102, 103}  # new-new dup kept (cross_dedup contract)

    # NULL/empty docs: probe reports zeros, dedup keeps them
    weird = spark.createDataFrame(
        [(200, None), (201, "")], "doc_id long, text string"
    )
    rep = {
        r["doc_id"]: (r["n_chunks"], r["ref_dup_bytes"])
        for r in probe_cdc_index(
            spark, weird, "doc_id", "text", "cdcix", **GEOM
        ).collect()
    }
    assert rep == {200: (0, 0), 201: (0, 0)}
    assert cdc_dedup_against_index(
        spark, weird, "doc_id", "text", "cdcix", **GEOM
    ).count() == 2


def test_cdc_index_append_then_probe_equals_rebuild(spark, tmp_path):
    """append_to_cdc_index folds a crawl in at cost ∝ new data, and the
    result is INDISTINGUISHABLE from a rebuild over the union (chunking
    is per-document); geometry mismatches fail loudly."""
    import pytest as _pytest

    from bitfilters_spark.operators.cdc import (
        append_to_cdc_index,
        build_cdc_index,
        cdc_index_geometry,
        probe_cdc_index,
    )

    ref, new = _cdc_corpus(spark)
    ref1, ref2 = ref.where("doc_id < 3"), ref.where("doc_id >= 3")
    spark.sql("DROP TABLE IF EXISTS cdcap_chunks")
    spark.sql("DROP TABLE IF EXISTS cdcfull_chunks")
    build_cdc_index(ref1, "doc_id", "text", "cdcap", **GEOM,
                    num_buckets=4, path=str(tmp_path / "cdcap"))
    append_to_cdc_index(ref2, "doc_id", "text", "cdcap", **GEOM,
                        num_buckets=4)
    build_cdc_index(ref, "doc_id", "text", "cdcfull", **GEOM,
                    num_buckets=4, path=str(tmp_path / "cdcfull"))

    probe_ap = sorted(map(tuple, probe_cdc_index(
        spark, new, "doc_id", "text", "cdcap", **GEOM).collect()))
    probe_full = sorted(map(tuple, probe_cdc_index(
        spark, new, "doc_id", "text", "cdcfull", **GEOM).collect()))
    assert probe_ap == probe_full
    assert any(r[3] > 0 for r in probe_ap)  # hits exist through append

    assert cdc_index_geometry(spark, "cdcap") == {**GEOM, "num_buckets": 4}
    with _pytest.raises(ValueError, match="geometry"):
        probe_cdc_index(spark, new, "doc_id", "text", "cdcap",
                        min_size=16, avg_size=32, max_size=256)
    with _pytest.raises(ValueError, match="geometry"):
        append_to_cdc_index(ref2, "doc_id", "text", "cdcap", **GEOM,
                            num_buckets=8)


def test_cdc_index_compact_preserves_probe(spark, tmp_path):
    """compact_cdc_index collapses the append file-sets; probe rows and
    stored geometry are identical before/after."""
    from bitfilters_spark.operators.cdc import (
        append_to_cdc_index,
        build_cdc_index,
        cdc_index_geometry,
        compact_cdc_index,
        probe_cdc_index,
    )

    ref, new = _cdc_corpus(spark)
    spark.sql("DROP TABLE IF EXISTS cdccp_chunks")
    build_cdc_index(ref.where("doc_id < 2"), "doc_id", "text", "cdccp",
                    **GEOM, num_buckets=4, path=str(tmp_path / "cdccp"))
    for lo, hi in ((2, 4), (4, 6)):
        append_to_cdc_index(
            ref.where(f"doc_id >= {lo} and doc_id < {hi}"),
            "doc_id", "text", "cdccp", **GEOM, num_buckets=4,
        )
    before = sorted(map(tuple, probe_cdc_index(
        spark, new, "doc_id", "text", "cdccp", **GEOM).collect()))
    geom_before = cdc_index_geometry(spark, "cdccp")
    stats = compact_cdc_index(spark, "cdccp", path=str(tmp_path / "cdccp"))
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 4  # one file per bucket
    after = sorted(map(tuple, probe_cdc_index(
        spark, new, "doc_id", "text", "cdccp", **GEOM).collect()))
    assert after == before
    assert cdc_index_geometry(spark, "cdccp") == geom_before


def test_streaming_cdc_stats_fold_replay_and_compact(spark, tmp_path):
    """#150 pattern over chunk counts: a 3-batch fold equals one
    cdc_chunks pass over the union; a crash-replayed batch id no-ops;
    compaction collapses rows and leaves the fold identical; the 1-row
    dup report matches a direct replay."""
    from collections import Counter

    from bitfilters_spark.streaming.cdc import (
        cdc_stats_fold,
        compact_cdc_stats,
        streaming_cdc_dup_report,
        streaming_chunk_counts,
    )

    rng = np.random.default_rng(91)
    shared = _mk_text(rng, 500)
    rows = [(i, _mk_text(rng, 400 + 100 * i)) for i in range(9)]
    rows += [(50, shared), (51, shared)]  # cross-batch duplicate mass
    df = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "state")
    markers = str(tmp_path / "markers")
    fold = cdc_stats_fold("doc_id", "text", state, markers, **GEOM)
    assert streaming_chunk_counts(spark, state) is None
    batches = [df.where(f"doc_id % 3 = {i}") for i in range(3)]
    for i, b in enumerate(batches):
        fold(b, i)

    got = {
        r["chunk_hash"]: (r["n"], r["bytes"])
        for r in streaming_chunk_counts(spark, state).collect()
    }
    chunks = cdc_chunks(df, "doc_id", "text", **GEOM,
                        keep_bytes=False).collect()
    n_c, b_c = Counter(), Counter()
    for r in chunks:
        n_c[r["chunk_hash"]] += 1
        b_c[r["chunk_hash"]] += r["length"]
    want = {h: (n_c[h], b_c[h]) for h in n_c}
    assert got == want

    fold(batches[1], 1)  # crash-replayed batch id: must no-op
    assert {
        r["chunk_hash"]: (r["n"], r["bytes"])
        for r in streaming_chunk_counts(spark, state).collect()
    } == want

    rep = streaming_cdc_dup_report(spark, state).collect()[0]
    assert rep["n_chunks"] == len(chunks)
    assert rep["n_unique_chunks"] == len(want)
    assert rep["n_dup_chunks"] == len(chunks) - len(want)
    assert rep["total_bytes"] == sum(b for _, b in want.values())
    assert rep["dup_bytes"] == sum(
        b - b // n for n, b in want.values()
    )
    assert rep["n_dup_chunks"] > 0  # the planted 50/51 pair shares mass

    stats = compact_cdc_stats(spark, state)
    assert stats["rows_after"] <= stats["rows_before"]
    assert {
        r["chunk_hash"]: (r["n"], r["bytes"])
        for r in streaming_chunk_counts(spark, state).collect()
    } == want
