"""Robust ingest: malformed JSONL/CSV records must neither kill the job
(FAILFAST) nor vanish silently (DROPMALFORMED) — good rows parse, bad
rows are counted and quarantined with their raw bytes and source file."""

import pytest


@pytest.fixture()
def jsonl_dir(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        '{"doc_id": 2, "text": "beta"}\n'
        "this is not json at all\n"
        '{"doc_id": 3, "text": "gamma"}\n'
    )
    (p / "b.jsonl").write_text(
        '{"doc_id": 4, "text": "delta"}\n'
        '{"doc_id": 5, "text": 12cannot}\n'
    )
    return str(p)


def test_split_corrupt_json(spark, jsonl_dir):
    from bitfilters_spark.sources.ingest import split_corrupt

    good, bad = split_corrupt(spark, jsonl_dir, "doc_id LONG, text STRING")
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "alpha", 2: "beta", 3: "gamma", 4: "delta"}
    badrows = bad.collect()
    assert len(badrows) == 2
    raws = {r["raw"] for r in badrows}
    assert "this is not json at all" in raws
    assert any("12cannot" in r for r in raws)
    assert all(r["source_file"].endswith((".jsonl",)) for r in badrows)


def test_robust_read_quarantines(spark, jsonl_dir, tmp_path):
    from bitfilters_spark.sources.ingest import ingest_report, robust_read

    q = str(tmp_path / "quarantine")
    good = robust_read(
        spark, jsonl_dir, "doc_id LONG, text STRING", quarantine_path=q
    )
    assert good.count() == 4
    quar = spark.read.parquet(q)
    assert quar.count() == 2
    assert set(quar.columns) == {"raw", "source_file", "fmt"}
    rep = ingest_report(spark, jsonl_dir, "doc_id LONG, text STRING")
    assert rep["good"] == 4 and rep["bad"] == 2
    assert len(rep["bad_files"]) == 2  # one bad record in each file
    assert all(n == 1 for n in rep["bad_files"].values())


def test_split_corrupt_csv(spark, tmp_path):
    from bitfilters_spark.sources.ingest import split_corrupt

    p = tmp_path / "csvs"
    p.mkdir()
    (p / "x.csv").write_text("1,alpha\n2,beta\nnot_a_long,gamma\n")
    good, bad = split_corrupt(
        spark, str(p), "doc_id LONG, text STRING", fmt="csv"
    )
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    assert [r["raw"] for r in bad.collect()] == ["not_a_long,gamma"]


def test_all_good_and_all_bad_edges(spark, tmp_path):
    from bitfilters_spark.sources.ingest import split_corrupt

    p = tmp_path / "edge"
    p.mkdir()
    (p / "good.jsonl").write_text('{"doc_id": 1, "text": "a"}\n')
    good, bad = split_corrupt(spark, str(p), "doc_id LONG, text STRING")
    assert good.count() == 1 and len(bad.collect()) == 0
    (p / "good.jsonl").write_text("garbage\nmore garbage\n")
    good, bad = split_corrupt(spark, str(p), "doc_id LONG, text STRING")
    # bad-side counts must reference `raw` (see split_corrupt caveat)
    from pyspark.sql import functions as F

    assert good.count() == 0
    assert bad.agg(F.count("raw")).collect()[0][0] == 2


def test_streaming_robust_ingest_splits_per_batch(spark, tmp_path):
    """Text-stream JSONL ingest: parsed rows land in the output dataset,
    garbage lines land in quarantine with their batch id, across
    micro-batches."""
    from bitfilters_spark.sources.ingest import streaming_robust_ingest

    src = tmp_path / "stream_in"
    src.mkdir()
    outp = str(tmp_path / "good")
    quar = str(tmp_path / "bad")
    ckpt = str(tmp_path / "ckpt")
    (src / "b1.txt").write_text(
        '{"doc_id": 1, "text": "alpha"}\nnot json\n{"doc_id": 2, "text": "beta"}\n'
    )
    stream = spark.readStream.text(str(src))
    q = (
        streaming_robust_ingest(stream, "doc_id LONG, text STRING", outp, quar)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b2.txt").write_text('{"doc_id": 3, "text": "gamma"}\n{broken\n')
        q.processAllAvailable()
    finally:
        q.stop()
    good = {r["doc_id"]: r["text"] for r in spark.read.parquet(outp).collect()}
    assert good == {1: "alpha", 2: "beta", 3: "gamma"}
    bad = sorted(r["raw"] for r in spark.read.parquet(quar).collect())
    assert bad == ["not json", "{broken"]
