"""Golden composition (#116): the streaming prep pipeline — robust
ingest → exact dedup → filter build → indexed sink in one foreachBatch
fold — produces EXACTLY what the batch composition of the same stages
produces over the same rows: same surviving rows, same quarantined
lines, byte-identical filter blob, and a live file-skipping index that
prunes correctly. Plus the neardup-style replay contract: a committed
batch re-delivered is skipped; a crash before the marker re-runs
idempotently."""

import json

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bitfilters_spark.functions.filters import build_filter
from bitfilters_spark.sources.ingest import CORRUPT_COL
from bitfilters_spark.streaming import load_filter_blob
from bitfilters_spark.streaming.pipeline import (
    make_prep_pipeline_fold,
    streaming_prep_pipeline,
)

SCHEMA = "doc_id LONG, text STRING"


@pytest.fixture(scope="module", autouse=True)
def _few_state_partitions(spark):
    """See test_streaming.py: 2 shuffle partitions for stateful
    micro-batches — per-partition state-store overhead dominates
    3-row batches at the suite default of 8."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _lines(docs):
    out = []
    for d in docs:
        if isinstance(d, str):
            out.append(d)  # raw (possibly broken) line
        else:
            out.append(json.dumps({"doc_id": d[0], "text": d[1]}))
    return out


BATCHES = [
    _lines([(0, "alpha doc"), (1, "beta doc"), (2, "alpha doc"),
            "{broken json", (3, "gamma doc")]),
    _lines([(4, "beta doc"), (5, "delta doc"), "not json at all",
            (6, "epsilon doc"), (7, "delta doc")]),
    _lines([(8, "alpha doc"), (9, "zeta doc"), (10, "epsilon doc")]),
]


def _run_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    paths = {
        "out": str(tmp_path / "out"),
        "bad": str(tmp_path / "bad"),
        "blob": str(tmp_path / "corpus.bloom"),
        "index": str(tmp_path / "index"),
    }
    stream = spark.readStream.text(str(src))
    writer = streaming_prep_pipeline(
        stream, SCHEMA, paths["out"], paths["bad"], paths["blob"],
        paths["index"], n=10_000, fpp=0.01,
    ).option("checkpointLocation", str(tmp_path / "ckpt"))
    q = writer.start()
    try:
        for i, batch in enumerate(BATCHES):
            (src / f"b{i}.jsonl").write_text("\n".join(batch) + "\n")
            q.processAllAvailable()
    finally:
        q.stop()
    return paths


def _batch_composition(spark, tmp_path):
    """The same four stages, plain batch, over the union of all lines."""
    all_lines = [l for b in BATCHES for l in b]
    raw = spark.createDataFrame([(l,) for l in all_lines], "value string")
    full_schema = f"{SCHEMA}, {CORRUPT_COL} STRING"
    parsed = raw.select(
        F.col("value").alias("__raw"),
        F.from_json(
            "value", full_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("__p"),
    ).where(F.trim("__raw") != "")
    good = (
        parsed.where(F.col(f"__p.{CORRUPT_COL}").isNull())
        .select("__p.*").drop(CORRUPT_COL)
    )
    bad = parsed.where(F.col(f"__p.{CORRUPT_COL}").isNotNull()).select(
        F.col("__raw").alias("raw")
    )
    # first-seen == global min doc_id per fingerprint (ids increase with
    # arrival order in the fixture, the same requirement the streaming
    # dedup documents)
    deduped = (
        good.withColumn("fp_hash", F.xxhash64("text"))
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("fp_hash").orderBy("doc_id")),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    blob = bytes(
        build_filter(deduped, [], "fp_hash", "bloom", n=10_000, fpp=0.01)
        .collect()[0]["filter"]
    )
    return deduped, bad, blob


def test_stream_equals_batch_composition(spark, tmp_path):
    paths = _run_stream(spark, tmp_path)
    deduped_b, bad_b, blob_b = _batch_composition(spark, tmp_path)

    got = spark.read.parquet(paths["out"])
    want = {(r["doc_id"], r["text"], r["fp_hash"]) for r in deduped_b.collect()}
    have = {(r["doc_id"], r["text"], r["fp_hash"]) for r in got.collect()}
    assert have == want

    got_bad = {r["raw"] for r in spark.read.parquet(paths["bad"]).collect()}
    assert got_bad == {r["raw"] for r in bad_b.collect()}

    # the mergeable-family law, observed end-to-end: streamed folds ==
    # one batch build, byte-exact
    assert load_filter_blob(paths["blob"]) == blob_b

    # the index is live and prunes: one doc_id that landed in batch 2
    # only must resolve through skipping_read identically to a full scan
    from bitfilters_spark.sources.skipping import load_index, skipping_read

    idx = load_index(spark, paths["index"])
    assert idx.count() >= 1
    via_index = skipping_read(
        spark, paths["out"], "doc_id", [9], index=idx
    ).select("doc_id", "text").collect()
    full = got.where(F.col("doc_id") == 9).select("doc_id", "text").collect()
    assert [tuple(r) for r in via_index] == [tuple(r) for r in full]

    # decontamination against everything ever streamed, from the blob
    from bitfilters_spark.functions.filters import probe_filter

    newdocs = spark.createDataFrame(
        [(100, "alpha doc"), (101, "brand new doc")], "doc_id long, text string"
    ).withColumn("fp_hash", F.xxhash64("text"))
    probed = probe_filter(newdocs, {(): load_filter_blob(paths["blob"])}, "fp_hash")
    seen_flags = {r["doc_id"]: r["__contains"] for r in probed.collect()}
    assert seen_flags[100] is True  # alpha doc streamed in batch 0


def test_pipeline_replay_is_idempotent(spark, tmp_path):
    """Committed batches skip on re-delivery; a crash before the marker
    (simulated by deleting it) re-runs the fold with identical results."""
    fold = make_prep_pipeline_fold(
        SCHEMA,
        str(tmp_path / "out"),
        str(tmp_path / "bad"),
        str(tmp_path / "corpus.bloom"),
        str(tmp_path / "index"),
        n=10_000, fpp=0.01,
    )
    b0 = spark.createDataFrame([(l,) for l in BATCHES[0]], "value string")
    b1 = spark.createDataFrame([(l,) for l in BATCHES[1]], "value string")
    fold(b0, 0)
    fold(b1, 1)
    rows_before = sorted(
        (r["doc_id"], r["fp_hash"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    blob_before = load_filter_blob(str(tmp_path / "corpus.bloom"))

    fold(b1, 1)  # clean re-delivery: marker short-circuits
    # crash replay: wipe the marker, re-run the last batch
    (tmp_path / "index" / "_last_batch").unlink()
    fold(b1, 1)

    rows_after = sorted(
        (r["doc_id"], r["fp_hash"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert rows_after == rows_before
    assert load_filter_blob(str(tmp_path / "corpus.bloom")) == blob_before
