"""Source/sink round-trips: csv/json/parquet/orc readers and writers keep
data intact and stay declarative (format inferred from path)."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.sources import infer_format, read_any, write_any


@pytest.fixture(scope="module")
def sample(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, sample, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("io") / f"docs.{fmt}")
    write_any(sample, path)
    back = read_any(spark, path)
    a = {(r["doc_id"], r["lang"], r["n_chars"]) for r in sample.collect()}
    b = {(int(r["doc_id"]), r["lang"], int(r["n_chars"])) for r in back.collect()}
    assert a == b


def test_partitioned_write_prunes(spark, sample, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "bylang.parquet")
    write_any(sample, path, partition_by=["lang"])
    back = read_any(spark, path).where(F.col("lang") == "en")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain()
    assert "PartitionFilters" in buf.getvalue()
    assert back.count() == sample.where(F.col("lang") == "en").count()


def test_infer_format():
    assert infer_format("/a/b/x.jsonl") == "json"
    assert infer_format("/a/b/x.tsv") == "csv"
    with pytest.raises(ValueError):
        infer_format("/a/b/x.xyz")


def test_make_session_reuses_active(spark):
    from bitfilters_spark.session import make_session

    s = make_session(cpus=4)  # getOrCreate: reuses the test session
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"
