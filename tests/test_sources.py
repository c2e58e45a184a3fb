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


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Tables bucketed on the join key co-locate: the join plan must contain
    no Exchange (the shuffle was paid once at write time)."""
    import contextlib
    import io as _io

    from bitfilters_spark.sources.io import read_table, write_bucketed

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed(
        orders, "b_orders", ["o_custkey"], num_buckets=8,
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "b_cust", ["o_custkey"], 8,
        path=str(tmp_path / "b_cust"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join must pick the co-located
        # SortMergeJoin path (at real scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_table(spark, "b_orders").join(read_table(spark, "b_cust"), "o_custkey")
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain(mode="formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and the join result is still correct
        want = orders.join(
            cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        ).count()
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_compact_files_merges_small_files(spark, tmp_path):
    """Many tiny files -> few target-sized files; content identical; with
    order_col the output files hold disjoint key ranges."""
    import glob

    from bitfilters_spark.sources.io import compact_files

    src = str(tmp_path / "frag")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.repartition(40).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 40

    dest = str(tmp_path / "compact")
    n = compact_files(spark, src, dest, target_file_bytes=64 * 1024)
    files = glob.glob(f"{dest}/part-*.parquet")
    assert len(files) == n and n < 40
    got = spark.read.parquet(dest)
    assert sorted(r["o_orderkey"] for r in got.collect()) == sorted(
        r["o_orderkey"] for r in orders.collect()
    )

    # ordered compaction: disjoint per-file key ranges
    dest2 = str(tmp_path / "compact_ordered")
    n2 = compact_files(
        spark, src, dest2, target_file_bytes=16 * 1024, order_col="o_orderkey"
    )
    assert n2 > 1  # the layout claim below needs several files
    stats = (
        spark.read.parquet(dest2)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in stats)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
