"""NULL semantics parity with the reference scalar functions
(test/sql/duckdb_bloom_filter.test:137-139: NULL input -> NULL hash) and
exactness of hashing on NULLABLE key columns (an int64 batch containing any
null must NOT degrade the other rows' hashes — the pandas float64 pitfall).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bitfilters_spark.functions import build_filter, probe_filter
from bitfilters_spark.functions.filters import duckdb_bloom_probe, filter_contains
from bitfilters_spark.functions.hashing import duckdb_hash

BIG = 9026766119380545768  # > 2**53: detects any float64 round-trip


@pytest.fixture(scope="module")
def nullable_ints(spark):
    return spark.createDataFrame(
        [Row(i=0, v=BIG), Row(i=1, v=None), Row(i=2, v=-1), Row(i=3, v=12345)],
        "i long, v long",
    )


def test_null_int_hashes_to_null_and_others_stay_exact(spark, nullable_ints):
    out = {
        r["i"]: r["h"]
        for r in nullable_ints.select("i", duckdb_hash("v1.0.0", "v").alias("h")).collect()
    }
    assert out[1] is None  # NULL propagates (reference :139)
    con = duckdb.connect()
    for i, v in ((0, BIG), (2, -1), (3, 12345)):
        u = con.execute(f"SELECT hash({v}::BIGINT)").fetchone()[0]
        expected = u - (1 << 64) if u >= (1 << 63) else u
        assert out[i] == expected, f"row {i}: null in batch degraded hash"


def test_null_string_and_multicol(spark):
    df = spark.createDataFrame(
        [Row(s="hello", t="x"), Row(s=None, t="x"), Row(s="hello", t=None)],
        "s string, t string",
    )
    rows = df.select(
        duckdb_hash("v1.0.0", "s").alias("h1"),
        duckdb_hash("v1.0.0", "s", "t").alias("h2"),
    ).collect()
    assert rows[0]["h1"] is not None and rows[0]["h2"] is not None
    assert rows[1]["h1"] is None and rows[1]["h2"] is None  # any-null -> null
    assert rows[2]["h1"] is not None and rows[2]["h2"] is None


def test_null_timestamp(spark):
    df = spark.sql(
        "SELECT CAST('2021-06-01 12:00:00' AS TIMESTAMP) AS ts "
        "UNION ALL SELECT CAST(NULL AS TIMESTAMP)"
    )
    rows = df.select(duckdb_hash("v1.0.0", "ts").alias("h")).collect()
    hs = sorted((r["h"] is None) for r in rows)
    assert hs == [False, True]
    con = duckdb.connect()
    u = con.execute("SELECT hash(TIMESTAMP '2021-06-01 12:00:00')").fetchone()[0]
    expected = u - (1 << 64) if u >= (1 << 63) else u
    assert {r["h"] for r in rows} == {expected, None}


def test_probe_null_propagates_and_build_skips_null(spark, nullable_ints):
    keyed = nullable_ints.select("i", duckdb_hash("v1.0.0", "v").alias("h"))
    blobs = build_filter(keyed, [], "h", "duckdb_bloom", num_sectors=64)
    probed = {r["i"]: r["__contains"] for r in probe_filter(keyed, blobs, "h").collect()}
    assert probed[1] is None  # NULL hash -> NULL contains
    assert probed[0] and probed[2] and probed[3]  # no false negatives
    # filter_contains path (blob joined as a column)
    joined = keyed.crossJoin(blobs.select("filter"))
    got = {
        r["i"]: r["c"]
        for r in joined.select("i", filter_contains("filter", "h").alias("c")).collect()
    }
    assert got[1] is None and got[0] and got[2] and got[3]
    # duckdb_bloom_probe hashes values internally: NULL value -> NULL
    vals = nullable_ints.crossJoin(blobs.select("filter"))
    got2 = {
        r["i"]: r["c"]
        for r in vals.select(
            "i", duckdb_bloom_probe("v1.0.0", "filter", "v").alias("c")
        ).collect()
    }
    assert got2[1] is None and got2[0] and got2[2] and got2[3]


def test_mixture_sample_null_stratum_dropped(spark):
    from bitfilters_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id long, src string"
    )
    kept = {r["src"] for r in mixture_sample(df, "id", "src", {"a": 1, "b": 1}).collect()}
    assert None not in kept  # NULL stratum has no threshold -> dropped


def test_contamination_null_and_empty_text(spark):
    from bitfilters_spark.operators.text import ngram_contamination

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, None), (3, "")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    got = {r["doc_id"] for r in ngram_contamination(docs, bench, n=5).collect()}
    assert got == {1}  # null/empty text yields no grams, hence no rows


def test_pack_shards_null_ids_sort_first_deterministically(spark):
    from bitfilters_spark.operators.packing import pack_shards

    df = spark.createDataFrame(
        [(None, 5), (1, 5), (2, 5)], "doc_id long, w long"
    )
    rows = {r["doc_id"]: r["prefix_weight"] for r in pack_shards(df, "doc_id", "w", 100).collect()}
    # NULL orders first in both engines' default ASC ordering
    assert rows[None] == 0 and rows[1] == 5 and rows[2] == 10
