"""Spark integration: build filters per group, probe via cross join —
the reference's own test query shapes (test/sql/bitfilters.test)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.functions import (
    build_filter,
    duckdb_bloom_probe,
    filter_contains,
)
from bitfilters_spark.functions.hashing import duckdb_hash, spark_hash64

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def _members_found(spark, orders, kind, **kw):
    keyed = orders.select(
        (F.col("o_orderkey") % 2).alias("grp"), spark_hash64("o_orderkey").alias("h")
    )
    filters = build_filter(keyed, ["grp"], "h", kind, **kw)
    probed = keyed.join(F.broadcast(filters), "grp")
    got = (
        probed.where(filter_contains("filter", "h"))
        .groupBy("grp")
        .count()
        .orderBy("grp")
        .collect()
    )
    want = keyed.groupBy("grp").count().orderBy("grp").collect()
    assert [r["count"] for r in got] == [r["count"] for r in want]


@pytest.mark.parametrize("kind,kw", [
    ("quotient", {"q": 16, "r": 4}),
    ("xor8", {}),
    ("xor16", {}),
    ("fuse8", {}),
    ("fuse16", {}),
    ("bloom", {"n": 2000, "fpp": 0.01}),
    ("duckdb_bloom", {"num_sectors": 2048}),
])
def test_members_all_found(spark, orders, kind, kw):
    _members_found(spark, orders, kind, **kw)


def test_global_filter_no_groups(spark, orders):
    keyed = orders.select(spark_hash64("o_orderkey").alias("h"))
    filt = build_filter(keyed, [], "h", "xor8")
    assert filt.count() == 1
    n = keyed.crossJoin(F.broadcast(filt)).where(filter_contains("filter", "h")).count()
    assert n == orders.count()


def test_quotient_fp_matches_duckdb_semantics(spark, orders):
    """FP rows (probing the other group's filter) must equal the exact
    low-20-bit signature semijoin computed by DuckDB — same hash, same
    truncation, so identical row sets."""
    keyed = orders.select(
        (F.col("o_orderkey") % 2).alias("grp"),
        duckdb_hash("v1.0.0", "o_orderkey").alias("h"),
    )
    filters = build_filter(keyed, ["grp"], "h", "quotient", q=16, r=4)
    fname = {r["grp"]: "even" if r["grp"] == 0 else "odd" for r in filters.collect()}
    assert set(fname.values()) == {"even", "odd"}
    cross = keyed.crossJoin(
        F.broadcast(filters.withColumnRenamed("grp", "fgrp"))
    ).where(F.col("grp") != F.col("fgrp"))
    got = (
        cross.where(filter_contains("filter", "h"))
        .groupBy("fgrp").count().orderBy("fgrp").collect()
    )
    want = duckdb.sql(f"""
        WITH keyed AS (
          SELECT o_orderkey % 2 AS grp, hash(o_orderkey) & 1048575 AS sig
          FROM read_parquet('{SF}/orders.parquet')),
        sigs AS (SELECT DISTINCT grp, sig FROM keyed)
        SELECT s.grp AS fgrp, count(*) AS fp
        FROM keyed k JOIN sigs s ON s.sig = k.sig AND s.grp <> k.grp
        GROUP BY s.grp ORDER BY s.grp
    """).fetchall()
    assert [(r["fgrp"], r["count"]) for r in got] == [(g, c) for g, c in want]


def test_duckdb_bloom_probe_hashes_values_itself(spark, orders):
    keyed = orders.select("o_orderkey", duckdb_hash("v1.0.0", "o_orderkey").alias("h"))
    filt = build_filter(keyed, [], "h", "duckdb_bloom", num_sectors=1024)
    n = (
        orders.crossJoin(F.broadcast(filt))
        .where(duckdb_bloom_probe("v1.0.0", "filter", "o_orderkey"))
        .count()
    )
    assert n == orders.count()


def test_mergeable_build_equals_bulk(spark, orders):
    """Two-phase (partials + merge) must equal a single-node bulk build."""
    import numpy as np
    from bitfilters_spark.core import bloom as B
    keyed = orders.select(spark_hash64("o_orderkey").alias("h")).repartition(6)
    blob = build_filter(keyed, [], "h", "duckdb_bloom", num_sectors=512).collect()[0]["filter"]
    hashes = np.array([r["h"] for r in keyed.collect()], dtype=np.int64).view(np.uint64)
    bulk = B.duckdb_bloom_serialize(B.duckdb_bloom_build(hashes, 512))
    assert bytes(blob) == bulk
