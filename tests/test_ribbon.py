"""Ribbon filter (core/ribbon.py — Dietzfelbinger & Walzer arXiv:1907.04750,
Dillinger & Walzer arXiv:2103.02515): the static AMQ sibling of xor/fuse at
a ~1.07x space multiplier. Kernel invariants + the Spark build/probe path
(PEELED machinery, sharded build, describe metadata)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.core.ribbon import (
    _geometry,
    ribbon_build,
    ribbon_describe,
    ribbon_probe,
)
from bitfilters_spark.functions import build_filter, filter_contains, probe_filter
from bitfilters_spark.functions.hashing import spark_hash64

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def keys():
    rng = np.random.default_rng(11)
    return rng.integers(0, 2**63, 60_000, dtype=np.int64).view(np.uint64)


@pytest.mark.parametrize("bits,bound", [(8, 2.5 / 256), (16, 2.5 / 65536)])
def test_kernel_no_false_negatives_and_fp_rate(keys, bits, bound):
    blob = ribbon_build(keys, bits)
    assert ribbon_probe(blob, keys).all(), "a member probed negative"
    rng = np.random.default_rng(13)
    other = rng.integers(0, 2**63, 120_000, dtype=np.int64).view(np.uint64)
    other = other[~np.isin(other, keys)]
    fp = ribbon_probe(blob, other).mean()
    assert fp <= bound, f"fp rate {fp} above ~2^-{bits} envelope"


def test_kernel_size_is_closed_form_and_below_xor(keys):
    """Size must be the documented closed form (header + (m + w) * bits/8
    with m = ceil(n / 0.935)) — seed retries never change the geometry —
    and beat xor8's ~1.23 B/key on the same keys."""
    from bitfilters_spark.core.xor import xor_build

    n = len(np.unique(keys))
    blob = ribbon_build(keys, 8)
    m = _geometry(n)
    assert len(blob) == 22 + (m + 64)
    assert len(blob) < len(xor_build(keys, 8))
    d = ribbon_describe(blob)
    assert d["filter_type"] == "ribbon8" and d["m"] == m


def test_kernel_build_is_deterministic(keys):
    assert ribbon_build(keys, 8) == ribbon_build(keys[::-1], 8)


def test_kernel_duplicate_keys_are_redundant_rows(keys):
    dup = np.concatenate([keys[:1000], keys[:1000], keys[:10]])
    blob = ribbon_build(dup, 8)
    assert ribbon_probe(blob, dup).all()
    assert len(blob) == 22 + (_geometry(1000) + 64)


@pytest.mark.parametrize("kind", ["ribbon8", "ribbon16"])
def test_spark_build_probe_members(spark, kind):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keyed = orders.select(
        (F.col("o_orderkey") % 2).alias("grp"), spark_hash64("o_orderkey").alias("h")
    )
    filters = build_filter(keyed, ["grp"], "h", kind)
    got = (
        probe_filter(keyed, filters, "h", on=["grp"])
        .where(F.col("__contains"))
        .groupBy("grp")
        .count()
    )
    want = keyed.groupBy("grp").count()
    assert {(r["grp"], r["count"]) for r in got.collect()} == {
        (r["grp"], r["count"]) for r in want.collect()
    }


def test_spark_sharded_build_members(spark):
    """num_shards rides the existing PEELED shard container: parallel
    sub-builds, SHRD-packed, membership still exact."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keyed = orders.select(spark_hash64("o_orderkey").alias("h"))
    filters = build_filter(keyed, [], "h", "ribbon8", num_shards=4)
    blob = bytes(filters.collect()[0]["filter"])
    assert blob[:4] == b"SHRD"
    n = (
        keyed.crossJoin(F.broadcast(filters))
        .where(filter_contains("filter", "h"))
        .count()
    )
    assert n == keyed.count()
