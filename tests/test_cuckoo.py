"""Cuckoo filter (#122): kernel laws, Spark build/probe/merge/delete, and
the DuckDB-replayable placement-independent membership identity that backs
q_cuckoo_false_positives (fp + del legs)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.core import cuckoo as CK
from bitfilters_spark.functions import (
    build_filter,
    build_filters_multi,
    duckdb_hash,
    filter_describe,
    filter_remove,
    probe_filter,
)

NB, FB, BS = 1 << 14, 12, 4


def _keys(n, seed=7):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, 2**63, n, dtype=np.int64).view(np.uint64))


def _codes(hashes, nb, fb):
    h = hashes.astype(np.uint64)
    fp = (h >> np.uint64(32)) & np.uint64((1 << fb) - 1)
    fp = fp.copy()
    fp[fp == 0] = 1
    i1 = h & np.uint64(nb - 1)
    i2 = i1 ^ ((fp * np.uint64(0x5BD1E995)) & np.uint64(nb - 1))
    return (np.minimum(i1, i2) << np.uint64(16)) | fp


# ------------------------------------------------------------- kernel ---


def test_no_false_negatives_at_high_load():
    keys = _keys(80_000)[: int(NB * BS * 0.93)]
    blob = CK.ck_build(keys, NB, FB, BS)
    assert CK.ck_probe(blob, keys).all()


def test_probe_is_placement_independent_entry_code_membership():
    keys = _keys(40_000)
    blob = CK.ck_build(keys, NB, FB, BS)
    other = _keys(20_000, seed=11)
    other = other[~np.isin(other, keys)]
    want = np.isin(_codes(other, NB, FB), np.unique(_codes(keys, NB, FB)))
    assert (CK.ck_probe(blob, other) == want).all()


def test_fp_rate_tracks_2b_load_over_2f():
    keys = _keys(40_000)
    blob = CK.ck_build(keys, NB, FB, BS)
    other = _keys(50_000, seed=3)
    other = other[~np.isin(other, keys)]
    rate = CK.ck_probe(blob, other).mean()
    expect = 2 * len(keys) / NB / (1 << FB)  # 2*b*load / 2^f
    assert rate <= 4 * expect + 1e-4


def test_merge_equals_bulk_and_accepts_partials():
    keys = _keys(30_000)
    a, b = keys[: len(keys) // 2], keys[len(keys) // 2 :]
    whole = CK.ck_build(keys, NB, FB, BS)
    merged = CK.ck_merge([CK.ck_build(a, NB, FB, BS), CK.ck_build(b, NB, FB, BS)])
    assert np.array_equal(CK.ck_stored_codes(merged), CK.ck_stored_codes(whole))
    part = CK.ck_partial_serialize(CK.ck_entries(a, NB, FB), NB, FB, BS)
    merged2 = CK.ck_merge([part, CK.ck_build(b, NB, FB, BS)])
    assert np.array_equal(CK.ck_stored_codes(merged2), CK.ck_stored_codes(whole))


def test_merge_rejects_mixed_geometry():
    keys = _keys(100)
    with pytest.raises(ValueError, match="geometry"):
        CK.ck_merge([CK.ck_build(keys, NB, FB, BS), CK.ck_build(keys, NB // 2, FB, BS)])


def test_delete_is_exact_entry_set_difference():
    keys = _keys(30_000)
    blob = CK.ck_build(keys, NB, FB, BS)
    gone_keys = keys[:5_000]
    rm = CK.ck_remove(blob, gone_keys)
    keep = np.setdiff1d(
        np.unique(_codes(keys, NB, FB)), np.unique(_codes(gone_keys, NB, FB))
    )
    assert (CK.ck_probe(rm, keys) == np.isin(_codes(keys, NB, FB), keep)).all()


def test_overflow_raises_instead_of_dropping():
    keys = _keys(NB * BS * 2)[: int(NB * BS * 0.97)]
    with pytest.raises(ValueError, match="capacity|kicks"):
        CK.ck_build(keys, NB, FB, BS)


def test_geometry_validation():
    keys = _keys(16)
    with pytest.raises(ValueError, match="power of two"):
        CK.ck_build(keys, 1000, FB, BS)
    with pytest.raises(ValueError, match="fp_bits"):
        CK.ck_build(keys, NB, 17, BS)
    with pytest.raises(ValueError, match="bucket_size"):
        CK.ck_build(keys, NB, FB, 9)


def test_empty_build_probes_false():
    blob = CK.ck_build(np.zeros(0, dtype=np.uint64), NB, FB, BS)
    assert not CK.ck_probe(blob, _keys(100)).any()


# -------------------------------------------------- DuckDB oracle parity ---


def test_duckdb_replays_entry_codes_bit_exactly():
    h_i64 = np.random.default_rng(5).integers(-(2**63), 2**63 - 1, 10_000, dtype=np.int64)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"h": h_i64}))
    # DuckDB side computes on UBIGINT hash-space semantics via two's
    # complement BIGINT + masks — the exact expression q_cuckoo_* oracles use
    got = con.execute(
        f"""
        SELECT least(i1, xor(i1, (fp * 1540483477) & {NB - 1})) * 65536 + fp AS code
        FROM (
          SELECT CASE WHEN fp0 = 0 THEN 1 ELSE fp0 END AS fp, i1
          FROM (SELECT (h >> 32) & {(1 << FB) - 1} AS fp0, h & {NB - 1} AS i1 FROM t))
        """
    ).fetchnumpy()["code"].astype(np.uint64)
    assert np.array_equal(got, _codes(h_i64.view(np.uint64), NB, FB))


# ------------------------------------------------------------ Spark path ---


def test_spark_build_probe_members_and_fp(spark):
    df = spark.range(0, 8_000).select(
        (F.col("id") % 2).alias("grp"), duckdb_hash("v1.0.0", "id").alias("h")
    )
    flt = build_filter(df, ["grp"], "h", "cuckoo", nbuckets=NB, fp_bits=FB)
    assert probe_filter(df, flt, "h", on=["grp"]).where("__contains").count() == 8_000
    # cross-group probes replay the numpy entry-code membership exactly
    pdf = df.toPandas()
    codes0 = np.unique(_codes(pdf[pdf.grp == 0].h.to_numpy().view(np.uint64), NB, FB))
    cross1 = _codes(pdf[pdf.grp == 1].h.to_numpy().view(np.uint64), NB, FB)
    expect_fp = int(np.isin(cross1, codes0).sum())
    flipped = df.withColumn("g2", F.lit(1) - F.col("grp")).where("grp = 1")
    got = (
        probe_filter(flipped, flt.withColumnRenamed("grp", "g2"), "h", on=["g2"])
        .where("__contains")
        .count()
    )
    assert got == expect_fp


def test_spark_partial_merge_partition_invariance(spark):
    base = spark.range(0, 20_000).select(duckdb_hash("v1.0.0", "id").alias("h"))
    one = build_filter(base.coalesce(1), [], "h", "cuckoo", nbuckets=NB, fp_bits=FB)
    many = build_filter(base.repartition(13), [], "h", "cuckoo", nbuckets=NB, fp_bits=FB)
    b1 = CK.ck_stored_codes(bytes(one.collect()[0]["filter"]))
    b2 = CK.ck_stored_codes(bytes(many.collect()[0]["filter"]))
    assert np.array_equal(b1, b2)


def test_spark_filter_remove_and_describe(spark):
    df = spark.range(0, 6_000).select(
        F.lit(0).alias("grp"), "id", duckdb_hash("v1.0.0", "id").alias("h")
    )
    flt = build_filter(df, ["grp"], "h", "cuckoo", nbuckets=NB, fp_bits=FB)
    upd = filter_remove(flt, df.where("id % 3 = 0"), "h", on=["grp"])
    pdf = df.toPandas()
    all_codes = np.unique(_codes(pdf.h.to_numpy().view(np.uint64), NB, FB))
    gone = np.unique(
        _codes(pdf[pdf.id % 3 == 0].h.to_numpy().view(np.uint64), NB, FB)
    )
    keep = np.setdiff1d(all_codes, gone)
    survivors = (
        probe_filter(df, upd, "h", on=["grp"]).where("__contains").count()
    )
    assert survivors == int(
        np.isin(_codes(pdf.h.to_numpy().view(np.uint64), NB, FB), keep).sum()
    )
    desc = filter_describe(flt).collect()[0]
    assert desc["filter_kind"] == "cuckoo"
    assert desc["size_bytes"] == 10 + NB * BS * 2
    assert desc["n_entries"] == len(all_codes)
    assert abs(desc["fill_ratio"] - len(all_codes) / (NB * BS)) < 1e-12


def test_multi_build_matches_single(spark):
    df = spark.range(0, 5_000).select(duckdb_hash("v1.0.0", "id").alias("h"))
    multi = build_filters_multi(
        df, "h", [("ck", "cuckoo", {"nbuckets": NB, "fp_bits": FB, "bucket_size": BS})]
    ).collect()
    single = build_filter(df, [], "h", "cuckoo", nbuckets=NB, fp_bits=FB).collect()
    assert np.array_equal(
        CK.ck_stored_codes(bytes(multi[0]["filter"])),
        CK.ck_stored_codes(bytes(single[0]["filter"])),
    )
