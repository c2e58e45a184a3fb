"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship bloom-prefiltered join at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for the driver's correctness gate.

Column names are aliased identically on both sides (driver hashes values
after sorting columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitfilters_spark.functions import build_filter, probe_filter
from bitfilters_spark.functions.hashing import duckdb_hash, spark_hash64
from bitfilters_spark.sources import load_table

# DuckDB version whose hash algorithm the container oracle (duckdb==1.0.0)
# actually implements; see bitfilters_spark/core/hashing.py.
ORACLE_VERSION = "v1.0.0"

# ----------------------------------------------------------------- utils ---

_MURMUR_C = 0xD6E8FEB86659FD93


def _sql_wrap_mul_c(x: str) -> str:
    """DuckDB SQL for (x * MURMUR_C) mod 2**64 on UBIGINT (wrapping),
    via 32-bit split so no HUGEINT overflow."""
    c = _MURMUR_C
    c_lo = c & 0xFFFFFFFF
    return (
        f"((((({x}) % 4294967296)::HUGEINT * {c}::HUGEINT) + "
        f"((((({x}) // 4294967296) * {c_lo}) % 4294967296)::HUGEINT * 4294967296::HUGEINT))"
        f" % 18446744073709551616::HUGEINT)::UBIGINT"
    )


def _sql_combine(a: str, b: str) -> str:
    """Reference CombineHash(a, b) in DuckDB SQL: mix32-mul(a) ^ b."""
    t = f"xor(({a}), ({a}) >> 32)"
    return f"xor({_sql_wrap_mul_c(t)}, ({b}))"


def _sql_signed(u: str) -> str:
    """UBIGINT expression -> its two's-complement BIGINT value."""
    return (
        f"(({u})::HUGEINT - (CASE WHEN ({u}) > 9223372036854775807::HUGEINT "
        f"THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END))::BIGINT"
    )


def _member_count_query(kind: str, **kw) -> Callable[[SparkSession, str], DataFrame]:
    """Reference test shape (test/sql/bitfilters.test): build one filter per
    ``o_orderkey % 2`` group, probe every member, count hits per group.
    No false negatives => counts equal group sizes (the oracle)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        keyed = orders.select(
            (F.col("o_orderkey") % 2).alias("remainder"),
            spark_hash64("o_orderkey").alias("h"),
        )
        filters = build_filter(keyed, ["remainder"], "h", kind, **kw)
        return (
            probe_filter(keyed, filters, "h", on=["remainder"])
            .where(F.col("__contains"))
            .groupBy("remainder")
            .agg(F.count(F.lit(1)).alias("matches"))
        )

    return run


_MEMBER_ORACLE = (
    "SELECT o_orderkey % 2 AS remainder, count(*) AS matches "
    "FROM orders GROUP BY remainder"
)

# --------------------------------------------------------------- queries ---


def q_quotient_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _member_count_query("quotient", q=16, r=4)(spark, sf_dir)


def q_quotient_false_positives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe each group's quotient filter with the OTHER group's keys.
    Quotient-filter membership is exactly low-(q+r)-hash-bit membership, so
    with DuckDB-parity hashing the FP count is deterministic and the oracle
    computes it exactly via a signature semijoin."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        (F.col("o_orderkey") % 2).alias("grp"),
        duckdb_hash(ORACLE_VERSION, "o_orderkey").alias("h"),
    )
    filters = build_filter(keyed, ["grp"], "h", "quotient", q=16, r=4)
    # probe each row against the OTHER group's filter (2 groups)
    flipped = keyed.withColumn("remainder", F.lit(1) - F.col("grp"))
    return (
        probe_filter(flipped, filters, "h", on=["remainder"])
        .where(F.col("__contains"))
        .groupBy("remainder")
        .agg(F.count(F.lit(1)).alias("false_positives"))
    )


def q_xor8_members(spark, sf_dir):
    return _member_count_query("xor8")(spark, sf_dir)


def q_xor16_members(spark, sf_dir):
    return _member_count_query("xor16")(spark, sf_dir)


def q_fuse8_members(spark, sf_dir):
    return _member_count_query("fuse8")(spark, sf_dir)


def q_fuse16_members(spark, sf_dir):
    return _member_count_query("fuse16")(spark, sf_dir)


def q_bloom_members(spark, sf_dir):
    return _member_count_query("bloom", n=50_000, fpp=0.01)(spark, sf_dir)


def q_duckdb_bloom_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_bloom_filter_create + probe with values hashed inside the
    probe (multi-step reference workflow, docs/README.md §4)."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        (F.col("o_orderkey") % 2).alias("remainder"),
        "o_orderkey",
        duckdb_hash(ORACLE_VERSION, "o_orderkey").alias("h"),
    )
    filters = build_filter(keyed, ["remainder"], "h", "duckdb_bloom", num_sectors=16384)
    return (
        probe_filter(keyed, filters, "h", on=["remainder"])
        .where(F.col("__contains"))
        .groupBy("remainder")
        .agg(F.count(F.lit(1)).alias("matches"))
    )


def q_duckdb_hash_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", duckdb_hash(ORACLE_VERSION, "o_orderkey").alias("h")
    )


def q_duckdb_hash_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", duckdb_hash(ORACLE_VERSION, "text").alias("h"))


def q_duckdb_hash_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column CombineHash (reference semantics,
    bitfilters_duckdb_bloom_filter.cpp:171-174)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", duckdb_hash(ORACLE_VERSION, "user_id", "event_type").alias("h")
    )


def q_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline use case (docs/README.md 'Performance
    Benefits'): bloom-prefilter an expensive join. Probabilistic pre-filter
    + exact join == exact join, so the oracle is the plain join."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    hot = orders.where(F.col("o_totalprice") > 450000.0).select("o_orderkey")
    blobs = build_filter(
        hot.select(spark_hash64("o_orderkey").alias("h")), [], "h",
        "duckdb_bloom", num_sectors=16384,
    )
    prefiltered = (
        probe_filter(lineitem.withColumn("h", spark_hash64("l_orderkey")), blobs, "h")
        .where(F.col("__contains"))  # map-side ~90%+ row cut, no shuffle
        .drop("__contains", "h")
    )
    return (
        prefiltered.join(hot, prefiltered["l_orderkey"] == hot["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
    )


def q_filter_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter size comparison (reference 'Filter Comparison Example').
    Sizes are engine-specific -> rows-only check (no oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(spark_hash64("o_orderkey").alias("h"))
    frames = []
    for kind, kw in [
        ("quotient", {"q": 16, "r": 4}),
        ("xor8", {}),
        ("xor16", {}),
        ("fuse8", {}),
        ("fuse16", {}),
        ("bloom", {"n": 50_000, "fpp": 0.01}),
        ("duckdb_bloom", {"num_sectors": 16384}),
    ]:
        f = build_filter(keyed, [], "h", kind, **kw).select(
            F.lit(kind).alias("filter_type"), F.length("filter").alias("size_bytes")
        )
        frames.append(f)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# ---------------------------------------------------------------- driver ---


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: bloom-prefiltered join on sf0.001."""
    return q_filter_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_quotient_members": q_quotient_members,
        "q_quotient_false_positives": q_quotient_false_positives,
        "q_xor8_members": q_xor8_members,
        "q_xor16_members": q_xor16_members,
        "q_fuse8_members": q_fuse8_members,
        "q_fuse16_members": q_fuse16_members,
        "q_bloom_members": q_bloom_members,
        "q_duckdb_bloom_members": q_duckdb_bloom_members,
        "q_duckdb_hash_int": q_duckdb_hash_int,
        "q_duckdb_hash_str": q_duckdb_hash_str,
        "q_duckdb_hash_multi": q_duckdb_hash_multi,
        "q_filter_join": q_filter_join,
        "q_filter_sizes": q_filter_sizes,
    }


def oracle_sql() -> dict[str, str]:
    h_int = "hash(o_orderkey)"
    h_multi = _sql_combine("hash(user_id)", "hash(event_type)")
    return {
        "q_quotient_members": _MEMBER_ORACLE,
        "q_quotient_false_positives": """
            WITH keyed AS (
              SELECT o_orderkey % 2 AS grp, hash(o_orderkey) & 1048575 AS sig
              FROM orders),
            sigs AS (SELECT DISTINCT grp, sig FROM keyed)
            SELECT s.grp AS remainder, count(*) AS false_positives
            FROM keyed k JOIN sigs s ON s.sig = k.sig AND s.grp <> k.grp
            GROUP BY s.grp
        """,
        "q_xor8_members": _MEMBER_ORACLE,
        "q_xor16_members": _MEMBER_ORACLE,
        "q_fuse8_members": _MEMBER_ORACLE,
        "q_fuse16_members": _MEMBER_ORACLE,
        "q_bloom_members": _MEMBER_ORACLE,
        "q_duckdb_bloom_members": _MEMBER_ORACLE,
        "q_duckdb_hash_int": (
            f"SELECT o_orderkey, {_sql_signed(h_int)} AS h FROM orders"
        ),
        "q_duckdb_hash_str": (
            f"SELECT doc_id, {_sql_signed('hash(text)')} AS h FROM documents"
        ),
        "q_duckdb_hash_multi": (
            f"SELECT event_id, {_sql_signed(h_multi)} AS h FROM events"
        ),
        "q_filter_join": """
            SELECT l_returnflag, count(*) AS n_items,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_totalprice > 450000.0
            GROUP BY l_returnflag
        """,
    }
