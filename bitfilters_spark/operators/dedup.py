"""Deduplication operators: exact, MinHash+LSH, SimHash, exact shingle-Jaccard.

Scale posture (100 TB):
* exact dedup — one hash-shuffle on the fingerprint (map-side combine via
  partial aggregation is automatic for count/min).
* MinHash — signatures are computed with ``k`` seeded ``xxhash64`` min-
  aggregations over exploded shingles: entirely JVM, partial-aggregated
  map-side, so the only wide op is the per-doc groupBy. LSH banding then
  shuffles (band_id, band_hash) — tiny rows — and candidate verification
  joins back only the candidate pairs.
* SimHash — 64 conditional sums over exploded tokens, again JVM partial
  aggregation; near-pair blocking on 8-bit bands of the signature.

The DuckDB-parity variants (needed only when an external engine must
reproduce signatures bit-for-bit) swap xxhash64 for the Arrow-UDF
``duckdb_hash``; the native path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash, spark_hash64
from .text import tokens, word_shingles


# ---------------------------------------------------------------- exact ---


def dedup_exact(df: DataFrame, fingerprint_col, id_col: str) -> DataFrame:
    """Keep the lowest-id row per fingerprint (deterministic winner)."""
    w = Window.partitionBy(fingerprint_col).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_groups(df: DataFrame, fingerprint_col, id_col: str) -> DataFrame:
    """Per-fingerprint keeper + copy count (the dedup 'report' shape)."""
    return df.groupBy(fingerprint_col).agg(
        F.min(id_col).alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# -------------------------------------------------------------- minhash ---


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 64, shingle_n: int = 3
) -> DataFrame:
    """(id, sig array<long>) — k min-hash values over word shingles.

    Each permutation is ``xxhash64(shingle, seed_i)``; min-aggregated per
    doc. All JVM: explode -> k partial-aggregated mins, no Python."""
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("s")
    )
    aggs = [F.min(F.xxhash64("s", F.lit(i))).alias(f"m{i}") for i in range(k)]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"m{i}" for i in range(k)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs from LSH banding, verified with EXACT Jaccard over
    distinct shingle sets (so output pairs are exact-above-threshold; LSH
    only bounds recall). Returns (id_a, id_b, jaccard)."""
    r = k // bands
    sig = minhash_signatures(df, id_col, text_col, k, shingle_n)
    band_cols = [
        F.xxhash64(F.concat_ws(",", *[F.col("sig")[i] for i in range(b * r, (b + 1) * r)]))
        .alias(f"b{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    stacked = banded.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bh"))
                for b in range(bands)
            ])
        ).alias("e"),
    ).select("id", "e.band", "e.bh")
    a, b = stacked.alias("a"), stacked.alias("b")
    cands = (
        a.join(b, ["band", "bh"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    shset = df.select(
        F.col(id_col).alias("id"), F.array_distinct(word_shingles(text_col, shingle_n)).alias("sh")
    )
    sa = shset.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = shset.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


# ------------------------------------------------- exact shingle jaccard ---


def shingle_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """EXACT Jaccard over distinct word-shingle sets for every pair sharing
    >= 1 shingle (shingle-join blocking). Fully oracle-checkable.

    The shingle join is the wide op; with n-word shingles the blocking key
    cardinality is high, so candidate fan-out stays near the true-pair
    count rather than n^2."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("s"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "s")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# -------------------------------------------------------------- simhash ---


def simhash64(
    df: DataFrame, id_col: str, text_col: str, native: bool = True
) -> DataFrame:
    """64-bit SimHash over token occurrences -> (id, simhash: long).

    Bit b of the signature is 1 iff sum over tokens of (+1 if bit b of
    hash(token) else -1) is positive.  native=True hashes tokens with
    xxhash64 (JVM); False uses DuckDB-parity hashing so an external DuckDB
    can reproduce signatures bit-for-bit (that's the oracle-checked path)."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    h = spark_hash64("t") if native else duckdb_hash("v1.0.0", "t")
    tok = tok.select(id_col, h.alias("h"))
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(64)
        ]
    )
    # assemble the signed 64-bit value: bit 63 contributes -2^63 (two's complement)
    low = F.lit(0).cast("long")
    for b in range(63):
        low = low + F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    sign_term = F.when(F.col("s63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
    return sums.select(id_col, (low + sign_term).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8, native: bool = True
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming, blocked on 8-bit bands
    (a pair within hamming 7 shares at least one of 8 bands)."""
    sig = simhash64(df, id_col, text_col, native=native)
    bands = sig.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("simhash", i * 8).bitwiseAND(F.lit(255)).alias("bv"),
                )
                for i in range(8)
            ])
        ).alias("e"),
    ).select("id", "simhash", "e.band", "e.bv")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "bv"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
