"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents that look like a small
high-quality TARGET corpus, by importance weights over hashed n-gram
features.

The method is three bounded pieces, each with an obvious Spark shape:

1. **Feature distributions** (`fit_dsir`): hash every unigram/bigram
   into ``n_buckets`` buckets and estimate a multinomial over buckets
   for the raw corpus (q) and the target (p), add-1 smoothed. Each side
   is one explode + map-side-combined groupBy whose result is
   ``n_buckets`` rows — the corpus reduces to a fixed-size sufficient
   statistic, exactly like the BPE word table (`bpe.py`).
2. **Per-document weights** (`dsir_weights`): log w(x) = Σ_features
   (log p[b] − log q[b]) — an explode + broadcast join against the
   n_buckets-row ratio table + per-doc sum; ONE doc-id shuffle, the
   text column never moves.
3. **Resampling** (`dsir_select`): k docs without replacement with
   probability ∝ w(x) via the Gumbel-top-k trick, with the Gumbel noise
   derived from xxhash64(id, seed) — deterministic, replayable, no RNG
   state to distribute; the selection itself is a
   TakeOrderedAndProject (top-k), never a global sort.

At 100 TB: steps 1 and 2 are each one pass over the corpus with
fixed-size (n_buckets) driver/broadcast state; step 3 is top-k. Nothing
is quadratic and no driver materialization exceeds n_buckets rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bitfilters_spark.operators.text import tokens, word_shingles


def _feature_buckets(text_col, n_buckets: int, bigrams: bool = True) -> Column:
    """Array of hashed feature buckets for one document: unigrams plus
    (optionally) bigrams, xxhash64'd and folded into [0, n_buckets)."""
    # split("", " ") yields [""] — drop empty tokens so a blank document
    # has NO features (and therefore log-weight 0) instead of one
    # phantom unigram
    feats = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    if bigrams:
        feats = F.concat(feats, word_shingles(text_col, 2))
    return F.transform(
        feats, lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets))
    )


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, bigrams: bool
) -> DataFrame:
    """(bucket, n) — total feature occurrences per bucket, one
    map-side-combined aggregation; missing buckets are absent (the
    caller smooths)."""
    return (
        df.select(
            F.explode(_feature_buckets(text_col, n_buckets, bigrams)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def fit_dsir(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = 8192,
    bigrams: bool = True,
) -> DataFrame:
    """The bucket log-importance table: (bucket, log_ratio) for every
    bucket in [0, n_buckets), where log_ratio = log p̂_target[b] −
    log p̂_raw[b] with add-1 smoothing on both sides. n_buckets rows —
    broadcastable by construction; persist with plain
    ``.write.parquet`` and reuse across selection runs."""
    spark = raw.sparkSession
    p = _bucket_counts(target, text_col, n_buckets, bigrams)
    q = _bucket_counts(raw, text_col, n_buckets, bigrams)
    all_b = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = (
        all_b.join(p.withColumnRenamed("n", "np"), "bucket", "left")
        .join(q.withColumnRenamed("n", "nq"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("np", F.lit(0)).alias("np"),
            F.coalesce("nq", F.lit(0)).alias("nq"),
        )
    )
    tot = joined.agg(
        F.sum("np").alias("tp"), F.sum("nq").alias("tq")
    ).first()
    tp, tq = tot["tp"] + n_buckets, tot["tq"] + n_buckets
    return joined.select(
        "bucket",
        (
            F.log((F.col("np") + 1) / F.lit(float(tp)))
            - F.log((F.col("nq") + 1) / F.lit(float(tq)))
        ).alias("log_ratio"),
    )


def dsir_weights(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    bigrams: bool = True,
) -> DataFrame:
    """(id, log_weight) — log w(x) = Σ over the doc's features of the
    bucket log-ratio. The ratio table is broadcast into the join (it is
    n_buckets rows by contract); the only shuffle is the per-doc sum.
    Docs with zero features get log_weight 0.0 (weight 1 — no
    evidence), restored by the left join."""
    feats = df.select(
        F.col(id_col),
        F.explode(_feature_buckets(text_col, n_buckets, bigrams)).alias("bucket"),
    )
    sums = (
        feats.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.sum("log_ratio").alias("log_weight"))
    )
    return df.select(id_col).join(sums, id_col, "left").select(
        id_col, F.coalesce("log_weight", F.lit(0.0)).alias("log_weight")
    )


def dsir_feature_stats(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    bigrams: bool = True,
    parity: bool = False,
    materialize: bool = False,
) -> DataFrame:
    """(id, n_feats, n_pos) — per raw-corpus document: total hashed
    features and how many land in TARGET-LEANING buckets, i.e. buckets
    where the smoothed target rate exceeds the smoothed raw rate:
    (np+1)/tp > (nq+1)/tq  ⇔  (np+1)·tq > (nq+1)·tp  — evaluated in
    EXACT 64-bit integer arithmetic, so the result is reproducible
    bit-for-bit by any engine with the same hash (no float thresholds
    anywhere). This is the cross-engine-checkable core of the DSIR
    weight: sign(log_ratio) per feature.

    ``parity=True`` hashes features with the DuckDB-parity hash
    (Arrow UDF — the oracle path, like ``doc_fingerprint(native=False)``)
    instead of xxhash64; requires power-of-two ``n_buckets`` so the
    signed-bits pmod equals DuckDB's unsigned ``%``. Same plan shape as
    :func:`dsir_weights`: two n_buckets-row aggregations, a broadcast
    join, one doc-id shuffle.

    ``target`` may be a DataFrame (any corpus) or a Column predicate
    over ``raw`` — the predicate form computes np as a filtered count of
    the raw aggregation, no second corpus.

    The feature stream is consumed twice (bucket distributions, then the
    per-doc counts). ``materialize=True`` localCheckpoints the hashed
    stream between the passes — faster on small/mid corpora, but the
    stream is O(corpus tokens) rows, so at 100 TB the scale-safe default
    (False) re-derives it: CPU re-hash beats writing a token-scale
    intermediate."""
    if parity:
        if n_buckets & (n_buckets - 1):
            raise ValueError("parity=True requires power-of-two n_buckets")
        from bitfilters_spark.functions.hashing import duckdb_hash

        def bucket_of(tok):
            return F.pmod(duckdb_hash("v1.0.0", tok), F.lit(n_buckets))
    else:
        def bucket_of(tok):
            return F.pmod(F.xxhash64(tok), F.lit(n_buckets))

    uni = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    arr = F.concat(uni, word_shingles(text_col, 2)) if bigrams else uni

    def feats_of(df):
        return df.select(
            F.col(id_col), F.explode(arr).alias("__tok")
        ).select(id_col, bucket_of(F.col("__tok")).alias("bucket"))

    if isinstance(target, Column):
        # (id, bucket, is_t): one explode + one hash pass over raw, reused
        # by both aggregations below via the checkpoint (hashed features
        # are 17 bytes/row — far cheaper to keep than to re-hash)
        fr = raw.select(
            F.col(id_col), target.alias("__is_t"), F.explode(arr).alias("__tok")
        ).select(id_col, "__is_t", bucket_of(F.col("__tok")).alias("bucket"))
        if materialize:
            fr = fr.localCheckpoint(eager=False)
        counts = fr.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("nq"),
            F.count_if("__is_t").alias("np"),
        )
    else:
        fr, ft = feats_of(raw), feats_of(target)
        counts = (
            fr.groupBy("bucket").agg(F.count(F.lit(1)).alias("nq"))
            .join(
                ft.groupBy("bucket").agg(F.count(F.lit(1)).alias("np")),
                "bucket",
                "full",
            )
            .select(
                "bucket",
                F.coalesce("np", F.lit(0)).alias("np"),
                F.coalesce("nq", F.lit(0)).alias("nq"),
            )
        )
    tot = counts.agg(F.sum("np").alias("tp"), F.sum("nq").alias("tq")).first()
    tp, tq = int(tot["tp"]) + n_buckets, int(tot["tq"]) + n_buckets
    leaning = counts.select(
        "bucket",
        ((F.col("np") + 1) * F.lit(tq) > (F.col("nq") + 1) * F.lit(tp))
        .cast("int")
        .alias("pos"),
    )
    per_doc = (
        fr.join(F.broadcast(leaning), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    return raw.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.coalesce("n_pos", F.lit(0)).alias("n_pos"),
    )


def dsir_select(
    df: DataFrame,
    model: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    bigrams: bool = True,
    seed: int = 42,
    temperature: float = 1.0,
) -> DataFrame:
    """``n`` documents sampled WITHOUT replacement with probability
    ∝ w(x)^(1/temperature), via Gumbel-top-k: key = log w / T + G_i with
    G_i = −ln(−ln(u_i)) and u_i ∈ (0,1) derived from xxhash64(id, seed)
    — fully deterministic for a given seed, so reruns and audits see
    the same selection. Returns the selected rows of ``df`` plus their
    ``log_weight``.

    The top-n is a TakeOrderedAndProject (heap per partition, merge of
    n·P candidates), never a global sort; at temperature → 0 this
    degrades to greedy highest-weight selection."""
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    w = dsir_weights(df, model, id_col, text_col, n_buckets, bigrams)
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 53))
        .cast("double")
        + 0.5
    ) / float(1 << 53)
    gumbel = -F.log(-F.log(u))
    if temperature == 0:
        key = F.col("log_weight")
    else:
        key = F.col("log_weight") / F.lit(float(temperature)) + gumbel
    picked = (
        w.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col))
        .limit(n)
        .drop("__key")
    )
    return df.join(picked, id_col)
