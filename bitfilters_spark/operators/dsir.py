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

import numpy as np
import pandas as pd
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

    ``parity=True`` hashes features with the DuckDB-parity hash (a
    distinct-string-memoized Arrow kernel over the feature ARRAY column
    — no explode feeds the UDF) instead of xxhash64; power-of-two
    ``n_buckets`` keeps both paths on the same unsigned-% geometry.

    ``target`` may be a DataFrame (any corpus) or a Column predicate
    over ``raw`` — the predicate form computes np as a filtered count of
    the raw aggregation, no second corpus.

    Plan shape (parity path): the JVM builds the feature arrays
    (higher-order fns in a plain projection); Python consumes them and
    emits only TINY columns — pass 1 reduces each Arrow batch to its
    nonzero bucket histogram (≤ n_buckets rows/batch, np.bincount),
    pass 2 emits (id, n_feats, n_pos) with the leaning mask broadcast
    as a numpy bool vector. No explode, no doc-id shuffle, no bucket
    arrays ever serialized back to the JVM; the only wide op is the
    n_buckets-row histogram sum, and the only driver materialization is
    n_buckets count rows (the classifier-gradient contract). The text is
    tokenized twice (once per pass) — deliberate: checkpointing the
    feature arrays between passes would store O(corpus tokens) values,
    the wrong trade at 100 TB. ``materialize`` is accepted for API
    stability but no longer changes the parity plan."""
    if parity and n_buckets & (n_buckets - 1):
        raise ValueError("parity=True requires power-of-two n_buckets")

    uni = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    arr = F.concat(uni, word_shingles(text_col, 2)) if bigrams else uni

    if parity:
        return _parity_feature_stats(raw, target, id_col, arr, n_buckets)

    native_ba = F.transform(
        arr, lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets))
    )

    def with_buckets(df, extra_name=None, extra=None):
        cols = [F.col(id_col)] + ([extra.alias(extra_name)] if extra_name else [])
        return df.select(*cols, native_ba.alias("__ba"))

    if isinstance(target, Column):
        fr = with_buckets(raw, "__is_t", target)
        if materialize:
            fr = fr.localCheckpoint(eager=False)
        counts = (
            fr.select("__is_t", F.explode("__ba").alias("bucket"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("nq"),
                F.count_if("__is_t").alias("np"),
            )
        )
    else:
        fr = with_buckets(raw)
        if materialize:
            fr = fr.localCheckpoint(eager=False)
        counts = (
            fr.select(F.explode("__ba").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("nq"))
            .join(
                with_buckets(target)
                .select(F.explode("__ba").alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("np")),
                "bucket",
                "full",
            )
            .select(
                "bucket",
                F.coalesce("np", F.lit(0)).alias("np"),
                F.coalesce("nq", F.lit(0)).alias("nq"),
            )
        )

    # leaning test resolved DRIVER-SIDE (n_buckets count rows — the
    # classifier-gradient collect contract) into ONE '0'/'1' string
    # literal (an array literal costs one py4j round trip PER element:
    # ~2s of pure driver time at 4096 buckets, measured); the per-doc
    # pass is then pure map-side array arithmetic — no doc-id shuffle.
    mask_str = _leaning_mask(counts.collect(), n_buckets)
    mask = F.lit(mask_str)
    is_pos = lambda b: (  # noqa: E731
        mask.substr((b + 1).cast("int"), F.lit(1)) == "1"
    )
    return fr.select(
        F.col(id_col),
        F.coalesce(F.size("__ba"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(
            F.size(F.filter("__ba", is_pos)), F.lit(0)
        ).cast("long").alias("n_pos"),
    )


def _leaning_mask(count_rows, n_buckets: int) -> str:
    """'0'/'1' per bucket: smoothed target rate > smoothed raw rate,
    exact integer comparison."""
    nq_v = [0] * n_buckets
    np_v = [0] * n_buckets
    for r in count_rows:
        nq_v[r["bucket"]] = r["nq"]
        np_v[r["bucket"]] = r["np"]
    tp, tq = sum(np_v) + n_buckets, sum(nq_v) + n_buckets
    return "".join(
        "1" if (np_v[b] + 1) * tq > (nq_v[b] + 1) * tp else "0"
        for b in range(n_buckets)
    )


def _hash_flat(s, n_buckets: int):
    """(lens, buckets) for a pandas Series of string arrays: flatten,
    DuckDB-parity hash once per DISTINCT string (factorize memo — the
    `bpe.py` encode trick; measured 30x on real corpora where features
    repeat heavily), unsigned-mod into buckets."""
    import pyarrow as pa

    from bitfilters_spark.functions.hashing import _hash_arrays

    lens = np.fromiter(
        (0 if x is None else len(x) for x in s), dtype=np.int64, count=len(s)
    )
    if lens.sum():
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in s if x is not None and len(x)]
        )
        codes, uniques = pd.factorize(pd.Series(flat))
        hu, _ = _hash_arrays((pa.array(uniques.tolist()),), "v1.0.0")
        buckets = (hu % np.uint64(n_buckets)).astype(np.int64)[codes]
    else:
        buckets = np.empty(0, dtype=np.int64)
    return lens, buckets


def _parity_feature_stats(
    raw: DataFrame, target, id_col: str, feats: Column, n_buckets: int
) -> DataFrame:
    """The DuckDB-parity-hash implementation of `dsir_feature_stats` —
    see its docstring for the plan shape. Python nodes are `mapInPandas`
    (a pandas_udf COLUMN can be collapsed into a downstream Generate by
    the optimizer, where Python eval crashes — observed on re-runs)."""
    spark = raw.sparkSession
    hist_schema = "bucket long, nq long, np long"

    def hist_of(df, is_t_col):
        cols = ([F.col(is_t_col)] if is_t_col else []) + [feats.alias("__feats")]
        src = df.select(*cols)

        def hist(batches):
            for pdf in batches:
                lens, buckets = _hash_flat(pdf["__feats"], n_buckets)
                if not len(buckets):
                    continue
                nq = np.bincount(buckets, minlength=n_buckets)
                if is_t_col:
                    ist = np.repeat(
                        pdf[is_t_col].to_numpy(dtype=bool), lens
                    )
                    np_h = np.bincount(buckets[ist], minlength=n_buckets)
                else:
                    np_h = np.zeros(n_buckets, dtype=np.int64)
                nz = np.nonzero(nq)[0]
                yield pd.DataFrame(
                    {"bucket": nz, "nq": nq[nz], "np": np_h[nz]}
                )

        return src.mapInPandas(hist, schema=hist_schema)

    if isinstance(target, Column):
        counts = (
            hist_of(raw.withColumn("__is_t", target), "__is_t")
            .groupBy("bucket")
            .agg(F.sum("nq").alias("nq"), F.sum("np").alias("np"))
        )
    else:
        counts = (
            hist_of(raw, None)
            .groupBy("bucket")
            .agg(F.sum("nq").alias("nq"))
            .join(
                hist_of(target, None)
                .groupBy("bucket")
                .agg(F.sum("nq").alias("np")),
                "bucket",
                "full",
            )
            .select(
                "bucket",
                F.coalesce("nq", F.lit(0)).alias("nq"),
                F.coalesce("np", F.lit(0)).alias("np"),
            )
        )
    mask = np.frombuffer(
        _leaning_mask(counts.collect(), n_buckets).encode(), dtype=np.uint8
    ) == ord("1")
    bmask = spark.sparkContext.broadcast(mask)

    out_schema = f"{id_col} long, n_feats long, n_pos long"
    src2 = raw.select(F.col(id_col), feats.alias("__feats"))

    def per_doc(batches):
        m = bmask.value
        for pdf in batches:
            lens, buckets = _hash_flat(pdf["__feats"], n_buckets)
            if len(buckets):
                # per-row sums as cumsum differences: exact for empty
                # rows anywhere (reduceat mis-handles repeated/trailing
                # boundary indices)
                csum = np.concatenate(
                    ([0], np.cumsum(m[buckets].astype(np.int64)))
                )
                offs = np.concatenate(([0], np.cumsum(lens)))
                npos = csum[offs[1:]] - csum[offs[:-1]]
            else:
                npos = np.zeros(len(pdf), dtype=np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "n_feats": lens,
                    "n_pos": npos,
                }
            )

    return src2.mapInPandas(per_doc, schema=out_schema)


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
