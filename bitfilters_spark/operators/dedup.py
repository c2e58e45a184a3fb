"""Deduplication operators: exact, MinHash+LSH, SimHash, exact shingle-Jaccard.

Scale posture (100 TB):
* exact dedup — one hash-shuffle on the fingerprint (map-side combine via
  partial aggregation is automatic for count/min).
* MinHash — signatures are computed with ``k`` seeded ``xxhash64`` min-
  aggregations over exploded shingles: entirely JVM, partial-aggregated
  map-side, so the only wide op is the per-doc groupBy. LSH banding then
  shuffles (band_id, band_hash) — tiny rows — and candidate verification
  joins back only the candidate pairs.
* SimHash — DuckDB-parity path computes whole signatures in one
  zero-shuffle ``mapInPandas`` numpy pass (tokenize + vectorized hash +
  popcount matrix); the native path is 64 conditional sums over exploded
  tokens in JVM partial aggregation. Near-pair blocking on signature
  bands (pigeonhole, full recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_hash64
from .text import hashed_word_shingles, tokens, word_shingles


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


_MERSENNE31 = (1 << 31) - 1  # prime field for affine permutations


def _minhash_perm_params(k: int, seed: int = 0x5EED):
    """Deterministic (a_i, b_i) for h_i(x) = (a_i*x + b_i) mod p, a_i != 0.
    With x < p < 2**31, a_i*x + b_i < 2**62 — no 64-bit overflow, so the
    whole permutation family runs as plain JVM long arithmetic."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(k)
    ]


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the input arrives
    under-partitioned (a small parquet scan can be 1-2 splits, which would
    serialize every compute-heavy map/partial-agg stage downstream). A
    real large scan already has plenty of partitions and skips the
    shuffle; the repartition moves pre-explode rows (documents), never
    the exploded token/shingle stream."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _band_hash_sql(b: int, r: int) -> str:
    """SQL string for one LSH band hash — xxhash64 over the band's
    ``r`` signature slots (identical tree to the Column-algebra form it
    replaced; string-built to avoid per-slot py4j round trips)."""
    cols = ",".join(f"sig[{i}]" for i in range(b * r, (b + 1) * r))
    return f"xxhash64(concat_ws(',',{cols}))"


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 64, shingle_n: int = 3
) -> DataFrame:
    """(id, sig array<long>) — k min-hash values over word shingles.

    Each shingle is hashed ONCE (``xxhash64``); the k permutations are
    derived as affine maps (a_i*h + b_i) mod (2^31-1) — cheap JVM integer
    arithmetic instead of k string hashes (string hashing dominates
    otherwise). Min-aggregated per doc with map-side partial aggregation:
    the only wide op is the per-doc groupBy, shuffling k longs per doc."""
    perms = _minhash_perm_params(k)
    p = F.lit(_MERSENNE31).cast("long")
    sh = ensure_parallelism(df).select(
        F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("s")
    )
    h = F.pmod(F.xxhash64("s"), p).alias("h")
    hashed = sh.select(id_col, h)
    # the k permutation aggregates are built as parsed SQL strings (r14):
    # the Column-algebra form cost ~8 py4j round trips per permutation
    # (~450 for k=64 — over a second of pure driver chatter per call);
    # F.expr hands the JVM one string each, and the parsed expression
    # tree (same literals, same BIGINT casts, same % remainder) is
    # identical, so signatures are bit-equal to the old form.
    aggs = [
        F.expr(
            f"min((CAST({a} AS BIGINT) * h + {b}) % "
            f"CAST({_MERSENNE31} AS BIGINT)) AS m{i}"
        )
        for i, (a, b) in enumerate(perms)
    ]
    sig = hashed.groupBy(id_col).agg(*aggs)
    arr = "array(" + ",".join(f"m{i}" for i in range(k)) + ") AS sig"
    return sig.select(F.col(id_col), F.expr(arr))


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
    # the signature plan feeds both sides of the band self-join and would
    # otherwise be computed twice (Spark has no automatic subplan reuse
    # across self-join branches); k longs per doc — tiny to cache
    sig = minhash_signatures(df, id_col, text_col, k, shingle_n).cache()
    # band hashes + the band/bh struct stack as parsed SQL strings (r14,
    # same py4j-chatter trim as minhash_signatures; identical expression
    # trees, so band hashes are bit-equal)
    band_cols = [
        F.expr(_band_hash_sql(b, r) + f" AS b{b}") for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    stack = ",".join(
        f"named_struct('band', {b}, 'bh', b{b})" for b in range(bands)
    )
    stacked = banded.select(
        F.col(id_col).alias("id"),
        F.expr(f"explode(array({stack}))").alias("e"),
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
    ).cache()  # referenced by both sides of the candidate-verify join
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
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
    prethin_hot: bool = False,
) -> DataFrame:
    """EXACT Jaccard over distinct word-shingle sets, shingle-join blocking.

    ``df_cap`` (document-frequency cap) is the skew guard: a shingle present
    in d documents produces d^2 candidate rows in the blocking self-join, so
    one hot shingle ("in the the of ...") goes quadratic at scale. Shingles
    with df > df_cap are excluded from BLOCKING ONLY; verification recomputes
    the intersection/union over the FULL shingle sets, so every emitted pair
    carries its exact Jaccard. Recall is complete whenever each qualifying
    pair shares at least one sub-cap shingle (guaranteed-in-practice for
    near-dup text; set df_cap=None for unconditional exactness).

    ``prethin_hot`` picks the skew-hardened physical strategy for the cap:
    the default window path computes df in the SAME shuffle the blocking
    join reuses (fewest stages), but it materializes every occurrence of a
    hot shingle in one task before the filter can drop it. With
    ``prethin_hot=True`` the (tiny, ≤ rows/df_cap entries) hot-shingle
    list is computed with a map-side-partial groupBy and BROADCAST, hot
    occurrences are dropped map-side before any wide shuffle, and the
    blocking join pays its own exchange over pre-thinned rows — two more
    stages, but no task ever holds a hot shingle's full occurrence list.
    Results are identical (tested); choose by the corpus's skew profile.
    """
    res = _shingle_pair_intersections(
        df, id_col, text_col, shingle_n, df_cap, prethin_hot
    )
    return (
        res.withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def shingle_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
    prethin_hot: bool = False,
) -> DataFrame:
    """EXACT shingle CONTAINMENT pairs — the asymmetric complement of
    :func:`shingle_jaccard_pairs` (Broder 1997 distinguishes resemblance
    from containment for exactly this reason): C(A,B) = |A∩B| / |A| finds
    a short document quoted or embedded inside a long one, where Jaccard
    = |A∩B| / |A∪B| is diluted to ~|A|/|B| and never crosses a useful
    threshold. The canonical training-data case: a tweet-sized page
    duplicated inside an aggregator page, boilerplate-wrapped re-posts,
    quote-heavy forum chains.

    Emits (id_a, id_b, c_ab, c_ba, containment) for every pair whose
    max-direction containment ``max(|A∩B|/|A|, |A∩B|/|B|) = |A∩B| /
    min(|A|,|B|)`` clears ``threshold`` (both directions carried so the
    caller can tell which side is the contained one). Same physical plan
    as the Jaccard operator — the pair-intersection core is SHARED
    (`_shingle_pair_intersections`): one df-computing window shuffle that
    pre-partitions the blocking self-join, map-side partial-agg of
    intersection counts, set sizes riding as group keys; ``df_cap`` /
    ``prethin_hot`` behave identically (verification exact over full
    shingle sets; recall complete while a qualifying pair shares one
    sub-cap shingle)."""
    res = _shingle_pair_intersections(
        df, id_col, text_col, shingle_n, df_cap, prethin_hot
    )
    return (
        res.withColumn(
            "containment",
            F.col("inter").cast("double") / F.least("n_a", "n_b"),
        )
        .where(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter").cast("double") / F.col("n_a"), 6).alias("c_ab"),
            F.round(F.col("inter").cast("double") / F.col("n_b"), 6).alias("c_ba"),
            F.round("containment", 6).alias("containment"),
        )
    )


def _shingle_pair_intersections(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    df_cap: int | None,
    prethin_hot: bool,
) -> DataFrame:
    """(id_a, id_b, n_a, n_b, inter) for every doc pair sharing >= 1
    (sub-cap) shingle — the shared blocking + exact-verification core of
    the Jaccard and containment pair operators (plan shape documented at
    :func:`shingle_jaccard_pairs`)."""
    from pyspark.sql import Window

    # work on 8-byte shingle hashes, not strings, and carry each doc's
    # distinct-shingle count alongside so |set| never needs its own
    # aggregation + re-join: it rides the blocking join as a group key
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(hashed_word_shingles(text_col, shingle_n)).alias("sarr"),
    ).select("id", F.size("sarr").alias("n"), F.explode("sarr").alias("s"))
    empty = F.array().cast("array<bigint>")
    if df_cap is not None and prethin_hot:
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > df_cap)
            .select("s")
        )
        cold = sh.join(F.broadcast(hot), "s", "left_anti").cache()
        hotsets = (
            sh.join(F.broadcast(hot), "s")
            .groupBy("id")
            .agg(F.collect_list("s").alias("hs"))
        )
    elif df_cap is not None:
        # ONE shuffle on s computes every shingle's document frequency AND
        # leaves the rows hash-partitioned by s — exactly the distribution
        # the blocking self-join needs, so the join adds no exchange.
        # SKEW CAVEAT: the window materializes every occurrence of a hot
        # shingle in one task BEFORE the df_cap filter can drop it, so a
        # pathologically hot shingle (≫ rows/partitions occurrences) skews
        # this stage even though its rows never reach the join. If that
        # profile is expected, pre-compute the (tiny) hot-shingle list with
        # a map-side partial groupBy + broadcast anti-filter first, then
        # run this window over the pre-thinned rows.
        # cache the post-window rows ONCE: cold (read twice by the blocking
        # self-join) and hotsets (read twice as ha/hb) are all filters over
        # this frame — without the cache the scan->explode->window pipeline
        # executed three times (r14: 26 Exchanges / 3x the window shuffle on
        # q_containment_pairs' plan; guide §2.4 "share one exchange")
        sh = sh.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("s"))
        ).cache()
        cold = sh.where(F.col("df") <= df_cap).drop("df")
        hotsets = (
            sh.where(F.col("df") > df_cap)
            .groupBy("id")
            .agg(F.collect_list("s").alias("hs"))
        )
    else:
        cold, hotsets = sh.cache(), None
    a, b = cold.alias("a"), cold.alias("b")
    # pair intersection over cold shingles: the groupBy partial-aggregates
    # map-side, so the wide shuffle carries (id_a, id_b, n_a, n_b, count)
    # longs only
    res = (
        a.join(b, "s")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    if hotsets is not None:
        # hot-shingle membership lists are bounded (≤ rows/df_cap shingles
        # are hot) — AQE broadcasts these joins
        ha = hotsets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
        hb = hotsets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
        res = (
            res.join(ha, "id_a", "left")
            .join(hb, "id_b", "left")
            .withColumn(
                "inter",
                F.col("ic")
                + F.size(
                    F.array_intersect(
                        F.coalesce("hs_a", empty), F.coalesce("hs_b", empty)
                    )
                ),
            )
        )
    else:
        res = res.withColumn("inter", F.col("ic"))
    return res.select("id_a", "id_b", "n_a", "n_b", "inter")


# ----------------------------------------------- weighted jaccard / ICWS ---


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 1,
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """EXACT weighted (term-frequency) Jaccard pairs:

        J_w(A, B) = sum_t min(tf_A(t), tf_B(t)) / sum_t max(tf_A(t), tf_B(t))

    The multiset generalization of set Jaccard (Ioffe 2010 §1): a doc that
    repeats a passage 5x and one that repeats it once are far apart here
    even though their shingle SETS are identical — the boilerplate/spam
    profile set-Jaccard is blind to. sum(max) never needs its own join:
    sum_t max = n_a + n_b - sum_t min (totals include each side's private
    terms, whose min is 0), so only sum(min) over SHARED terms is computed.

    Plan: (id, n, term-hash, tf) rows from one groupBy (n = the doc's
    total term count, taken from the pre-explode array size so no extra
    shuffle/window); blocking self-join on the 8-byte term hash; the pair
    groupBy partial-aggregates sum(least(tf_a, tf_b)) map-side with n_a,
    n_b riding as group keys — the `_shingle_pair_intersections` shape
    with weights. ``shingle_n=1`` weighs raw tokens (classic tf); larger n
    weighs shingles (near-dup use; sharply smaller document frequencies).

    ``df_cap``: same skew guard + recall caveat as `shingle_jaccard_pairs`
    — a term in d docs yields d^2 blocking rows, so terms with df >
    df_cap are excluded from BLOCKING only (a qualifying pair must share
    at least one sub-cap term to be found). Emitted values stay EXACT:
    each doc's hot-term tf rides as a map<hash,int> that is PER-MAP
    bounded (at most rows/df_cap distinct terms are hot), and sum(min)
    adds the hot mass back via map_zip_with. The hotmaps TABLE is not
    globally bounded — one row per document containing any hot term, so
    on a boilerplate-heavy corpus (every doc contains 'the') the two map
    joins are full-size equi-joins on the pair ids, not broadcasts; AQE
    broadcasts them only when the hot-doc set happens to be small."""
    src = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        (word_shingles(text_col, shingle_n) if shingle_n > 1 else tokens(text_col)).alias("ta"),
    )
    tok = (
        src.select("id", F.size("ta").alias("n"), F.explode("ta").alias("t"))
        .groupBy("id", "n", F.xxhash64("t").alias("th"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hotmaps = None
    if df_cap is not None:
        # cache the post-window rows ONCE: the sub-cap side feeds both
        # sides of the blocking self-join and the hot side both hotmap
        # joins — uncached, the scan->groupBy->window pipeline executed
        # four times (r14: 36 Exchanges / 8 parquet scans on
        # q_weighted_jaccard's plan; guide §2.4)
        tok = tok.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("th"))
        ).cache()
        hotmaps = (
            tok.where(F.col("df") > df_cap)
            .groupBy("id")
            .agg(F.map_from_entries(F.collect_list(F.struct("th", "c"))).alias("hm"))
        )
        tok = tok.where(F.col("df") <= df_cap).drop("df")
    a, b = tok.alias("a"), tok.alias("b")
    pairs = (
        a.join(b, "th")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.sum(F.least("a.c", "b.c")).alias("ism"))
    )
    if hotmaps is not None:
        empty = F.create_map().cast("map<bigint,bigint>")
        ha = hotmaps.select(F.col("id").alias("id_a"), F.col("hm").alias("hm_a"))
        hb = hotmaps.select(F.col("id").alias("id_b"), F.col("hm").alias("hm_b"))
        hot_ism = F.aggregate(
            F.map_values(
                F.map_zip_with(
                    F.coalesce("hm_a", empty),
                    F.coalesce("hm_b", empty),
                    lambda _, x, y: F.when(
                        x.isNotNull() & y.isNotNull(), F.least(x, y)
                    ).otherwise(F.lit(0).cast("long")),
                )
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        pairs = (
            pairs.join(ha, "id_a", "left")
            .join(hb, "id_b", "left")
            .withColumn("ism", F.col("ism") + hot_ism)
        )
    return (
        pairs.withColumn(
            "wjaccard",
            F.col("ism").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("ism")),
        )
        .where(F.col("wjaccard") >= threshold)
        .select("id_a", "id_b", F.round("wjaccard", 6).alias("wjaccard"))
    )


def _icws_kernel(th: "np.ndarray", w: "np.ndarray", k: int, seed: int):
    """Vectorized Ioffe 2010 consistent weighted sampling over one doc's
    (term-hash, weight) arrays -> k int64 sample codes. All randomness is
    counter-based (murmur-style mixes of term-hash x sample-index), so
    signatures are deterministic and agree across executors/engines.

    Ioffe's proof gives P[sig_A[j] == sig_B[j]] = J_w(A, B) under
    INDEPENDENT uniforms; here the five per-(term, j) variates are
    counter-based — each uniform runs its own salted avalanche over the
    pre-mix input (salt folded in BEFORE the finalizer, so variates are
    not bijections of one post-avalanche state) — making the collision
    probability J_w up to the PRNG approximation. The k=512 / 3.5-sigma
    statistical test (tests/test_weighted_jaccard.py) bounds, not
    eliminates, any residual bias; exact values come from the
    `weighted_jaccard_pairs` verification, never from the sketch."""
    import numpy as np

    C1 = np.uint64(0x9E3779B97F4A7C15)
    C2 = np.uint64(0xBF58476D1CE4E5B9)
    C3 = np.uint64(0x94D049BB133111EB)

    def mix(x):
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(30))) * C2
            x = (x ^ (x >> np.uint64(27))) * C3
            return x ^ (x >> np.uint64(31))

    js = (np.arange(k, dtype=np.uint64) + np.uint64(seed)) * C1
    with np.errstate(over="ignore"):
        pre = th[:, None] ^ js[None, :]  # (U, k) pre-avalanche state

    def unif(salt):
        # salt enters BEFORE the avalanche: each variate gets its own
        # full mix of (term, j, salt), not a remix of a shared output
        with np.errstate(over="ignore"):
            u = mix(pre ^ (np.uint64(salt) * C1))
        # map to (0,1): top 53 bits, never exactly 0
        return ((u >> np.uint64(11)).astype(np.float64) + 0.5) / 9007199254740992.0

    # Gamma(2,1) = -ln(u1*u2)
    r = -np.log(unif(1) * unif(2))
    c = -np.log(unif(3) * unif(4))
    beta = unif(5)
    lnw = np.log(w.astype(np.float64))[:, None]
    tk = np.floor(lnw / r + beta)
    lny = r * (tk - beta)
    lna = np.log(c) - lny - r
    best = np.argmin(lna, axis=0)  # (k,)
    with np.errstate(over="ignore"):
        code = mix(th[best] ^ mix(tk[best, np.arange(k)].astype(np.int64).view(np.uint64)))
    return code.view(np.int64)


def icws_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    shingle_n: int = 1,
    seed: int = 0x1C5,
) -> DataFrame:
    """(id, sig: array<bigint>[k]) — consistent-weighted-sampling sketch
    (Ioffe 2010): the weighted-minhash twin of `minhash_signatures`, with
    per-sample collision probability J_w (exact under Ioffe's i.i.d.
    assumption; counter-based determinism makes it an approximation —
    see `_icws_kernel`). One zero-shuffle
    mapInPandas pass: per-doc tf from numpy unique, the k samples from
    the vectorized counter-based kernel (term hashes memoized per batch:
    the randomness tables are per (term, j), shared across docs)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    id_type = df.schema[id_col].dataType
    schema = StructType(
        [StructField(id_col, id_type), StructField("sig", ArrayType(LongType()))]
    )
    src = ensure_parallelism(df).select(
        F.col(id_col),
        (word_shingles(text_col, shingle_n) if shingle_n > 1 else tokens(text_col)).alias("ta"),
    )

    def compute(batches):
        from ..core.hashing import hash_bytes

        for pdf in batches:
            if not len(pdf):
                continue
            ids, sigs = [], []
            # per-batch memo: term -> uint64 hash (hash each distinct once)
            all_terms = pd.factorize(
                np.array([t for ta in pdf["ta"] for t in ta], dtype=object)
            )
            codes, uniq = all_terms
            h_u = hash_bytes([t.encode() for t in uniq], "v1.0.0")
            off = 0
            for i, ta in zip(pdf[id_col], pdf["ta"]):
                m = len(ta)
                dc = codes[off : off + m]
                off += m
                if m == 0:
                    ids.append(i)
                    sigs.append(np.zeros(0, dtype=np.int64))
                    continue
                u, cnt = np.unique(dc, return_counts=True)
                sig = _icws_kernel(h_u[u], cnt.astype(np.float64), k, seed)
                ids.append(i)
                sigs.append(sig)
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return src.mapInPandas(compute, schema=schema)


def icws_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 1,
    threshold: float = 0.5,
    seed: int = 0x1C5,
) -> DataFrame:
    """Weighted-Jaccard near-dup pairs: ICWS signatures -> LSH banding ->
    EXACT weighted-Jaccard verification, so output values are exact and
    banding affects recall only (the `minhash_lsh_pairs` contract, on
    multiset similarity). Verification is pure JVM map algebra: each
    doc's tf map rides the candidate join as map<bigint,int>, sum(min)
    via map_zip_with + aggregate — candidate pairs move two tf maps,
    never text."""
    if k % bands != 0:
        raise ValueError(f"k={k} not divisible by bands={bands}")
    r = k // bands
    # cached because the signature plan feeds both sides of the band
    # self-join; k longs per doc. Deliberately NOT unpersisted: the
    # returned DataFrame's lineage still references the cached plan (an
    # eager unpersist would silently recompute signatures per side), so
    # the blocks live until the session drops them — same documented
    # lifetime trade as minhash_lsh_pairs; call
    # spark.catalog.clearCache() between suite-style repeated runs.
    sig = icws_signatures(df, id_col, text_col, k, shingle_n, seed).cache()
    # parsed-SQL band construction (r14) — see minhash_lsh_pairs
    band_cols = [
        F.expr(_band_hash_sql(b, r) + f" AS b{b}") for b in range(bands)
    ]
    stack = ",".join(
        f"named_struct('band', {b}, 'bh', b{b})" for b in range(bands)
    )
    stacked = sig.select(F.col(id_col).alias("id"), *band_cols).select(
        "id",
        F.expr(f"explode(array({stack}))").alias("e"),
    ).select("id", "e.band", "e.bh")
    a, b = stacked.alias("a"), stacked.alias("b")
    cands = (
        a.join(b, ["band", "bh"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    src = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        (word_shingles(text_col, shingle_n) if shingle_n > 1 else tokens(text_col)).alias("ta"),
    )
    # term occurrences are grouped BEFORE collecting so the tf map
    # carries counts and collect_list stays bounded by the doc's vocab
    tf = (
        src.select("id", F.size("ta").alias("n"), F.explode("ta").alias("t"))
        .groupBy("id", "n", F.xxhash64("t").alias("th"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id", "n")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("th", "c"))
            ).alias("tf")
        )
    )
    ta_ = tf.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"), F.col("tf").alias("tf_a"))
    tb_ = tf.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"), F.col("tf").alias("tf_b"))
    ism = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "tf_a", "tf_b",
                lambda _, x, y: F.when(
                    x.isNotNull() & y.isNotNull(), F.least(x, y)
                ).otherwise(F.lit(0)),
            )
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        cands.join(ta_, "id_a")
        .join(tb_, "id_b")
        .withColumn("__ism", ism)
        .withColumn(
            "wjaccard",
            F.col("__ism").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("__ism")),
        )
        .where(F.col("wjaccard") >= threshold)
        .select("id_a", "id_b", F.round("wjaccard", 6).alias("wjaccard"))
    )


# -------------------------------------------------------------- simhash ---


def simhash64(
    df: DataFrame, id_col: str, text_col: str, native: bool = True
) -> DataFrame:
    """64-bit SimHash over token occurrences -> (id, simhash: long).

    Bit b of the signature is 1 iff sum over tokens of (+1 if bit b of
    hash(token) else -1) is positive.

    native=False (DuckDB-parity hashing, the oracle-checked path) computes
    the WHOLE signature in one zero-shuffle ``mapInPandas`` pass: tokenize
    + vectorized numpy hash + per-doc popcount matrix. This beats the
    explode → 64-wide groupBy by >2× — the wide aggregation buffer, not
    the hashing, dominates the SQL formulation. native=True keeps the
    all-JVM expression path (xxhash64 has no numpy twin here), whose
    signatures only need to be self-consistent.
    """
    if not native:
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import LongType, StructField, StructType

        id_type = df.schema[id_col].dataType
        schema = StructType(
            [StructField(id_col, id_type), StructField("simhash", LongType())]
        )

        def compute(batches):
            from ..core.hashing import hash_bytes

            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf[id_col]
                toks = [t.split(" ") for t in pdf[text_col]]
                counts = np.array([len(t) for t in toks])
                # hash each DISTINCT token once (corpora repeat tokens
                # heavily — the occurrence/vocab ratio is the speedup),
                # then gather per occurrence; unpackbits expands the 64
                # hash bits ~10x faster than the shift-loop broadcast
                codes, uniq = pd.factorize(
                    np.array([w for ts in toks for w in ts], dtype=object)
                )
                h_u = hash_bytes([w.encode() for w in uniq], "v1.0.0")
                bits_u = np.unpackbits(
                    h_u.view(np.uint8).reshape(-1, 8),
                    axis=1,
                    bitorder="little",
                ).astype(np.int32)
                # per-doc popcounts: segment-sum of the gathered bit rows
                # (reduceat — one pass, no (tokens, 64) cumsum buffer);
                # split(" ") yields >= 1 token even on "", so every
                # segment is non-empty and reduceat's empty-segment
                # identity-copy case can't arise
                bounds = np.zeros(len(ids) + 1, dtype=np.int64)
                np.cumsum(counts, out=bounds[1:])
                pop = np.add.reduceat(bits_u[codes], bounds[:-1], axis=0)
                sig_bits = (2 * pop - counts[:, None]) > 0
                vals = np.zeros(len(ids), dtype=np.uint64)
                for b in range(64):
                    vals |= sig_bits[:, b].astype(np.uint64) << np.uint64(b)
                yield pd.DataFrame({id_col: ids, "simhash": vals.view(np.int64)})

        src = ensure_parallelism(df.select(id_col, text_col))
        return src.mapInPandas(compute, schema=schema)

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    tok = tok.select(id_col, spark_hash64("t").alias("h"))
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


def simhash_banding(max_hamming: int) -> tuple:
    """Pick (n_bands, probe_radius, widths, starts) for exact-recall banding.

    ASYMMETRIC multi-probe over wide bands: an index side emits each
    band's exact value; a probe side emits every value within hamming
    ``probe_radius`` of its band value. A pair collides on a band iff the
    band values differ in <= probe_radius bits, with multiplicity exactly
    1 per such band (the probe set contains the single index value) — so
    candidate rows ∝ matching pairs × n_bands, never × probe count.

    Recall proof (pigeonhole by averaging): a pair with total hamming
    <= h has some band with <= floor(h / n_bands) differing bits, so any
    ``probe_radius >= floor(h / n_bands)`` loses no qualifying pair.
    Exact ``bit_count(xor)`` verification runs on every candidate, so
    banding affects cost only, never the answer.

    Band count picks the WIDEST bands with per-band budget <= 2
    (``b = h // 3 + 1``): for the default h=8 that is 3 bands of
    22/21/21 bits — ~2^21 distinct bucket values per band versus the
    2^7 = 128 that h+1 exact-match bands would allow (128 values force
    Θ(n/128) bucket occupancy and a quadratic self-join at scale). For
    h <= 2, h+1 exact bands (radius 0) are already >= 21 bits wide.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError("max_hamming must be in [0, 63]")
    if max_hamming <= 2:
        n_bands = max_hamming + 1
    else:
        n_bands = max_hamming // 3 + 1
    radius = max_hamming // n_bands
    base, extra = divmod(64, n_bands)  # band widths: `extra` bands get +1 bit
    widths = [base + 1] * extra + [base] * (n_bands - extra)
    starts = [sum(widths[:i]) for i in range(n_bands)]
    return n_bands, radius, widths, starts


def _probe_masks(width: int, radius: int) -> list:
    """All XOR masks of the given bit-width with popcount <= radius."""
    masks = [0]
    if radius >= 1:
        masks += [1 << j for j in range(width)]
    if radius >= 2:
        masks += [(1 << j) | (1 << k) for j in range(width) for k in range(j + 1, width)]
    if radius >= 3:  # pragma: no cover - default h=8 never reaches radius 3
        import itertools

        masks = [
            sum(1 << j for j in c)
            for r in range(radius + 1)
            for c in itertools.combinations(range(width), r)
        ]
    return masks


def _signed64(v: int) -> int:
    """Wrap an unsigned 64-bit literal into Spark's signed LongType (a
    64-bit all-ones mask is -1 in two's complement)."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= 1 << 63 else v


def simhash_pairs_from_sigs(
    sig: DataFrame, id_col: str, max_hamming: int = 8,
    n_rows: int | None = None,
) -> DataFrame:
    """Exact {(id_a, id_b, hamming): hamming <= max_hamming} from a
    ``(id, simhash)`` DataFrame via asymmetric multi-probe banding (see
    :func:`simhash_banding` for the recall math). Every candidate is
    verified with an exact ``bit_count(xor)``, so banding only affects
    cost, never the answer.

    Plan shape: the index side is n_bands rows/doc; the probe side is
    n_bands × |probe masks| rows/doc (untouched by any shuffle — the
    index side is small enough for AQE to broadcast at moderate n, and at
    cluster scale the equi-join shuffles only (band, bv) keyed rows).
    Candidate output ∝ true pairs × n_bands + hash-collision noise
    (∝ n²·probes/2^width), NOT Θ(n²/values) as exact narrow bands give.

    When ``n_rows`` is omitted, the broadcast size gate COUNTS ``sig`` —
    one extra job that re-runs the signature lineage if it isn't cached.
    Direct callers should either pass ``n_rows`` or cache ``sig`` first
    (``simhash_near_pairs`` does both for you).
    """
    return (
        simhash_candidates(sig, id_col, max_hamming, n_rows=n_rows)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_candidates(
    sig: DataFrame,
    id_col: str,
    max_hamming: int = 8,
    index_broadcast_rows: int = 4_000_000,
    n_rows: int | None = None,
) -> DataFrame:
    """The pre-verify banded candidate join: columns (band, bv, a.id,
    a.simhash, b.id, b.simhash) with a.id < b.id. Exposed separately so
    tests can assert the candidate count stays bounded on skewed corpora.

    The index side (n_bands rows/doc, ~30 B each) is broadcast
    DETERMINISTICALLY whenever it holds at most ``index_broadcast_rows``
    rows: the r8 stress artifact caught AQE flipping this join to
    sort-merge at 50k docs (the static size estimate of the exploded
    cached subplan crosses autoBroadcastJoinThreshold), which shuffled the
    ~240x-exploded probe side through an Exchange — 13.3 s -> 65.1 s for
    an index side of 5 MB. The size gate needs the signature count:
    pass ``n_rows`` when the caller already knows it (the composed
    operators — ``simhash_near_pairs``, ``dedup_near`` — count their
    cached signatures once and thread it through, so the gate costs no
    extra job); otherwise ``sig`` is counted here — one job over
    16-byte rows, so CACHE ``sig`` if its lineage is expensive. The
    default threshold's broadcast is ~120 MB of packed rows at 4M —
    size it down if driver memory is tight. Above the threshold
    (cluster-scale corpora, where a broadcast would not fit) the
    equi-join shuffles both sides on (band, bv) — the documented scale
    path: probe rows are 4 longs each and never re-shuffle after the
    join."""
    n_bands, radius, widths, starts = simhash_banding(max_hamming)
    exact_entries = []
    band_masks = []
    for i in range(n_bands):
        bv = F.shiftrightunsigned("simhash", starts[i]).bitwiseAND(
            F.lit(_signed64((1 << widths[i]) - 1))
        )
        exact_entries.append(F.struct(F.lit(i).alias("band"), bv.alias("bv")))
        band_masks.append([_signed64(m) for m in _probe_masks(widths[i], radius)])
    index = sig.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(F.array(*exact_entries)).alias("e"),
    ).select("id", "simhash", "e.band", "e.bv")
    if radius == 0:
        probes = index
    else:
        masks_col = F.when(F.col("band") == 0, F.lit(band_masks[0]))
        for i in range(1, n_bands):
            masks_col = masks_col.when(F.col("band") == i, F.lit(band_masks[i]))
        probes = index.select(
            "id",
            "simhash",
            "band",
            F.explode(
                F.transform(masks_col, lambda m: F.col("bv").bitwiseXOR(m))
            ).alias("bv"),
        )
    a, b = probes.alias("a"), index.alias("b")
    sig_rows = n_rows if n_rows is not None else sig.count()
    if sig_rows * n_bands <= index_broadcast_rows:
        b = F.broadcast(b)
    return a.join(b, ["band", "bv"]).where(F.col("a.id") < F.col("b.id"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8, native: bool = True
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming — simhash64 + banded
    self-join with exact verify (full recall; see simhash_banding)."""
    # 16 bytes/doc; cached so the band self-join doesn't run the signature
    # aggregation (the expensive part) once per side
    sig = simhash64(df, id_col, text_col, native=native).cache()
    # count the cached signatures ONCE and thread the size through the
    # broadcast gate, so compositions (dedup_near over simhash) never pay
    # the gate's sizing job twice (r9 Wrong #3)
    return simhash_pairs_from_sigs(sig, id_col, max_hamming, n_rows=sig.count())


# ---------------------------------------------------- paragraph dedup ---


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n\n",
    min_chars: int = 0,
    join_sep: str | None = None,
) -> DataFrame:
    """Sub-document dedup: drop every repeated paragraph corpus-wide
    (boilerplate headers, license blocks, navigation chrome), keeping only
    its FIRST occurrence — lowest ``(id, position)`` — and reassemble each
    document's surviving paragraphs in their original order. Paragraphs
    shorter than ``min_chars`` bypass dedup (always kept), mirroring the
    common "only dedup substantial paragraphs" rule.

    ``sep`` is used both as the split REGEX and the rejoin literal — pass
    a regex-safe literal separator (the default ``"\\n\\n"`` is one) — OR
    pass ``join_sep`` to rejoin with a different literal when ``sep`` is
    a true regex (zero-width sentence boundaries, variable whitespace).

    Scale posture: the winner election never shuffles paragraph text —
    paragraphs become 8-byte xxhash64 keys at the explode, the
    first-occurrence choice is a map-side-partial ``min(struct(id, pos))``
    aggregate (no per-paragraph window, so a boilerplate paragraph
    repeated 10^8 times partial-aggregates instead of landing in one
    task), and survivors rejoin as ``(id, pos)`` longs. Document text
    shuffles exactly once, in the final doc-level join that rebuilds the
    text JVM-side (``filter`` + ``array_join`` over the re-split array).
    Two equal-hash distinct paragraphs (2^-64 per pair) would merge; the
    same tradeoff as every hashed-fingerprint dedup in this module.
    """
    parts = F.split(F.col(text_col), sep)
    ex = df.select(
        F.col(id_col).alias("__id"), F.posexplode(parts).alias("__pos", "__p")
    ).select(
        "__id",
        "__pos",
        F.xxhash64("__p").alias("__h"),
        F.length("__p").alias("__len"),
    )
    dedupable = ex.where(F.col("__len") >= min_chars)
    winners = dedupable.groupBy("__h").agg(
        F.min(F.struct("__id", "__pos")).alias("__w")
    )
    surviving = (
        dedupable.join(winners, "__h")
        .where(
            (F.col("__id") == F.col("__w.__id"))
            & (F.col("__pos") == F.col("__w.__pos"))
        )
        .select("__id", "__pos")
    )
    if min_chars > 0:
        surviving = surviving.unionByName(
            ex.where(F.col("__len") < min_chars).select("__id", "__pos")
        )
    keep_sets = surviving.groupBy("__id").agg(
        F.collect_list("__pos").alias("__keep")
    )
    rebuilt = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.array_join(
            F.filter(
                parts,
                lambda p, i: F.array_contains(
                    F.coalesce(F.col("__keep"), F.array().cast("array<int>")), i
                ),
            ),
            join_sep if join_sep is not None else sep,
        )
    )
    return (
        df.join(keep_sets, df[id_col] == keep_sets["__id"], "left")
        .withColumn(text_col, rebuilt)
        .drop("__id", "__keep")
    )


# ---------------------------------------------------- snapshot diff ------


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    fingerprint_col,
) -> DataFrame:
    """Diff two corpus snapshots by id + content fingerprint — the
    incremental-pipeline primitive ("what changed since the last run
    decides what re-processes"). Returns ``(id_col, change)`` with
    ``change`` in ``added`` (id only in new), ``removed`` (id only in
    old), ``changed`` (id in both, fingerprint differs); unchanged rows
    produce no output.

    One full-outer join on the id — the same single shuffle an exact
    dedup pays; fingerprints travel as values so content comparison
    costs no second pass. At 100 TB, feed a cheap fingerprint
    (``xxhash64(text)``/``doc_fingerprint``) rather than raw content.
    """
    o = old.select(F.col(id_col).alias("__id"), F.col(fingerprint_col).alias("__fo")) \
        if isinstance(fingerprint_col, str) else old.select(
            F.col(id_col).alias("__id"), fingerprint_col.alias("__fo"))
    n = new.select(F.col(id_col).alias("__id"), F.col(fingerprint_col).alias("__fn")) \
        if isinstance(fingerprint_col, str) else new.select(
            F.col(id_col).alias("__id"), fingerprint_col.alias("__fn"))
    j = o.join(n, "__id", "full_outer")
    change = (
        F.when(F.col("__fo").isNull(), F.lit("added"))
        .when(F.col("__fn").isNull(), F.lit("removed"))
        .when(F.col("__fo") != F.col("__fn"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(F.col("__id").alias(id_col), "change")
    )


def cross_dedup(
    new: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    df_cap: int = 64,
) -> DataFrame:
    """Drop every NEW document that near-duplicates (shingle Jaccard >=
    threshold) ANY reference document — dedup an incoming crawl against
    the existing training set without re-deduping the reference corpus.

    Implementation: tag both sides, run the same df-capped blocking
    self-join machinery as :func:`shingle_jaccard_pairs` over the union,
    then drop new docs appearing in any cross-side pair. New-vs-new
    duplicates are KEPT (run a normal dedup for those) so the operator
    composes: ``cross_dedup`` then ``dedup_near`` ≡ full-union dedup
    with the reference side immutable.
    """
    tag_new = new.select(
        F.col(id_col).alias("__cid"), F.col(text_col).alias("__ct"), F.lit(1).alias("__is_new")
    )
    tag_ref = reference.select(
        F.col(id_col).alias("__cid"), F.col(text_col).alias("__ct"), F.lit(0).alias("__is_new")
    )
    # ids may collide across corpora: carry the side bit in the join key
    both = tag_new.unionByName(tag_ref).select(
        (F.col("__cid") * 2 + F.col("__is_new")).alias("__uid"), "__ct"
    )
    pairs = shingle_jaccard_pairs(
        both, "__uid", "__ct", shingle_n=shingle_n, threshold=threshold, df_cap=df_cap
    )
    # a cross pair has exactly one odd (new) member; recover its real id
    a, b = F.col("id_a"), F.col("id_b")
    hit_new = (
        pairs.where((a % 2) != (b % 2))
        .select(
            F.when(a % 2 == 1, (a - 1) / 2).otherwise((b - 1) / 2)
            .cast("long")
            .alias(id_col)
        )
        .distinct()
    )
    return new.join(hit_new, id_col, "left_anti")


def corpus_checksum(
    df: DataFrame,
    group_cols: list,
    content_cols: list,
    native: bool = True,
) -> DataFrame:
    """Order-independent per-group content checksum + row count — verify
    two 100 TB copies of a corpus are identical (replication, migration,
    re-partitioned rewrite) without sorting or moving content: rows hash
    to 64 bits (`xxhash64` over the content columns) and fold with the
    commutative-associative pair (bit_xor, count), so ANY partitioning
    or row order yields the same (checksum, n_rows). Map-side partial
    aggregation; shuffle carries one 16-byte row per group per
    partition. ``group_cols=[]`` checksums the whole corpus (one row).

    XOR caveat (documented tradeoff): a row appearing an even number of
    times cancels out of the xor — the row COUNT catches any
    multiplicity change, but two same-size corpora differing by swapping
    a duplicated row pair would collide; pair with ``snapshot_diff``
    when per-row attribution matters.
    """
    if native:
        h = F.xxhash64(*[F.col(c) for c in content_cols])
    else:  # DuckDB-parity (CombineHash) row hashes => SQL-reproducible
        from ..functions.hashing import duckdb_hash

        h = duckdb_hash("v1.0.0", *content_cols)
    dummy = not group_cols
    if dummy:
        df = df.withColumn("__g", F.lit(0))
        group_cols = ["__g"]
    out = df.withColumn("__h", h).groupBy(*group_cols).agg(
        F.expr("bit_xor(__h)").alias("checksum"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return out.drop("__g") if dummy else out


def dedup_best(
    df: DataFrame,
    fingerprint_col,
    order_by: list,
    id_col: str | None = None,
) -> DataFrame:
    """Exact dedup keeping the BEST copy per fingerprint instead of the
    lowest id: rank within each fingerprint group by ``order_by``
    (list of Columns, e.g. ``[F.col("quality_score").desc(),
    F.col("doc_id")]``) and keep rank 1. Pass ``id_col`` as the final
    deterministic tiebreak. Same single fingerprint shuffle as
    ``dedup_exact``; the common "keep the highest-quality copy of a
    duplicated page" policy (dedup_exact == dedup_best with
    ``order_by=[id]``)."""
    order = list(order_by)
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(fingerprint_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def lsh_params(
    threshold: float,
    k: int = 64,
    min_recall: float = 0.95,
    max_fp_rate: float = 0.05,
) -> dict:
    """Choose the LSH band count for a target Jaccard threshold — the
    S-curve arithmetic users otherwise hand-wave: with ``b`` bands of
    ``r = k // b`` rows, a pair of similarity ``s`` becomes a candidate
    with probability ``1 - (1 - s^r)^b``.

    Scans the divisors of ``k`` and returns the band count whose curve
    clears ``min_recall`` AT the threshold with the lowest candidate
    rate at ``threshold / 2`` (the false-positive proxy: candidates are
    exact-verified afterwards, so FPs cost only verification compute,
    never correctness — but at corpus scale the candidate volume IS the
    cost). Returns ``{bands, rows_per_band, recall_at_threshold,
    candidate_rate_at_half_threshold, curve}`` where ``curve`` maps a
    few similarity points to candidate probability; raises if no
    divisor of k reaches ``min_recall`` (raise k or lower the bar)."""
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")

    def p_cand(s: float, b: int, r: int) -> float:
        return 1.0 - (1.0 - s**r) ** b

    best = None
    for b in range(1, k + 1):
        if k % b:
            continue
        r = k // b
        recall = p_cand(threshold, b, r)
        if recall < min_recall:
            continue
        fp = p_cand(threshold / 2.0, b, r)
        if best is None or fp < best["candidate_rate_at_half_threshold"]:
            best = {
                "bands": b,
                "rows_per_band": r,
                "recall_at_threshold": round(recall, 6),
                "candidate_rate_at_half_threshold": round(fp, 6),
                "curve": {
                    round(s, 2): round(p_cand(s, b, r), 6)
                    for s in (0.1, 0.25, 0.5, 0.75, 0.9)
                },
            }
    if best is None:
        raise ValueError(
            f"no divisor of k={k} reaches recall {min_recall} at "
            f"threshold {threshold}; increase k"
        )
    if best["candidate_rate_at_half_threshold"] > max_fp_rate:
        best["note"] = (
            f"candidate rate {best['candidate_rate_at_half_threshold']} at "
            f"s={threshold/2:.2f} exceeds {max_fp_rate}; a larger k would "
            "sharpen the S-curve"
        )
    return best


def lsh_recall_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    sample_threshold: int = 64,
    sample_mask: int = 1023,
) -> dict:
    """Empirical validation of an LSH configuration BEFORE committing a
    100 TB run to it: on a deterministic hash-sample of the corpus,
    measure the banding's actual recall against exact all-pairs Jaccard
    ground truth, alongside the S-curve's predicted recall and the
    candidate volume (the real cost driver — candidates are verified
    exactly, so recall is the only correctness risk and candidate count
    the only cost risk).

    Returns ``{n_sample, true_pairs, found_pairs, recall,
    predicted_recall_at_threshold, candidate_pairs,
    candidate_precision, sample_rate}``. The sample is hash-keyed
    (reproducible, engine-portable); the exact ground truth runs
    `shingle_jaccard_pairs` with no df cap — quadratic in the SAMPLE
    only, which is the point of sampling. ``recall`` is measured on
    sampled TRUE pairs (both endpoints sampled), an unbiased estimate
    because LSH candidacy depends only on the pair's own signatures."""
    from .sampling import hash_sample

    sample = hash_sample(df, id_col, sample_threshold, sample_mask)
    n_sample = sample.count()
    truth = shingle_jaccard_pairs(
        sample, id_col, text_col, shingle_n, threshold, df_cap=None
    ).select("id_a", "id_b")
    found = minhash_lsh_pairs(
        sample, id_col, text_col, k, bands, shingle_n, threshold
    ).select("id_a", "id_b")
    n_true = truth.count()
    n_found = found.count()
    n_hit = truth.join(found, ["id_a", "id_b"]).count()

    # candidate volume: re-derive the band join's pre-verify pair count
    r = k // bands
    sig = minhash_signatures(sample, id_col, text_col, k, shingle_n)
    stacked = sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",", *[F.col("sig")[i] for i in range(b * r, (b + 1) * r)]
                        )
                    ).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("e"),
    ).select("id", "e.band", "e.bh")
    a, b2 = stacked.alias("a"), stacked.alias("b")
    n_cand = (
        a.join(b2, ["band", "bh"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .count()
    )
    pred = 1.0 - (1.0 - threshold ** r) ** bands
    return {
        "n_sample": n_sample,
        "true_pairs": n_true,
        "found_pairs": n_found,
        "hit_pairs": n_hit,
        "recall": (n_hit / n_true) if n_true else None,
        "predicted_recall_at_threshold": round(pred, 6),
        "candidate_pairs": n_cand,
        "candidate_precision": (n_found / n_cand) if n_cand else None,
        "sample_rate": (sample_threshold) / (sample_mask + 1),
    }


def lsh_plan(
    threshold: float,
    n_perm: int = 128,
    fp_weight: float = 1.0,
    fn_weight: float = 1.0,
    grid: int = 2000,
) -> dict:
    """Choose MinHash-LSH banding (b bands × r rows) for a target
    Jaccard ``threshold`` — the knob every LSH deployment hand-tunes
    (MMDS §3.4.3 made rigorous): candidate probability is the S-curve
    P(s) = 1 − (1 − s^r)^b, and the planner picks, among all (b, r)
    with b·r ≤ n_perm, the banding minimizing

        fp_weight · ∫₀ᵗ P(s) ds  +  fn_weight · ∫ᵗ¹ (1 − P(s)) ds

    — the weighted false-positive/false-negative AREAS, integrated on a
    deterministic midpoint grid (pure driver-side math; nothing touches
    the cluster). ``fn_weight`` > ``fp_weight`` biases toward recall
    (dedup hates missed duplicates; candidates get verified exactly
    anyway), the reverse biases toward fewer verification pairs.

    Returns ``{"b", "r", "n_used", "threshold_est", "fp_area",
    "fn_area", "p_at_threshold", "candidates"}`` — ``threshold_est`` is
    the classic (1/b)^(1/r) inflection estimate, ``candidates`` the
    full ranked table so the trade is auditable. Feed b·r as
    ``num_perm`` and b as the band count to `minhash_signatures` /
    `minhash_lsh_pairs`."""
    import numpy as np

    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if n_perm < 2:
        raise ValueError("n_perm must be >= 2")
    # the FULL (b, r) lattice with b*r <= n_perm — not just the maximal
    # b per r: raising b raises P(s) pointwise (more fp area, less fn),
    # so under fp-heavy weights the optimum for a given r is often a
    # SMALLER b, which a b = n_perm // r search would never see
    step = 1.0 / grid
    s = (np.arange(grid) + 0.5) * step
    below = s < threshold
    cands = []
    for r in range(1, n_perm + 1):
        if n_perm // r < 1:
            break
        sr = s**r
        one_minus = 1.0 - sr
        pw = np.ones(grid)  # (1 - s^r)^b built incrementally over b
        for b in range(1, n_perm // r + 1):
            pw = pw * one_minus
            p = 1.0 - pw
            fp = float(p[below].sum() * step)
            fn = float(pw[~below].sum() * step)
            cands.append(
                {
                    "b": b,
                    "r": r,
                    "n_used": b * r,
                    "fp_area": fp,
                    "fn_area": fn,
                    "cost": fp_weight * fp + fn_weight * fn,
                    "threshold_est": (1.0 / b) ** (1.0 / r),
                    "p_at_threshold": 1.0 - (1.0 - threshold**r) ** b,
                }
            )
    cands.sort(key=lambda c: (c["cost"], c["n_used"], c["r"]))
    best = dict(cands[0])
    best["candidates"] = cands
    return best


def bbit_minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 128,
    b: int = 1,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, bsig array<long>) — b-bit minwise hashing (Li & König 2010):
    keep only the LOWEST ``b`` bits of each of the k minhash values,
    packed ``63 // b`` slots per long (the sign bit stays clear — the
    repo's cross-engine bit-packing convention). At b=1 a k=128
    signature shrinks 1024 → 16 bytes + padding, the storage that makes
    corpus-scale signature retention viable; the resemblance
    information lost to b-bit collisions is RECOVERED by the
    :func:`bbit_jaccard_estimate` correction instead of by storage.
    Same permutations as :func:`minhash_signatures` (derived from it),
    so b-bit and full signatures never disagree about the underlying
    minhash values."""
    if not 1 <= b <= 16:
        raise ValueError("b must be in [1, 16]")
    per_word = 63 // b
    mask = (1 << b) - 1
    sig = minhash_signatures(df, id_col, text_col, k, shingle_n)
    words = []
    for w in range(0, k, per_word):
        slots = [
            (F.col("sig")[i].bitwiseAND(F.lit(mask).cast("long")))
            * F.lit(1 << (j * b)).cast("long")
            for j, i in enumerate(range(w, min(k, w + per_word)))
        ]
        acc = slots[0]
        for s in slots[1:]:
            acc = acc + s
        words.append(acc)
    return sig.select(id_col, F.array(*words).alias("bsig"))


def bbit_jaccard_estimate(
    pairs: DataFrame,
    sigs: DataFrame,
    id_col: str = "id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    k: int = 128,
    b: int = 1,
) -> DataFrame:
    """(id_a, id_b, match_frac, jaccard_est) for each candidate pair —
    the Li–König estimator over packed b-bit signatures:
    Ĵ = (E − C) / (1 − C) with E the fraction of matching b-bit slots
    and C = 2^−b the accidental-collision floor (two DIFFERENT minhash
    values agree on their low b bits with probability ~2^−b), clamped
    to [0, 1]. Matching slots are counted with pure bit arithmetic on
    the packed words: slot j of word w matches iff
    (a XOR b) AND (mask << j·b) == 0 — the per-slot literals are
    Python-precomputed, so the whole estimate is one JVM expression
    per pair (no UDF, no unpacking explode). ``pairs`` is the
    candidate list (LSH buckets, blocking, a prior run's suspects);
    the estimator never generates pairs itself."""
    if not 1 <= b <= 16:
        raise ValueError("b must be in [1, 16]")
    per_word = 63 // b
    mask = (1 << b) - 1
    sa = sigs.select(
        F.col(id_col).alias(a_col), F.col("bsig").alias("__ba")
    )
    sb = sigs.select(
        F.col(id_col).alias(b_col), F.col("bsig").alias("__bb")
    )
    terms = []
    for w in range(0, k, per_word):
        wi = w // per_word
        x = F.col("__ba")[wi].bitwiseXOR(F.col("__bb")[wi])
        for j, _ in enumerate(range(w, min(k, w + per_word))):
            terms.append(
                F.when(
                    x.bitwiseAND(F.lit(mask << (j * b)).cast("long")) == 0,
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    c = 1.0 / (1 << b)
    e = acc.cast("double") / F.lit(float(k))
    est = (e - F.lit(c)) / F.lit(1.0 - c)
    return (
        pairs.select(a_col, b_col)
        .join(sa, a_col)
        .join(sb, b_col)
        .select(
            a_col,
            b_col,
            e.alias("match_frac"),
            F.least(F.greatest(est, F.lit(0.0)), F.lit(1.0)).alias(
                "jaccard_est"
            ),
        )
    )
