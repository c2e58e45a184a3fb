"""Kneser–Ney bigram language model for perplexity-based quality
filtering — the CCNet recipe (Wenzek et al. 2020): train an in-domain LM,
score every crawled document's perplexity, and split the corpus into
head/middle/tail buckets by per-language perplexity percentiles. The
existing `text.train_ngram_lm` (#77) is a plain interpolated bigram model;
this module implements the smoothing production pipelines actually use
(KenLM's default): interpolated Kneser–Ney with an absolute discount
estimated from count-of-counts, where the backoff weight for a word is its
CONTINUATION probability (how many distinct contexts it follows) rather
than its raw frequency — the classic "San Francisco" correction.

Model math (bigram KN, Chen & Goodman 1999 eq. 4.26):

    P(w | u) = max(c(u,w) − D, 0) / c(u)
             + D · N1+(u·) / c(u) · P_cont(w)
    P_cont(w) = N1+(·w) / N1+(··)
    D         = n1 / (n1 + 2·n2)            (count-of-count estimate)

where c(u) is u's CONTEXT count (Σ_w c(u,w)), N1+(u·) the distinct
continuation types after u, N1+(·w) the distinct predecessor types before
w, N1+(··) the distinct bigram-type total, and n1/n2 the number of bigram
types seen exactly once/twice. For a context u where every continuation is
in-model, Σ_w P(w|u) = 1 exactly (the discount mass D·N1+(u·) is returned
through P_cont, which itself sums to 1) — pinned by a pytest.

Spark shape: training is two hash aggregations over the exploded bigram
stream (token and bigram counts), plus context/continuation statistics
derived from the BIGRAM TYPE table (metadata-scale: one row per distinct
bigram, not per occurrence) — every derived table caps at ``vocab_size``
rows by count via TakeOrderedAndProject (per-partition top-k, no global
sort), so the model broadcasts at score time regardless of corpus size.
Scoring is `text.lm_score`'s plan: explode bigrams → two broadcast joins
(context stats on the previous token, bigram count + continuation stats on
the current) → one per-doc groupBy; pure `F.*` arithmetic, no Python in
the row path. Hashes are the shared JVM ``xxhash64`` expressions of
`text.tokens`, so train and score cannot disagree on tokenization.

Capping semantics: context/continuation statistics are computed EXACTLY
(before the cap), then the per-token and per-bigram tables keep the
``vocab_size`` most frequent rows — a capped-away gram scores as unseen
(backoff / floor) but never corrupts the surviving rows' statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "train_kn_lm",
    "kn_model_from_type_tables",
    "kn_score",
    "train_kn3_lm",
    "kn3_model_from_type_tables",
    "kn3_score",
    "save_kn_lm",
    "load_kn_lm",
    "perplexity_buckets",
]


def _bigram_structs(hs):
    """(hp, hc, hb) structs for adjacent pairs of a hashed-token array."""
    return F.zip_with(
        F.slice(hs, 1, F.greatest(F.size(hs) - 1, F.lit(0))),
        F.slice(hs, 2, F.greatest(F.size(hs) - 1, F.lit(0))),
        lambda a, b: F.struct(
            a.alias("hp"), b.alias("hc"), F.xxhash64(a, b).alias("hb")
        ),
    )


def train_kn_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = 1 << 16,
    discount: float | None = None,
    prune_to: int | None = None,
) -> dict:
    """Train an interpolated Kneser–Ney bigram LM.

    Returns ``{"ctx": DataFrame(h, c_ctx, n_succ), "cont":
    DataFrame(h, n_pred), "bi": DataFrame(hb, cb), "n_bigram_types": int,
    "n_tokens": int, "discount": float}`` — all three tables capped at
    ``vocab_size`` rows by count so they broadcast at score time; the
    scalar statistics and the count-of-count discount estimate are exact
    (computed before any cap). ``discount`` overrides the n1/(n1+2·n2)
    estimate (KenLM's ``--discount_fallback`` analogue for tiny corpora
    where n1 or n2 is 0)."""
    t = kn_type_tables(df, text_col, orders=(2,))
    return kn_model_from_type_tables(
        t["bi_types"], t["uni"], vocab_size, discount, prune_to=prune_to
    )


def kn_type_tables(
    df: DataFrame, text_col: str = "text", orders: tuple = (2, 3),
    eager: bool = False,
) -> dict:
    """The additive sufficient-statistic tables every KN order derives
    from, built from ONE tokenization: ``bi_types`` (hp, hc, cb),
    ``uni`` (h, c_tok), and — when 3 ∈ orders — ``tri_types``
    (hu, hv, hw, c). All lazily checkpointed (``eager=True``
    materializes them as overlapped jobs — the right call when every
    table is consumed by several model-derivation collects right away).
    Factored out (r13) so a caller training BOTH the bigram and trigram
    models (the CCNet gate row does) shares the slice scan and
    aggregations instead of paying them per trainer."""
    seq = df.select(
        F.transform(tokens(text_col), lambda t: F.xxhash64(t)).alias("hs")
    )
    # localCheckpoint(eager=False) pays the subtree's full physical
    # planning AT CALL TIME (Dataset.checkpoint materializes
    # queryExecution.toRdd); the two/three plans are independent, so
    # create them from a thread pool (guide §2.6 applied to driver-side
    # planning) instead of serially.
    frames = {
        "bi_types": (
            seq.select(F.explode(_bigram_structs(F.col("hs"))).alias("g"))
            .groupBy("g.hp", "g.hc")
            .agg(F.count(F.lit(1)).alias("cb"))
        ),
        "uni": (
            seq.select(F.explode("hs").alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("c_tok"))
        ),
    }
    if 3 in orders:
        frames["tri_types"] = (
            seq.select(F.explode(_trigram_structs(F.col("hs"))).alias("g"))
            .groupBy(
                F.col("g.hu").alias("hu"),
                F.col("g.hv").alias("hv"),
                F.col("g.hw").alias("hw"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
        )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(frames)) as pool:
        futs = {
            k: pool.submit(d.localCheckpoint, eager=eager)
            for k, d in frames.items()
        }
        return {k: f.result() for k, f in futs.items()}


def kn_model_from_type_tables(
    bi_types: DataFrame,
    uni: DataFrame,
    vocab_size: int | None = 1 << 16,
    discount: float | None = None,
    prune_to: int | None = None,
) -> dict:
    """Derive the KN model from its two sufficient-statistic tables:
    ``bi_types`` (hp, hc, cb) — one row per distinct bigram — and
    ``uni`` (h, c_tok) token occurrence counts. Shared by
    :func:`train_kn_lm` and `streaming/lm.streaming_kn_model` (both are
    ADDITIVE tables, which is what lets the LM stream), so the two
    paths cannot diverge arithmetically.

    ``prune_to`` switches the explicit-bigram table's cap from raw
    count to SCORE IMPACT (Stolcke-style weighted entropy pruning,
    Stolcke 1998): a dropped (u, w) row falls back to the already-kept
    backoff mass D·N1+(u·)/c(u)·Pc(w), so its cost is exactly
    ``cb · (log P_with − log P_without)`` — occurrences × the log-ratio
    the score moves. Keeping the ``prune_to`` highest-impact rows
    minimizes total (weighted) log-prob distortion for the table size,
    which at 100 TB is THE broadcast-size knob: a raw-count cap keeps
    frequent bigrams whose explicit and backoff probabilities barely
    differ, while impact keeps the rows the scores actually feel. The
    ctx/cont/scalar statistics stay exact and un-pruned — only the
    explicit-count table shrinks (the KenLM ``--prune`` shape; the
    pruned model's Σ_w P(w|u) dips below 1 by the discarded mass, the
    standard pruning trade)."""
    # exact scalar stats + count-of-counts in ONE job: the type-table
    # pass and the token-total agg are 1-row frames crossJoined before
    # the single collect (two fixed job overheads become one)
    stats = (
        bi_types.agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("cb").alias("n_bigrams"),
            F.sum((F.col("cb") == 1).cast("long")).alias("n1"),
            F.sum((F.col("cb") == 2).cast("long")).alias("n2"),
        )
        .crossJoin(uni.agg(F.sum("c_tok").alias("ntok")))
        .collect()[0]
    )
    n_types = int(stats["n_types"] or 0)
    n_bigrams = int(stats["n_bigrams"] or 0)
    if discount is None:
        n1, n2 = int(stats["n1"] or 0), int(stats["n2"] or 0)
        # degenerate count-of-counts (tiny corpus, or n2 == 0 driving the
        # estimate to exactly 1.0 — discounting away ALL observed mass):
        # KenLM fails the build; we fall back to the textbook 0.75
        discount = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.75
        if discount >= 1.0:
            discount = 0.75
    if not (0.0 <= discount < 1.0):
        raise ValueError(f"discount must be in [0, 1), got {discount}")

    # context stats: c(u) = sum of u's bigram counts, N1+(u·) = its
    # distinct-continuation count (= row count: bi_types is one row/type).
    # vocab_size=None (r13) = genuinely UNCAPPED: skip the TakeOrdered
    # sorts (and the uni join that exists only to order the cont cap) —
    # the gate rows used a "far above any reachable size" cap for
    # uncapped semantics and paid 8 pointless sorts per train
    ctx = bi_types.groupBy(F.col("hp").alias("h")).agg(
        F.sum("cb").alias("c_ctx"), F.count(F.lit(1)).alias("n_succ")
    )
    if vocab_size is not None:
        ctx = ctx.orderBy(F.col("c_ctx").desc(), "h").limit(vocab_size)
    # continuation stats: N1+(·w) = distinct predecessors of w, cap
    # ORDER by token frequency from uni (a token's scoring impact ∝ how
    # often probes hit it — predecessor-type counts tie at 1 across
    # whole corpora and would evict frequent tokens arbitrarily)
    cont = bi_types.groupBy(F.col("hc").alias("h")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    if vocab_size is not None:
        cont = (
            cont.join(uni, "h", "left")
            .orderBy(F.col("c_tok").desc(), "h")
            .limit(vocab_size)
            .select("h", "n_pred")
        )
    if prune_to is None:
        bi = bi_types.select(F.xxhash64("hp", "hc").alias("hb"), "cb")
        if vocab_size is not None:
            bi = bi.orderBy(F.col("cb").desc(), "hb").limit(vocab_size)
    elif discount <= 0.0:
        # D = 0 (legal: n1 = 0 when no bigram type is a singleton) makes
        # EVERY backoff mass 0 — log(0) would NULL every impact and the
        # "top-impact" cap would decay to a hash-arbitrary subset. With
        # no discount the explicit entry IS the whole probability, so
        # occurrence count is the honest importance order.
        bi = (
            bi_types.select(F.xxhash64("hp", "hc").alias("hb"), "cb")
            .orderBy(F.col("cb").desc(), "hb")
            .limit(prune_to)
        )
    else:
        # impact = cb * (log P_with - log P_without): rank rows by what
        # dropping them would cost the weighted corpus log-prob
        ctx_full = bi_types.groupBy(F.col("hp")).agg(
            F.sum("cb").alias("__cctx"), F.count(F.lit(1)).alias("__nsucc")
        )
        cont_full = bi_types.groupBy(F.col("hc")).agg(
            F.count(F.lit(1)).alias("__npred")
        )
        n_types_f = max(float(n_types), 1.0)
        j = bi_types.join(ctx_full, "hp").join(cont_full, "hc")
        pc = F.col("__npred").cast("double") / F.lit(n_types_f)
        cctx = F.col("__cctx").cast("double")
        backoff = (
            F.lit(discount) * F.col("__nsucc").cast("double") / cctx * pc
        )
        p_with = (F.col("cb").cast("double") - F.lit(discount)) / cctx + backoff
        impact = F.col("cb").cast("double") * (
            F.log(p_with) - F.log(backoff)
        )
        bi = (
            j.select(
                F.xxhash64("hp", "hc").alias("hb"), "cb",
                impact.alias("__imp"),
            )
            .orderBy(F.col("__imp").desc(), "hb")
            .limit(prune_to)
            .select("hb", "cb")
        )
    return {
        "ctx": ctx,
        "cont": cont,
        "bi": bi,
        "n_bigram_types": n_types,
        "n_bigrams": n_bigrams,
        "n_tokens": int(stats["ntok"] or 0),
        "discount": float(discount),
    }


def kn_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: dict,
) -> DataFrame:
    """(id, n_scored, avg_logp, ppl) — per-document mean Kneser–Ney
    log-probability over bigrams and its perplexity ``exp(-avg_logp)``
    (lower ppl = more in-distribution; CCNet keeps the low-ppl head).

    Unseen handling: a bigram whose CONTEXT is in-model but whose
    continuation is unseen gets exactly the backoff mass
    ``D·N1+(u·)/c(u) · P_cont(w)``; an unseen context backs off fully to
    ``P_cont(w)``; both are floored at ``1/(10·n_tokens)`` so fully-OOV
    text scores harshly but finitely (the `text.lm_score` convention).
    Documents with < 2 tokens have no bigrams and are not emitted — same
    contract as `text.lm_score`.

    Plan: explode bigrams → three BROADCAST joins against the capped
    model tables → one per-doc groupBy. No corpus-sized shuffle."""
    scored = _kn_scored(df, id_col, text_col, lm)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.avg(F.log("p")).alias("avg_logp"),
        F.exp(-F.avg(F.log("p"))).alias("ppl"),
    )


def _kn_scored(df: DataFrame, id_col: str, text_col: str, lm: dict) -> DataFrame:
    """(id, p) — one row per bigram with its interpolated-KN
    probability; the shared core of :func:`kn_score` and
    :func:`kn_score_quantized`, so the two outputs cannot diverge
    arithmetically."""
    d = float(lm["discount"])
    n_types = max(float(lm["n_bigram_types"]), 1.0)
    floor = 1.0 / (10.0 * max(float(lm["n_tokens"]), 1.0))
    seq = df.select(
        F.col(id_col),
        F.transform(tokens(text_col), lambda t: F.xxhash64(t)).alias("hs"),
    )
    grams = seq.select(
        id_col, F.explode(_bigram_structs(F.col("hs"))).alias("g")
    ).select(id_col, "g.hp", "g.hc", "g.hb")
    ctx = lm["ctx"].select(
        F.col("h").alias("hp"), "c_ctx", "n_succ"
    )
    cont = lm["cont"].select(F.col("h").alias("hc"), "n_pred")
    joined = (
        grams.join(F.broadcast(ctx), "hp", "left")
        .join(F.broadcast(cont), "hc", "left")
        .join(F.broadcast(lm["bi"]), "hb", "left")
    )
    p_cont = F.coalesce(F.col("n_pred"), F.lit(0)).cast("double") / F.lit(n_types)
    c_ctx = F.coalesce(F.col("c_ctx"), F.lit(0)).cast("double")
    seen_ctx = F.col("c_ctx").isNotNull()
    p_kn = (
        F.greatest(F.coalesce(F.col("cb"), F.lit(0)).cast("double") - F.lit(d), F.lit(0.0))
        / F.greatest(c_ctx, F.lit(1.0))
        + F.lit(d)
        * F.coalesce(F.col("n_succ"), F.lit(0)).cast("double")
        / F.greatest(c_ctx, F.lit(1.0))
        * p_cont
    )
    return joined.withColumn(
        "p", F.greatest(F.when(seen_ctx, p_kn).otherwise(p_cont), F.lit(floor))
    )


def kn_score_quantized(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: dict,
    scale_bits: int = 20,
) -> DataFrame:
    """(id, n_scored, qlogp_sum) — the cross-engine-EXACT twin of
    :func:`kn_score` for zero-tolerance gating: each bigram's log-prob
    is quantized to a multiple of ``2^-scale_bits``
    (``floor(log(p) * 2^scale_bits)`` as an INTEGER) and summed, so the
    per-document aggregate is an order-independent 64-bit integer — the
    `q_pagerank` 2^-30 trick applied to an LM score. The probability
    itself is pure rational IEEE arithmetic (correctly-rounded ops in a
    fixed order — bit-identical across engines that replay the same
    expression); the single transcendental (``log``) sits INSIDE the
    quantization, whose 2^-20 grid is ~2^30 coarser than the ~1-ulp
    libm spread, so a replay matches exactly. ``avg_logp``/``ppl``
    themselves stay `kn_score`'s (pytest-pinned to the pure-Python
    reference) — this surface exists to make the KN signal
    driver-gateable without rounding tolerance."""
    scale = float(1 << scale_bits)
    scored = _kn_scored(df, id_col, text_col, lm)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.floor(F.log("p") * F.lit(scale)).cast("long")).alias(
            "qlogp_sum"
        ),
    )


def perplexity_buckets(
    scored: DataFrame,
    ppl_col: str = "ppl",
    by: str | None = None,
    cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
    accuracy: int = 10000,
) -> DataFrame:
    """Tag each scored document ``head`` / ``middle`` / ``tail`` by its
    perplexity's position within its group (CCNet §3.3: per-LANGUAGE
    percentile thresholds — pass ``by="lang"``; ``by=None`` buckets the
    whole corpus against one pair of thresholds).

    Scale shape: thresholds come from ONE ``percentile_approx``
    aggregation (map-side partials; group-scale result collected and
    re-joined by broadcast) — the corpus-sized frame is never window-
    sorted. Adds ``bucket`` plus the thresholds used (``ppl_head``,
    ``ppl_middle``) so downstream filters are self-describing. Rows with
    NULL perplexity keep bucket NULL."""
    lo, hi = float(cuts[0]), float(cuts[1])
    if not (0.0 < lo <= hi < 1.0):
        raise ValueError(f"cuts must satisfy 0 < lo <= hi < 1, got {cuts}")
    keys = [by] if by else []
    thr = scored.groupBy(*keys).agg(
        F.percentile_approx(ppl_col, [lo, hi], accuracy).alias("_thr")
    ).select(
        *keys,
        F.col("_thr")[0].alias("ppl_head"),
        F.col("_thr")[1].alias("ppl_middle"),
    )
    if by:
        tagged = scored.join(F.broadcast(thr), by, "left")
    else:
        # literal 1-row broadcast (the sampling.py scalar-join pattern)
        tagged = scored.crossJoin(F.broadcast(thr))
    return tagged.withColumn(
        "bucket",
        F.when(F.col(ppl_col).isNull(), F.lit(None).cast("string"))
        .when(F.col(ppl_col) <= F.col("ppl_head"), F.lit("head"))
        .when(F.col(ppl_col) <= F.col("ppl_middle"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def _trigram_structs(hs):
    """(hu, hv, hw) structs for adjacent triples of a hashed-token
    array."""
    n = F.size(hs)
    return F.zip_with(
        F.slice(hs, 1, F.greatest(n - 2, F.lit(0))),
        F.zip_with(
            F.slice(hs, 2, F.greatest(n - 2, F.lit(0))),
            F.slice(hs, 3, F.greatest(n - 2, F.lit(0))),
            lambda b, c: F.struct(b.alias("hv"), c.alias("hw")),
        ),
        lambda a, vc: F.struct(
            a.alias("hu"), vc["hv"].alias("hv"), vc["hw"].alias("hw")
        ),
    )


def train_kn3_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int | None = 1 << 16,
    discount3: float | None = None,
    discount2: float | None = None,
) -> dict:
    """Interpolated Kneser–Ney TRIGRAM LM — the KenLM order-3 shape,
    one recursion deeper than :func:`train_kn_lm`:

        P3(w|u,v) = max(c(uvw)−D3, 0)/c(uv·)
                  + D3·N1+(uv·)/c(uv·) · P2(w|v)
        P2(w|v)   = max(N1+(·vw)−D2, 0)/N1+(·v·)
                  + D2·N2+(v·)/N1+(·v·) · P1(w)          (continuation form)
        P1(w)     = N1+(·w)/N1+(··)                      (over bigram types)

    with D3 from the trigram count-of-counts and D2 from the
    count-of-counts of the ADJUSTED counts N1+(·vw) (Chen & Goodman's
    modified counts at the middle order). Unseen (u,v) contexts back
    off to P2; a v never seen mid-trigram backs off to P1. For a fully
    in-model context, Σ_w P3(w|u,v) = 1 exactly (each order returns its
    discount mass through the next one down) — pytest-pinned like the
    bigram law.

    Every statistic derives from TWO type tables — trigram types
    (hu, hv, hw, c) and the #140 bigram/unigram tables — all additive,
    so the streaming fold pattern applies unchanged. Derived tables cap
    at ``vocab_size`` rows by their own counts (the same
    exact-stats-then-cap semantics as the bigram model). Scoring is
    five broadcast joins + one per-doc groupBy; no corpus shuffle."""
    t = kn_type_tables(df, text_col, orders=(2, 3))
    return kn3_model_from_type_tables(
        t["tri_types"], t["bi_types"], t["uni"], vocab_size, discount3,
        discount2,
    )


def _estimate_discount(stats_row, n1_key: str, n2_key: str) -> float:
    n1 = int(stats_row[n1_key] or 0)
    n2 = int(stats_row[n2_key] or 0)
    d = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.75
    return 0.75 if d >= 1.0 else d


def kn3_model_from_type_tables(
    tri_types: DataFrame,
    bi_types: DataFrame,
    uni: DataFrame,
    vocab_size: int | None = 1 << 16,
    discount3: float | None = None,
    discount2: float | None = None,
) -> dict:
    """Derive the trigram-KN model from its additive type tables —
    shared (like :func:`kn_model_from_type_tables`) so a streamed fold
    and the batch trainer cannot diverge."""
    # trigram count-of-counts -> D3; continuation count-of-counts -> D2
    cont3_full = tri_types.groupBy("hv", "hw").agg(
        F.count(F.lit(1)).alias("n_pred3")
    ).localCheckpoint(eager=False)
    # ONE stats job for all four scalar groups (discount count-of-counts
    # at both orders + the lowest-order normalizers): each agg is a
    # 1-row frame, crossJoined before the single collect — 4 fixed
    # job overheads become 1
    stats = (
        tri_types.agg(
            F.sum((F.col("c") == 1).cast("long")).alias("n1_3"),
            F.sum((F.col("c") == 2).cast("long")).alias("n2_3"),
        )
        .crossJoin(
            cont3_full.agg(
                F.sum((F.col("n_pred3") == 1).cast("long")).alias("n1_2"),
                F.sum((F.col("n_pred3") == 2).cast("long")).alias("n2_2"),
            )
        )
        .crossJoin(bi_types.agg(F.count(F.lit(1)).alias("nbt")))
        .crossJoin(uni.agg(F.sum("c_tok").alias("ntok")))
        .collect()[0]
    )
    d3 = _estimate_discount(stats, "n1_3", "n2_3") if discount3 is None else discount3
    d2 = _estimate_discount(stats, "n1_2", "n2_2") if discount2 is None else discount2
    for name, d in (("discount3", d3), ("discount2", d2)):
        if not (0.0 <= d < 1.0):
            raise ValueError(f"{name} must be in [0, 1), got {d}")

    # vocab_size=None (r13) = genuinely UNCAPPED: skip every TakeOrdered
    # sort and the joins that exist only to order the caps
    tri = tri_types.select(F.xxhash64("hu", "hv", "hw").alias("h3"), "c")
    if vocab_size is not None:
        tri = tri.orderBy(F.col("c").desc(), "h3").limit(vocab_size)
    ctx3 = tri_types.groupBy(F.xxhash64("hu", "hv").alias("h2")).agg(
        F.sum("c").alias("c_ctx3"), F.count(F.lit(1)).alias("n_succ3")
    )
    if vocab_size is not None:
        ctx3 = ctx3.orderBy(F.col("c_ctx3").desc(), "h2").limit(vocab_size)
    # cont3 caps ORDER by how often the (v,w) bigram OCCURS (cb from
    # bi_types), not by n_pred3 — predecessor-type counts tie at 1
    # across whole corpora and would evict frequent, scoring-hot
    # contexts hash-arbitrarily (the exact failure the bigram model's
    # cont table documents and avoids, kn_model_from_type_tables)
    if vocab_size is None:
        cont3 = cont3_full.select(
            F.xxhash64("hv", "hw").alias("hvw"), "n_pred3"
        )
    else:
        cont3 = (
            cont3_full.join(
                bi_types.select(
                    F.col("hp").alias("hv"), F.col("hc").alias("hw"), "cb"
                ),
                ["hv", "hw"],
                "left",
            )
            .select(F.xxhash64("hv", "hw").alias("hvw"), "n_pred3", "cb")
            .orderBy(F.col("cb").desc(), "hvw")
            .limit(vocab_size)
            .select("hvw", "n_pred3")
        )
    # mid caps ORDER by the middle token's corpus frequency (uni.c_tok),
    # for the same reason: scoring impact ∝ how often probes hit v
    mid = cont3_full.groupBy(F.col("hv").alias("h")).agg(
        F.sum("n_pred3").alias("n_mid"),
        F.count(F.lit(1)).alias("n_ctypes"),
    )
    if vocab_size is not None:
        mid = (
            mid.join(uni, "h", "left")
            .orderBy(F.col("c_tok").desc(), "h")
            .limit(vocab_size)
            .select("h", "n_mid", "n_ctypes")
        )
    # lowest order: the bigram continuation distribution, derived
    # DIRECTLY — running kn_model_from_type_tables here would also
    # compute the bigram ctx/bi tables and the n1/n2 discount stats
    # only to throw them away (one wasted full-stats job per train)
    cont = bi_types.groupBy(F.col("hc").alias("h")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    if vocab_size is not None:
        cont = (
            cont.join(uni, "h", "left")
            .orderBy(F.col("c_tok").desc(), "h")
            .limit(vocab_size)
            .select("h", "n_pred")
        )
    n_bigram_types = int(stats["nbt"] or 0)
    n_tokens = int(stats["ntok"] or 0)
    return {
        "tri": tri,
        "ctx3": ctx3,
        "cont3": cont3,
        "mid": mid,
        "cont": cont,
        "n_bigram_types": n_bigram_types,
        "n_tokens": n_tokens,
        "discount3": float(d3),
        "discount2": float(d2),
    }


def kn3_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: dict,
) -> DataFrame:
    """(id, n_scored, avg_logp, ppl) over TRIGRAMS under a
    :func:`train_kn3_lm` model — same contract as :func:`kn_score`
    (floor ``1/(10·n_tokens)``, docs with < 3 tokens not emitted), one
    order deeper. Plan: explode trigrams → five broadcast joins → one
    per-doc groupBy."""
    scored = _kn3_scored(df, id_col, text_col, lm)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.avg(F.log("p")).alias("avg_logp"),
        F.exp(-F.avg(F.log("p"))).alias("ppl"),
    )


def kn3_score_quantized(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: dict,
    scale_bits: int = 20,
) -> DataFrame:
    """(id, n_scored, qlogp_sum) — the cross-engine-EXACT twin of
    :func:`kn3_score`, exactly as :func:`kn_score_quantized` is to
    :func:`kn_score`: each trigram log-prob quantized to an INTEGER
    multiple of ``2^-scale_bits`` and summed, order-independent, so a
    SQL oracle that replays the three-order backoff in the identical
    IEEE op order matches with zero tolerance. Shares
    :func:`_kn3_scored` with the float scorer so the two cannot diverge
    arithmetically."""
    scale = float(1 << scale_bits)
    scored = _kn3_scored(df, id_col, text_col, lm)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.floor(F.log("p") * F.lit(scale)).cast("long")).alias(
            "qlogp_sum"
        ),
    )


def _kn3_scored(df: DataFrame, id_col: str, text_col: str, lm: dict) -> DataFrame:
    """(id, p) — one row per trigram with its interpolated order-3 KN
    probability; the shared core of :func:`kn3_score` and
    :func:`kn3_score_quantized`."""
    d3 = float(lm["discount3"])
    d2 = float(lm["discount2"])
    n_bi = max(float(lm["n_bigram_types"]), 1.0)
    floor = 1.0 / (10.0 * max(float(lm["n_tokens"]), 1.0))
    seq = df.select(
        F.col(id_col),
        F.transform(tokens(text_col), lambda t: F.xxhash64(t)).alias("hs"),
    )
    grams = seq.select(
        id_col, F.explode(_trigram_structs(F.col("hs"))).alias("g")
    ).select(
        id_col,
        F.xxhash64("g.hu", "g.hv", "g.hw").alias("h3"),
        F.xxhash64("g.hu", "g.hv").alias("h2"),
        F.xxhash64("g.hv", "g.hw").alias("hvw"),
        F.col("g.hv").alias("hv"),
        F.col("g.hw").alias("hw"),
    )
    joined = (
        grams.join(F.broadcast(lm["tri"]), "h3", "left")
        .join(F.broadcast(lm["ctx3"]), "h2", "left")
        .join(F.broadcast(lm["cont3"]), "hvw", "left")
        .join(
            F.broadcast(
                lm["mid"].select(F.col("h").alias("hv"), "n_mid", "n_ctypes")
            ),
            "hv",
            "left",
        )
        .join(
            F.broadcast(
                lm["cont"].select(F.col("h").alias("hw"), "n_pred")
            ),
            "hw",
            "left",
        )
    )
    p1 = F.coalesce(F.col("n_pred"), F.lit(0)).cast("double") / F.lit(n_bi)
    n_mid = F.coalesce(F.col("n_mid"), F.lit(0)).cast("double")
    p2_kn = (
        F.greatest(
            F.coalesce(F.col("n_pred3"), F.lit(0)).cast("double") - F.lit(d2),
            F.lit(0.0),
        )
        + F.lit(d2) * F.coalesce(F.col("n_ctypes"), F.lit(0)).cast("double") * p1
    ) / F.greatest(n_mid, F.lit(1.0))
    p2 = F.when(F.col("n_mid").isNotNull(), p2_kn).otherwise(p1)
    c_ctx3 = F.coalesce(F.col("c_ctx3"), F.lit(0)).cast("double")
    p3_kn = (
        F.greatest(
            F.coalesce(F.col("c"), F.lit(0)).cast("double") - F.lit(d3),
            F.lit(0.0),
        )
        + F.lit(d3) * F.coalesce(F.col("n_succ3"), F.lit(0)).cast("double") * p2
    ) / F.greatest(c_ctx3, F.lit(1.0))
    p3 = F.when(F.col("c_ctx3").isNotNull(), p3_kn).otherwise(p2)
    return joined.withColumn("p", F.greatest(p3, F.lit(floor)))


_KN_TABLES = ("ctx", "cont", "bi")
_KN3_TABLES = ("tri", "ctx3", "cont3", "mid", "cont")


def save_kn_lm(spark, lm: dict, path: str) -> None:
    """Persist a :func:`train_kn_lm` or :func:`train_kn3_lm` model:
    each (capped, broadcast-sized) model table as parquet under
    ``path/<table>``, the scalars as one metadata row — the
    `save_classifier` persisted-artifact contract: train once, score
    every crawl from any session."""
    tables = _KN3_TABLES if "tri" in lm else _KN_TABLES
    for t in tables:
        lm[t].write.mode("overwrite").parquet(f"{path}/{t}")
    scalars = {
        k: v
        for k, v in lm.items()
        if isinstance(v, (int, float)) and not isinstance(v, bool)
    }
    spark.createDataFrame(
        [tuple(scalars.values())],
        ", ".join(
            f"{k} {'double' if isinstance(v, float) else 'long'}"
            for k, v in scalars.items()
        ),
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_kn_lm(spark, path: str) -> dict:
    """Load a persisted model; returns the exact `train_kn_lm` /
    `train_kn3_lm` dict shape (the order is self-describing from the
    stored tables)."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    is_tri = "discount3" in meta
    out: dict = {}
    for t in _KN3_TABLES if is_tri else _KN_TABLES:
        out[t] = spark.read.parquet(f"{path}/{t}")
    for k, v in meta.items():
        out[k] = float(v) if k.startswith("discount") else int(v)
    return out
