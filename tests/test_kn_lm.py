"""Kneser–Ney bigram LM (operators/lm.py): training statistics, the
interpolated-KN score vs a pure-Python reference, the sum-to-one law the
smoothing guarantees, and CCNet-style perplexity bucketing."""

import math

import pytest

from bitfilters_spark.operators.lm import (
    kn_score,
    perplexity_buckets,
    train_kn_lm,
)


def _kn_reference(train_texts, probe_tokens, discount=None):
    """Pure-Python interpolated Kneser–Ney bigram scorer (Chen & Goodman
    1999 eq. 4.26) — the oracle the Spark path must match to 1e-12."""
    from collections import Counter, defaultdict

    bigrams = Counter()
    n_tokens = 0
    for t in train_texts:
        toks = t.split()
        n_tokens += len(toks)
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
    c_ctx = Counter()
    succ = defaultdict(set)
    pred = defaultdict(set)
    for (a, b), c in bigrams.items():
        c_ctx[a] += c
        succ[a].add(b)
        pred[b].add(a)
    n_types = len(bigrams)
    if discount is None:
        n1 = sum(1 for c in bigrams.values() if c == 1)
        n2 = sum(1 for c in bigrams.values() if c == 2)
        discount = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.75
        if discount >= 1.0:
            discount = 0.75
    floor = 1.0 / (10.0 * max(n_tokens, 1))

    def p_cont(w):
        return len(pred.get(w, ())) / max(n_types, 1)

    def p(a, b):
        if a not in c_ctx:
            return max(p_cont(b), floor)
        cu = c_ctx[a]
        val = max(bigrams.get((a, b), 0) - discount, 0.0) / cu + (
            discount * len(succ[a]) / cu
        ) * p_cont(b)
        return max(val, floor)

    logs = [math.log(p(a, b)) for a, b in zip(probe_tokens, probe_tokens[1:])]
    return sum(logs) / len(logs), discount


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "san francisco is in california",
    "san francisco fog rolls in",
]


def _train_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id long, text string"
    )


def test_kn_training_statistics(spark):
    lm = train_kn_lm(_train_df(spark), "text", vocab_size=1 << 20)
    # 5 docs, bigram types / totals derivable by hand via the reference
    from collections import Counter

    bigrams = Counter()
    for t in TRAIN:
        toks = t.split()
        for pair in zip(toks, toks[1:]):
            bigrams[pair] += 1
    assert lm["n_bigram_types"] == len(bigrams)
    assert lm["n_bigrams"] == sum(bigrams.values())
    assert lm["n_tokens"] == sum(len(t.split()) for t in TRAIN)
    n1 = sum(1 for c in bigrams.values() if c == 1)
    n2 = sum(1 for c in bigrams.values() if c == 2)
    assert lm["discount"] == pytest.approx(n1 / (n1 + 2.0 * n2), abs=1e-15)
    # context stats for "the": continuations cat/dog/mat/log
    the_h = (
        _train_df(spark)
        .sparkSession.createDataFrame([("the",)], "t string")
        .selectExpr("xxhash64(t) h")
        .collect()[0]["h"]
    )
    row = {r["h"]: r for r in lm["ctx"].collect()}[the_h]
    assert row["c_ctx"] == 4 and row["n_succ"] == 4


def test_kn_score_matches_python_reference(spark):
    """Per-document avg_logp ≡ the pure-Python KN reference to 1e-12,
    covering seen bigrams, unseen continuations of a seen context, and a
    fully-unseen context."""
    lm = train_kn_lm(_train_df(spark), "text", vocab_size=1 << 20)
    probes = [
        (10, "the cat sat on the log"),       # all-seen grams
        (11, "the zebra sat"),                # seen ctx, unseen continuation
        (12, "zebra quagga zebra"),           # fully OOV
        (13, "san francisco is in california"),  # in-domain
    ]
    got = {
        r["doc_id"]: r
        for r in kn_score(
            spark.createDataFrame(probes, "doc_id long, text string"),
            "doc_id",
            "text",
            lm,
        ).collect()
    }
    for doc_id, text in probes:
        want, _ = _kn_reference(TRAIN, text.split())
        assert got[doc_id]["avg_logp"] == pytest.approx(want, abs=1e-12), text
        assert got[doc_id]["ppl"] == pytest.approx(
            math.exp(-want), rel=1e-12
        )
        assert got[doc_id]["n_scored"] == len(text.split()) - 1


def test_kn_probabilities_sum_to_one(spark):
    """For a context whose stats are in-model, Σ_w P(w|u) over the seen
    vocabulary = 1 exactly — the property that distinguishes KN from an
    ad-hoc backoff. Corpus built so every token also occurs as a
    continuation (P_cont covers the whole vocabulary)."""
    texts = ["b a b c a c b a", "c b a b b c"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    lm = train_kn_lm(df, "text", vocab_size=1 << 20)
    vocab = sorted({w for t in texts for w in t.split()})
    for ctx in vocab:
        probes = [(i, f"{ctx} {w}") for i, w in enumerate(vocab)]
        rows = kn_score(
            spark.createDataFrame(probes, "doc_id long, text string"),
            "doc_id",
            "text",
            lm,
        ).collect()
        total = sum(math.exp(r["avg_logp"]) for r in rows)
        assert total == pytest.approx(1.0, abs=1e-12), ctx


def test_kn_discount_override_and_validation(spark):
    df = _train_df(spark)
    lm = train_kn_lm(df, "text", vocab_size=1 << 20, discount=0.5)
    assert lm["discount"] == 0.5
    want, _ = _kn_reference(TRAIN, "the cat sat".split(), discount=0.5)
    row = kn_score(
        spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string"),
        "doc_id",
        "text",
        lm,
    ).collect()[0]
    assert row["avg_logp"] == pytest.approx(want, abs=1e-12)
    with pytest.raises(ValueError):
        train_kn_lm(df, "text", discount=1.0)


def test_kn_separates_in_domain_from_noise(spark):
    """The CCNet use case: in-domain text must score lower perplexity
    than shuffled junk under the in-domain LM."""
    lm = train_kn_lm(_train_df(spark), "text")
    probe = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "mat fog quagga is rolls dog on"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ppl"] for r in kn_score(probe, "doc_id", "text", lm).collect()}
    assert got[1] < got[2]


def test_kn_empty_and_short_inputs(spark):
    """Empty training set trains a usable floor-only model; docs with
    fewer than 2 tokens emit no score rows (no bigrams) — the
    `text.lm_score` contract."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    lm = train_kn_lm(empty, "text")
    assert lm["n_bigram_types"] == 0 and lm["n_tokens"] == 0
    probe = spark.createDataFrame(
        [(1, "hello world"), (2, "single"), (3, "")],
        "doc_id long, text string",
    )
    rows = kn_score(probe, "doc_id", "text", lm).collect()
    assert {r["doc_id"] for r in rows} == {1}
    # floor with n_tokens=0 clamps to 1/(10*1)
    assert rows[0]["avg_logp"] == pytest.approx(math.log(0.1), abs=1e-12)


def test_kn_vocab_cap_keeps_frequent_rows_exact(spark):
    """A tiny vocab_size drops rare grams (they score as unseen) but the
    surviving rows' statistics stay exact — capped model scores the
    all-frequent probe identically to the uncapped model."""
    texts = ["x y " * 50 + "rare1 rare2", "x y x y"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    full = train_kn_lm(df, "text", vocab_size=1 << 20)
    capped = train_kn_lm(df, "text", vocab_size=2)
    probe = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    a = kn_score(probe, "doc_id", "text", full).collect()[0]["avg_logp"]
    b = kn_score(probe, "doc_id", "text", capped).collect()[0]["avg_logp"]
    assert a == pytest.approx(b, abs=1e-12)
    assert capped["ctx"].count() <= 2 and capped["bi"].count() <= 2
    # exact scalars are cap-independent
    assert capped["n_bigram_types"] == full["n_bigram_types"]


def test_perplexity_buckets_per_language(spark):
    """CCNet head/middle/tail: thresholds computed per group; clear
    gaps between the planted score tiers make approx ≡ exact."""
    rows = []
    for lang, base in (("en", 10.0), ("fr", 100.0)):
        for i in range(9):
            # three obvious tiers per language: 3 low, 3 mid, 3 high
            rows.append((f"{lang}{i}", lang, base * (1 + (i // 3) * 10)))
    df = spark.createDataFrame(rows, "doc_id string, lang string, ppl double")
    got = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(df, "ppl", by="lang").collect()
    }
    for lang in ("en", "fr"):
        for i in range(9):
            want = ["head", "middle", "tail"][i // 3]
            assert got[f"{lang}{i}"] == want, (lang, i)


def test_perplexity_buckets_global_and_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", None)],
        "doc_id string, ppl double",
    )
    got = {r["doc_id"]: r for r in perplexity_buckets(df, "ppl").collect()}
    assert got["a"]["bucket"] == "head"
    assert got["c"]["bucket"] == "tail"
    assert got["d"]["bucket"] is None
    # thresholds ride along, self-describing
    assert got["a"]["ppl_head"] <= got["a"]["ppl_middle"]
    with pytest.raises(ValueError):
        perplexity_buckets(df, "ppl", cuts=(0.9, 0.1))


def test_kn_end_to_end_bucketing(spark):
    """Train → score → bucket composition on mixed-quality docs: the
    in-domain document lands in a lower-ppl bucket than the junk."""
    lm = train_kn_lm(_train_df(spark), "text")
    probe = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "quagga zebra wombat axolotl"),
        ],
        "doc_id long, text string",
    )
    tagged = perplexity_buckets(
        kn_score(probe, "doc_id", "text", lm), "ppl", cuts=(0.5, 0.9)
    )
    got = {r["doc_id"]: r["bucket"] for r in tagged.collect()}
    # percentile_approx returns actual elements, so with 3 docs the 0.9
    # threshold IS the max ppl — the junk doc cannot beat it; assert the
    # ORDER the buckets encode instead of a specific tail label
    assert got[1] == "head"
    assert got[3] != "head"


# ---------------------------------------------------------- trigram KN ---


def _kn3_reference(train_texts, probe_tokens, d3=None, d2=None):
    """Pure-Python interpolated trigram KN with continuation-form
    middle order — mirrors operators/lm.kn3_score exactly."""
    from collections import Counter, defaultdict

    tri = Counter()
    bi = Counter()
    n_tokens = 0
    for t in train_texts:
        toks = t.split()
        n_tokens += len(toks)
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] += 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    c_ctx3 = Counter()
    succ3 = defaultdict(set)
    pred3 = Counter()  # N1+(.vw) = distinct u before (v, w)
    for (u, v, w), c in tri.items():
        c_ctx3[(u, v)] += c
        succ3[(u, v)].add(w)
        pred3[(v, w)] += 1
    n_mid = Counter()
    n_ctypes = Counter()
    for (v, w), n in pred3.items():
        n_mid[v] += n
        n_ctypes[v] += 1
    pred1 = defaultdict(set)
    for (a, b) in bi:
        pred1[b].add(a)
    n_bi = max(len(bi), 1)

    def est(counter):
        n1 = sum(1 for c in counter.values() if c == 1)
        n2 = sum(1 for c in counter.values() if c == 2)
        d = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.75
        return 0.75 if d >= 1.0 else d

    if d3 is None:
        d3 = est(tri)
    if d2 is None:
        d2 = est(pred3)
    floor = 1.0 / (10.0 * max(n_tokens, 1))

    def p1(w):
        return len(pred1.get(w, ())) / n_bi

    def p2(v, w):
        if v not in n_mid:
            return p1(w)
        return (
            max(pred3.get((v, w), 0) - d2, 0.0) + d2 * n_ctypes[v] * p1(w)
        ) / n_mid[v]

    def p3(u, v, w):
        if (u, v) not in c_ctx3:
            return p2(v, w)
        return (
            max(tri.get((u, v, w), 0) - d3, 0.0)
            + d3 * len(succ3[(u, v)]) * p2(v, w)
        ) / c_ctx3[(u, v)]

    logs = [
        math.log(max(p3(u, v, w), floor))
        for u, v, w in zip(probe_tokens, probe_tokens[1:], probe_tokens[2:])
    ]
    return sum(logs) / len(logs)


def test_kn3_score_matches_python_reference(spark):
    from bitfilters_spark.operators.lm import kn3_score, train_kn3_lm

    lm = train_kn3_lm(_train_df(spark), "text", vocab_size=1 << 20)
    probes = [
        (10, "the cat sat on the mat"),          # seen trigrams
        (11, "the cat sat on the log"),          # seen ctx, mixed continuation
        (12, "the zebra sat on quagga mats"),    # unseen contexts mid-probe
        (13, "zebra quagga wombat axolotl"),     # fully OOV
        (14, "san francisco is in california"),  # in-domain
    ]
    got = {
        r["doc_id"]: r
        for r in kn3_score(
            spark.createDataFrame(probes, "doc_id long, text string"),
            "doc_id",
            "text",
            lm,
        ).collect()
    }
    for doc_id, text in probes:
        want = _kn3_reference(TRAIN, text.split())
        assert got[doc_id]["avg_logp"] == pytest.approx(want, abs=1e-12), text
        assert got[doc_id]["n_scored"] == len(text.split()) - 2


def test_kn3_probabilities_sum_to_one(spark):
    """Σ_w P3(w|u,v) = 1 for a fully in-model context — the discount
    mass of each order is returned through the one below it."""
    texts = ["b a b c a c b a b c c a", "c b a b b c a a b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from bitfilters_spark.operators.lm import kn3_score, train_kn3_lm

    lm = train_kn3_lm(df, "text", vocab_size=1 << 20)
    vocab = sorted({w for t in texts for w in t.split()})
    for u, v in [("b", "a"), ("a", "b"), ("c", "a")]:
        probes = [(i, f"{u} {v} {w}") for i, w in enumerate(vocab)]
        rows = kn3_score(
            spark.createDataFrame(probes, "doc_id long, text string"),
            "doc_id",
            "text",
            lm,
        ).collect()
        total = sum(math.exp(r["avg_logp"]) for r in rows)
        assert total == pytest.approx(1.0, abs=1e-12), (u, v)


def test_kn3_short_docs_and_order_separation(spark):
    """Docs with < 3 tokens emit nothing; the trigram model separates
    in-domain word ORDER that the bigram model scores identically."""
    from bitfilters_spark.operators.lm import (
        kn3_score,
        train_kn3_lm,
    )

    lm = train_kn3_lm(_train_df(spark), "text", vocab_size=1 << 20)
    probe = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, "the cat sat")],
        "doc_id long, text string",
    )
    rows = kn3_score(probe, "doc_id", "text", lm).collect()
    assert {r["doc_id"] for r in rows} == {3}
    # "the cat sat" is a seen trigram; "cat the sat" is not — the
    # trigram model must prefer the attested order
    order = spark.createDataFrame(
        [(1, "the cat sat"), (2, "cat the sat")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["ppl"] for r in kn3_score(order, "doc_id", "text", lm).collect()}
    assert got[1] < got[2]


def test_kn_save_load_roundtrip(spark, tmp_path):
    """Persisted models score identically to the in-session ones, for
    both orders (the save_classifier train-once contract)."""
    from bitfilters_spark.operators.lm import (
        kn3_score,
        load_kn_lm,
        save_kn_lm,
        train_kn3_lm,
    )

    probe = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zebra quagga wombat fog")],
        "doc_id long, text string",
    )
    lm2 = train_kn_lm(_train_df(spark), "text", vocab_size=1 << 20)
    save_kn_lm(spark, lm2, str(tmp_path / "kn2"))
    back2 = load_kn_lm(spark, str(tmp_path / "kn2"))
    a = {r["doc_id"]: r["avg_logp"] for r in kn_score(probe, "doc_id", "text", lm2).collect()}
    b = {r["doc_id"]: r["avg_logp"] for r in kn_score(probe, "doc_id", "text", back2).collect()}
    assert a == b
    for k in ("n_bigram_types", "n_tokens", "discount"):
        assert back2[k] == lm2[k]

    lm3 = train_kn3_lm(_train_df(spark), "text", vocab_size=1 << 20)
    save_kn_lm(spark, lm3, str(tmp_path / "kn3"))
    back3 = load_kn_lm(spark, str(tmp_path / "kn3"))
    a3 = {r["doc_id"]: r["avg_logp"] for r in kn3_score(probe, "doc_id", "text", lm3).collect()}
    b3 = {r["doc_id"]: r["avg_logp"] for r in kn3_score(probe, "doc_id", "text", back3).collect()}
    assert a3 == b3
    assert back3["discount3"] == lm3["discount3"]
    assert back3["discount2"] == lm3["discount2"]


def test_kn3_cap_keeps_frequent_contexts_exact(spark):
    """Trigram cap regression (r11 verdict finding 6): cont3/mid must
    cap by OCCURRENCE frequency, not by n_pred3 (which ties at 1
    corpus-wide) — a capped model scores an all-frequent probe
    identically to the uncapped model even when the corpus is mostly
    singleton trigram types that would win a hash-arbitrary eviction."""
    from bitfilters_spark.operators.lm import kn3_score, train_kn3_lm

    # 'x y z' dominates by OCCURRENCE; 30 singleton trigram types (all
    # n_pred3 = 1, same as the frequent one would tie at under the old
    # ordering) provide eviction bait
    bait = " ".join(f"r{i} s{i} t{i}" for i in range(30))
    texts = ["x y z " * 40, "x y z x y z", bait]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    full = train_kn3_lm(df, "text", vocab_size=1 << 20)
    capped = train_kn3_lm(df, "text", vocab_size=8)
    probe = spark.createDataFrame(
        [(1, "x y z x y")], "doc_id long, text string"
    )
    a = kn3_score(probe, "doc_id", "text", full).collect()[0]["avg_logp"]
    b = kn3_score(probe, "doc_id", "text", capped).collect()[0]["avg_logp"]
    assert a == pytest.approx(b, abs=1e-12)
    # exact scalars are cap-independent
    assert capped["n_bigram_types"] == full["n_bigram_types"]
    assert capped["n_tokens"] == full["n_tokens"]


def test_kn_score_quantized_matches_kn_score(spark):
    """kn_score_quantized is the same per-bigram p stream as kn_score:
    n_scored matches exactly and qlogp_sum/2^bits reproduces
    n * avg_logp to quantization error (< n * 2^-bits)."""
    from bitfilters_spark.operators.lm import kn_score_quantized

    lm = train_kn_lm(_train_df(spark), "text")
    probe = spark.createDataFrame(
        [(1, "the cat sat on a log"), (2, "san francisco fog"),
         (3, "zebra unseen words here")],
        "doc_id long, text string",
    )
    full = {r["doc_id"]: r for r in kn_score(probe, "doc_id", "text", lm).collect()}
    q = {
        r["doc_id"]: r
        for r in kn_score_quantized(probe, "doc_id", "text", lm, 20).collect()
    }
    assert set(full) == set(q)
    for k in full:
        n = full[k]["n_scored"]
        assert q[k]["n_scored"] == n
        approx = q[k]["qlogp_sum"] / float(1 << 20)
        exact = full[k]["avg_logp"] * n
        assert exact - n * 2.0 ** -20 <= approx <= exact


def test_kn_impact_pruning(spark):
    """prune_to switches the bi cap to Stolcke-style weighted impact:
    (a) prune_to >= n_types reproduces the unpruned scores exactly,
    (b) the kept set equals the brute-force top-impact set,
    (c) a pruned-away bigram scores exactly its backoff mass."""
    import math

    df = _train_df(spark)
    full = train_kn_lm(df, "text", vocab_size=1 << 20)
    n_types = full["n_bigram_types"]

    same = train_kn_lm(df, "text", vocab_size=1 << 20, prune_to=n_types)
    probe = spark.createDataFrame(
        [(1, "the cat sat on a log"), (2, "san francisco fog rolls")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["avg_logp"] for r in kn_score(probe, "doc_id", "text", full).collect()}
    b = {r["doc_id"]: r["avg_logp"] for r in kn_score(probe, "doc_id", "text", same).collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)

    # brute-force the impact ranking over the raw bigram types
    texts = [t for (_, t) in _train_df(spark).collect()]
    bis, ctx, cont = {}, {}, {}
    for t in texts:
        ts = t.split(" ")
        for u, w in zip(ts, ts[1:]):
            bis[(u, w)] = bis.get((u, w), 0) + 1
    for (u, w), c in bis.items():
        cu = ctx.setdefault(u, [0, 0])
        cu[0] += c
        cu[1] += 1
        cont[w] = cont.get(w, 0) + 1
    d = full["discount"]
    nt = float(max(n_types, 1))
    imp = {}
    for (u, w), c in bis.items():
        cu, ns = ctx[u]
        pc = cont[w] / nt
        backoff = d * ns / cu * pc
        pw = (c - d) / cu + backoff
        imp[(u, w)] = c * (math.log(pw) - math.log(backoff))
    k = 5
    want_kept = set(sorted(imp, key=lambda g: -imp[g])[:k])
    pruned = train_kn_lm(df, "text", vocab_size=1 << 20, prune_to=k)
    assert pruned["bi"].count() == k

    # (c) score a doc consisting of one pruned-away bigram: exactly the
    # backoff mass under the pruned model
    dropped = sorted(set(imp) - want_kept, key=lambda g: -imp[g])[0]
    u, w = dropped
    one = spark.createDataFrame([(9, f"{u} {w}")], "doc_id long, text string")
    got = kn_score(one, "doc_id", "text", pruned).collect()[0]["avg_logp"]
    cu, ns = ctx[u]
    expect = math.log(d * ns / cu * (cont[w] / nt))
    assert got == pytest.approx(expect, abs=1e-12)
    # and a kept bigram still scores its full explicit probability
    ku, kw = sorted(want_kept, key=lambda g: -imp[g])[0]
    one2 = spark.createDataFrame([(10, f"{ku} {kw}")], "doc_id long, text string")
    got2 = kn_score(one2, "doc_id", "text", pruned).collect()[0]["avg_logp"]
    cu2, ns2 = ctx[ku]
    pc2 = cont[kw] / nt
    expect2 = math.log((bis[(ku, kw)] - d) / cu2 + d * ns2 / cu2 * pc2)
    assert got2 == pytest.approx(expect2, abs=1e-12)


def test_kn_prune_zero_discount_falls_back_to_counts(spark):
    """Review fix (r12): D = 0 (n1 = 0 — every bigram type repeats)
    makes every backoff mass 0, so impact ranking is undefined; the
    prune cap must fall back to occurrence order, not a NULL-impact
    hash-arbitrary subset."""
    texts = ["x y " * 30, "x y x y", "p q p q p q", "r s r s"]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    # force D = 0 explicitly to pin the branch regardless of estimate
    pruned = train_kn_lm(df, "text", vocab_size=1 << 20, discount=0.0,
                         prune_to=2)
    kept = {r["hb"] for r in pruned["bi"].collect()}
    want = {
        r["hb"]
        for r in train_kn_lm(df, "text", vocab_size=2, discount=0.0)["bi"]
        .collect()
    }
    assert kept == want and len(kept) == 2  # top-cb rows, deterministically
