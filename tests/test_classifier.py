"""Trainable quality classifier (#99): gradient-exactness vs numpy,
convergence on separable data, scoring parity, gate semantics."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators import classifier as C

GOOD = ["careful analysis shows the method converges",
        "the theorem holds under mild assumptions",
        "we evaluate on held out data and report variance",
        "results replicate across seeds and datasets"]
BAD = ["click here buy now free free free",
       "winner winner casino bonus click click",
       "cheap pills buy buy discount now now",
       "free bonus click winner cheap now"]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")




def test_first_iteration_gradient_matches_numpy(spark, corpus):
    """One Spark GD step == one numpy GD step on identical features."""
    nb = 1 << 10
    feats = C.hashed_features(corpus, "doc_id", "text", nb).collect()
    labels = {r["doc_id"]: r["label"] for r in corpus.collect()}
    ids = sorted(labels)
    X = np.zeros((len(ids), nb))
    y = np.array([labels[i] for i in ids], dtype="float64")
    pos = {d: k for k, d in enumerate(ids)}
    for r in feats:
        X[pos[r["id"]], r["bucket"]] = r["cnt"]

    lr = 2.0
    # numpy: one step from zero init
    p = np.full(len(ids), 0.5)
    g = X.T @ (p - y) / len(ids)
    w_np = -lr * g
    b_np = -lr * float(np.mean(p - y))

    model = C.train_text_classifier(
        corpus, "doc_id", "text", "label", n_buckets=nb, iters=1, lr=lr
    )
    np.testing.assert_allclose(model["weights"], w_np, atol=1e-12)
    assert model["bias"] == pytest.approx(b_np, abs=1e-12)
    # loss at zero init is exactly log(2)
    assert model["losses"][0] == pytest.approx(math.log(2.0), abs=1e-12)


@pytest.fixture(scope="module")
def sep_model(spark, corpus):
    """The separating model (n_buckets=4096, iters=40) three tests assert
    against — trained ONCE per module: each of the 40 GD iterations is a
    Spark job round-trip, so the three identical trainings were ~60 s of
    suite wall time for one model's worth of coverage."""
    return C.train_text_classifier(
        corpus, "doc_id", "text", "label", n_buckets=1 << 12, iters=40, lr=24.0
    )


def test_converges_and_separates(spark, corpus, sep_model):
    model = sep_model
    assert model["losses"][-1] < model["losses"][0] * 0.2  # loss collapsed
    scored = {
        r["doc_id"]: r["score"]
        for r in C.classifier_score(corpus, "doc_id", "text", model).collect()
    }
    for i in range(len(GOOD)):
        assert scored[i] > 0.8
    for i in range(len(BAD)):
        assert scored[100 + i] < 0.2


def test_score_matches_numpy_margin(spark, corpus):
    nb = 1 << 10
    model = C.train_text_classifier(
        corpus, "doc_id", "text", "label", n_buckets=nb, iters=5, lr=2.0
    )
    feats = C.hashed_features(corpus, "doc_id", "text", nb).collect()
    margins = {}
    for r in feats:
        margins[r["id"]] = margins.get(r["id"], 0.0) + (
            model["weights"][r["bucket"]] * r["cnt"]
        )
    got = {
        r["doc_id"]: r["score"]
        for r in C.classifier_score(corpus, "doc_id", "text", model).collect()
    }
    for d, m in margins.items():
        want = 1.0 / (1.0 + math.exp(-(m + model["bias"])))
        assert got[d] == pytest.approx(want, abs=1e-12)


def test_empty_text_scores_at_bias(spark):
    df = spark.createDataFrame(
        [(0, "good text", 1), (1, "", 0)], "doc_id long, text string, label int"
    )
    model = C.train_text_classifier(
        df, "doc_id", "text", "label", n_buckets=64, iters=3, lr=1.0
    )
    got = {r["doc_id"]: r["score"]
           for r in C.classifier_score(df, "doc_id", "text", model).collect()}
    assert got[1] == pytest.approx(1.0 / (1.0 + math.exp(-model["bias"])), abs=1e-12)


def test_classifier_filter_gate(spark, corpus, sep_model):
    model = sep_model
    kept = C.classifier_filter(corpus, "doc_id", "text", model, 0.5)
    assert sorted(r["doc_id"] for r in kept.collect()) == list(range(len(GOOD)))


def test_classifier_save_load_roundtrip(spark, corpus, tmp_path):
    import numpy as np

    model = C.train_text_classifier(
        corpus, "doc_id", "text", "label", n_buckets=1 << 10, iters=5, lr=2.0
    )
    C.save_classifier(spark, model, str(tmp_path / "clf"))
    loaded = C.load_classifier(spark, str(tmp_path / "clf"))
    np.testing.assert_array_equal(loaded["weights"], model["weights"])
    assert loaded["bias"] == model["bias"]
    a = sorted(map(str, C.classifier_score(corpus, "doc_id", "text", model).collect()))
    b = sorted(map(str, C.classifier_score(corpus, "doc_id", "text", loaded).collect()))
    assert a == b


def test_calibration_report_binning_and_rates(spark):
    rows = [
        # bin 0: scores ~0.05, all negative
        (0, 0.04, 0), (1, 0.06, 0), (2, 0.05, 0),
        # bin 9: scores high incl. exact 1.0 (must fold into top bin)
        (3, 0.95, 1), (4, 1.0, 1), (5, 0.92, 0),
        # bin 5
        (6, 0.55, 1), (7, 0.52, 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, label int")
    rep = {r["bin"]: r for r in C.calibration_report(df, "score", "label").collect()}
    assert set(rep) == {0, 5, 9}
    assert rep[0]["n"] == 3 and rep[0]["frac_positive"] == 0.0
    assert rep[9]["n"] == 3 and rep[9]["frac_positive"] == pytest.approx(2 / 3)
    assert rep[5]["n"] == 2 and rep[5]["frac_positive"] == 0.5
    assert rep[9]["lo"] == pytest.approx(0.9) and rep[9]["hi"] == pytest.approx(1.0)
    assert rep[0]["mean_score"] == pytest.approx(0.05)


def test_calibration_on_trained_model(spark, corpus, sep_model):
    model = sep_model
    scored = C.classifier_score(corpus, "doc_id", "text", model).join(
        corpus.select("doc_id", "label"), "doc_id"
    )
    rep = C.calibration_report(scored, "score", "label", n_bins=4).collect()
    # a separating model puts positives in high bins, negatives in low
    for r in rep:
        if r["bin"] == 0:
            assert r["frac_positive"] == 0.0
        if r["bin"] == 3:
            assert r["frac_positive"] == 1.0


def test_featureless_docs_contribute_bias_gradient(spark):
    """r8 (ADVICE fix): empty/whitespace documents have no feature rows
    but ARE labeled examples — they must contribute sigmoid(bias) - y to
    the bias gradient and log(2) to the zero-init loss, not silently
    drop out of a denominator that still counts them. One GD step must
    equal numpy over ALL docs, featureless included."""
    nb = 1 << 10
    rows = [(0, "good solid text", 1), (1, "bad spam text", 0),
            (2, "", 1), (3, "   ", 0), (4, "more quality words", 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")

    feats = C.hashed_features(df, "doc_id", "text", nb).collect()
    ids = [0, 1, 2, 3, 4]
    y = np.array([1, 0, 1, 0, 1], dtype="float64")
    X = np.zeros((len(ids), nb))
    for r in feats:
        X[r["id"], r["bucket"]] = r["cnt"]
    assert not X[2].any() and not X[3].any()  # genuinely featureless

    lr = 2.0
    p = np.full(len(ids), 0.5)
    g = X.T @ (p - y) / len(ids)
    w_np = -lr * g
    b_np = -lr * float(np.mean(p - y))  # featureless rows included

    model = C.train_text_classifier(
        df, "doc_id", "text", "label", n_buckets=nb, iters=1, lr=lr
    )
    np.testing.assert_allclose(model["weights"], w_np, atol=1e-12)
    assert model["bias"] == pytest.approx(b_np, abs=1e-12)
    assert model["losses"][0] == pytest.approx(math.log(2.0), abs=1e-12)

    # streaming fold: identical math on the same batch
    import tempfile

    from bitfilters_spark.streaming.classifier import (
        fold_classifier_batch, load_streaming_classifier,
    )

    with tempfile.TemporaryDirectory() as d:
        fold_classifier_batch(
            df, "doc_id", "text", "label", d, 0, n_buckets=nb, lr=lr
        )
        sm = load_streaming_classifier(d)
    np.testing.assert_allclose(sm["weights"], w_np, atol=1e-12)
    assert sm["bias"] == pytest.approx(b_np, abs=1e-12)


# ---- trained multi-class language ID (#131) -------------------------------

LANGS = {
    "en": ["the quick brown fox jumps over the lazy dog near the river",
           "science requires careful measurement and honest reporting of results",
           "children love reading stories about distant planets and brave explorers",
           "weather patterns shift slowly across the northern coastline"],
    "de": ["der schnelle braune fuchs springt über den faulen hund am fluss",
           "wissenschaft erfordert sorgfältige messung und ehrliche berichte",
           "kinder lieben geschichten über ferne planeten und mutige forscher",
           "das wetter ändert sich langsam entlang der nördlichen küste"],
    "fr": ["le renard brun rapide saute par dessus le chien paresseux",
           "la science exige des mesures soigneuses et des rapports honnêtes",
           "les enfants adorent les histoires de planètes lointaines",
           "le temps change lentement le long de la côte nord"],
    "es": ["el rápido zorro marrón salta sobre el perro perezoso junto al río",
           "la ciencia exige mediciones cuidadosas e informes honestos",
           "los niños adoran las historias de planetas lejanos",
           "el clima cambia lentamente a lo largo de la costa norte"],
    "it": ["la volpe marrone veloce salta sopra il cane pigro vicino al fiume",
           "la scienza richiede misurazioni accurate e resoconti onesti",
           "i bambini adorano le storie di pianeti lontani",
           "il tempo cambia lentamente lungo la costa settentrionale"],
}


@pytest.fixture(scope="module")
def lang_corpus(spark):
    rows = []
    for li, (lg, sents) in enumerate(sorted(LANGS.items())):
        rows += [(li * 100 + i, t, lg) for i, t in enumerate(sents)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_langid_one_step_matches_numpy(spark, lang_corpus):
    """One multi-class Spark GD step == one numpy softmax GD step on
    identical features (1e-12 — the r9 directive's exactness bar)."""
    nb = 1 << 10
    feats = C.hashed_features(lang_corpus, "doc_id", "text", nb).collect()
    rows = lang_corpus.collect()
    classes = sorted({r["lang"] for r in rows})
    k = len(classes)
    ids = sorted(r["doc_id"] for r in rows)
    pos = {d: i for i, d in enumerate(ids)}
    lab = {r["doc_id"]: classes.index(r["lang"]) for r in rows}
    X = np.zeros((len(ids), nb))
    for r in feats:
        X[pos[r["id"]], r["bucket"]] = r["cnt"]
    Y = np.zeros((len(ids), k))
    for d, c in lab.items():
        Y[pos[d], c] = 1.0

    lr = 2.0
    P = np.full((len(ids), k), 1.0 / k)  # softmax at zero init
    G = (P - Y).T @ X / len(ids)
    W_np = -lr * G
    b_np = -lr * np.mean(P - Y, axis=0)

    model = C.train_langid_classifier(
        lang_corpus, "doc_id", "text", "lang", n_buckets=nb, iters=1, lr=lr
    )
    assert model["classes"] == classes
    np.testing.assert_allclose(model["weights"], W_np, atol=1e-12)
    np.testing.assert_allclose(model["bias"], b_np, atol=1e-12)
    # zero-init cross-entropy is exactly log(K)
    assert model["losses"][0] == pytest.approx(math.log(k), abs=1e-12)


@pytest.fixture(scope="module")
def lang_model(spark, lang_corpus):
    """One trained model shared by the separation / roundtrip tests.

    iters=30 (was 60): training is deterministic (full-batch, fixed
    fixture), and at 30 iterations the model already labels the fixture
    exactly with losses[-1]/losses[0] = 0.031 — 3x inside the 0.1 bound
    the test asserts. Each iteration is a Spark job round-trip, so the
    extra 30 bought ~30 s of suite wall time and no assertion strength."""
    return C.train_langid_classifier(
        lang_corpus, "doc_id", "text", "lang", n_buckets=1 << 12,
        iters=30, lr=12.0,
    )


def test_langid_separates_fixture_heuristic_cannot(spark, lang_corpus, lang_model):
    """The trained model labels a 5-language fixture exactly; the
    stopword heuristic (text.langid) structurally CANNOT — it has no
    Italian class at all and misroutes Romance languages whose stopwords
    overlap its 4 lists (the r9 'What's missing #3' gap)."""
    from bitfilters_spark.operators.text import langid

    model = lang_model
    assert model["losses"][-1] < model["losses"][0] * 0.1
    got = {
        r["doc_id"]: (r["pred"], r["confidence"])
        for r in C.langid_score(
            lang_corpus, "doc_id", "text", model, out_col="pred"
        ).collect()
    }
    truth = {r["doc_id"]: r["lang"] for r in lang_corpus.collect()}
    for d, lg in truth.items():
        assert got[d][0] == lg, f"doc {d}: want {lg}, got {got[d]}"
        assert 0.0 < got[d][1] <= 1.0
    # the heuristic mislabels EVERY Italian document (it can only emit
    # en/de/fr/es/zh)
    heur = {
        r["doc_id"]: r["hl"]
        for r in lang_corpus.select("doc_id", langid("text").alias("hl")).collect()
    }
    it_docs = [d for d, lg in truth.items() if lg == "it"]
    assert all(heur[d] != "it" for d in it_docs)


def test_langid_save_load_and_corpus_rollup(spark, lang_corpus, lang_model, tmp_path):
    """Persisted-model roundtrip + composition with the corpus-profiling
    rollup shape: per-language document counts from the TRAINED labels
    match ground truth (the langid_table drop-in contract)."""
    model = lang_model
    C.save_langid_classifier(spark, model, str(tmp_path / "langid"))
    loaded = C.load_langid_classifier(spark, str(tmp_path / "langid"))
    assert loaded["classes"] == model["classes"]
    np.testing.assert_array_equal(loaded["weights"], model["weights"])
    np.testing.assert_array_equal(loaded["bias"], model["bias"])

    scored = C.langid_score(lang_corpus, "doc_id", "text", loaded, out_col="pred")
    rollup = {
        r["pred"]: r["n"]
        for r in scored.groupBy("pred").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert rollup == {lg: len(s) for lg, s in LANGS.items()}


def test_langid_empty_doc_gets_bias_prediction(spark):
    """Zero-token documents must get the bias-only argmax (deterministic
    lowest-index tie-break at zero bias), not silently drop out."""
    df = spark.createDataFrame(
        [(0, "hello world text", "en"), (1, "hallo welt text", "de"), (2, "", "en")],
        "doc_id long, text string, lang string",
    )
    model = C.train_langid_classifier(
        df, "doc_id", "text", "lang", n_buckets=256, iters=3, lr=1.0
    )
    got = {r["doc_id"]: r["lang2"] for r in C.langid_score(
        df, "doc_id", "text", model, out_col="lang2").collect()}
    assert len(got) == 3 and got[2] in model["classes"]


def test_null_labels_dropped_in_both_trainers(spark):
    """r11 ADVICE fix: a NULL label must neither crash the multi-class
    trainer (sorted() over None vs str) nor silently inflate n in the
    binary trainer (shrinking the effective learning rate). Training on
    a corpus with NULL-label rows equals training on the labeled subset
    exactly."""
    import numpy as np

    rows = [
        (0, "hello world text here", "en", 1.0),
        (1, "hallo welt text hier", "de", 0.0),
        (2, "more english words appear", "en", 1.0),
        (3, "mehr deutsche worte hier", "de", 0.0),
    ]
    with_nulls = spark.createDataFrame(
        rows + [(4, "unlabeled doc text", None, None)],
        "doc_id long, text string, lang string, y double",
    )
    clean = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, y double"
    )
    m1 = C.train_langid_classifier(
        with_nulls, "doc_id", "text", "lang", n_buckets=128, iters=2, lr=1.0
    )
    m2 = C.train_langid_classifier(
        clean, "doc_id", "text", "lang", n_buckets=128, iters=2, lr=1.0
    )
    assert m1["classes"] == m2["classes"] == ["de", "en"]
    assert np.array_equal(m1["weights"], m2["weights"])
    b1 = C.train_text_classifier(
        with_nulls, "doc_id", "text", "y", n_buckets=128, iters=2, lr=1.0
    )
    b2 = C.train_text_classifier(
        clean, "doc_id", "text", "y", n_buckets=128, iters=2, lr=1.0
    )
    assert b1["losses"] == b2["losses"]
    assert np.array_equal(b1["weights"], b2["weights"])
