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


def test_converges_and_separates(spark, corpus):
    model = C.train_text_classifier(
        corpus, "doc_id", "text", "label", n_buckets=1 << 12, iters=40, lr=24.0
    )
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


def test_classifier_filter_gate(spark, corpus):
    model = C.train_text_classifier(
        corpus, "doc_id", "text", "label", n_buckets=1 << 12, iters=40, lr=24.0
    )
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


def test_calibration_on_trained_model(spark, corpus):
    model = C.train_text_classifier(
        corpus, "doc_id", "text", "label", n_buckets=1 << 12, iters=40, lr=24.0
    )
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
