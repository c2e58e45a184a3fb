"""Multimodal plumbing: binary payload columns through mapInPandas —
decode, features, resize, frame-sample. Codecs are documented stubs; the
schema/batching/explosion mechanics are the real thing under test."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (i + 1)) for i in range(20)], "doc_id long, text string"
    )
    return MM.attach_payload(docs)


def test_meta_deterministic(spark, payloads):
    meta = {r["doc_id"]: r for r in MM.extract_media_meta(payloads).collect()}
    for i in range(20):
        assert meta[i]["n_bytes"] == i + 1
        assert meta[i]["format"] == MM.FORMATS[(i + 1) % 3]


def test_resize_produces_fixed_size_payloads(spark, payloads):
    out = MM.resize_images(payloads, 64, 32).collect()
    assert len(out) == 20
    for r in out:
        assert (r["width"], r["height"]) == (64, 32)
        assert len(r["payload"]) == 64 * 32 // 64


def test_sample_frames_explodes_rows(spark, payloads):
    rows = MM.sample_frames(payloads).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(20):
        L = i + 1
        k = (L % 4) + 1
        frames = sorted(by_doc[i], key=lambda r: r["frame_idx"])
        assert [f["frame_idx"] for f in frames] == list(range(k))
        assert all(f["n_bytes"] == L // k for f in frames)


def test_features_shape_and_normalization(spark, payloads):
    feats = MM.extract_features(payloads).collect()
    for r in feats:
        v = np.array(r["features"])
        assert v.shape == (MM.FEATURE_DIM,)
        assert abs(v.sum() - 1.0) < 1e-5
