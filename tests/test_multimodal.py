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


# ------------------------------------------------- codec feature gate ---


def test_codec_stub_forced(spark, payloads):
    # codec="stub" must give byte-derived metadata even if Pillow exists
    meta = {
        r["doc_id"]: r
        for r in MM.extract_media_meta(payloads, codec="stub").collect()
    }
    assert meta[0]["format"] == MM.FORMATS[1 % 3]


def test_codec_auto_falls_back_on_non_images(spark, payloads):
    # text payloads are not parseable images -> auto == stub output
    a = MM.extract_media_meta(payloads, codec="auto").collect()
    s = MM.extract_media_meta(payloads, codec="stub").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, s))


def test_codec_pil_requires_pillow(spark, payloads):
    if MM.HAS_PIL:
        pytest.skip("Pillow installed; rejection path not reachable")
    with pytest.raises(ImportError):
        MM.extract_media_meta(payloads, codec="pil")


def test_codec_invalid_name(spark, payloads):
    with pytest.raises(ValueError):
        MM.extract_media_meta(payloads, codec="ffmpeg")


def test_codec_real_path_with_pillow(spark):
    Image = pytest.importorskip("PIL.Image")
    import io as _io

    def png_bytes(w, h):
        buf = _io.BytesIO()
        Image.new("RGB", (w, h), (120, 10, 200)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png_bytes(8, 6)), (2, png_bytes(3, 5)), (3, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = {r["doc_id"]: r for r in MM.extract_media_meta(df, codec="auto").collect()}
    assert (meta[1]["format"], meta[1]["width"], meta[1]["height"]) == ("png", 8, 6)
    assert (meta[2]["width"], meta[2]["height"]) == (3, 5)
    # unparseable payload fell back to the stub, not an error
    assert meta[3]["n_bytes"] == len(b"not an image")

    resized = {r["doc_id"]: r for r in MM.resize_images(df, 4, 4, codec="auto").collect()}
    with Image.open(_io.BytesIO(bytes(resized[1]["payload"]))) as im:
        assert (im.width, im.height) == (4, 4)

    feats = {r["doc_id"]: r for r in MM.extract_features(df, codec="auto").collect()}
    assert abs(sum(feats[1]["features"]) - 1.0) < 1e-5

    # strict pil codec must raise on the non-image payload
    with pytest.raises(Exception):
        MM.extract_media_meta(df, codec="pil").collect()


def test_sample_audio_windows_exact_reference(spark):
    """Window offsets, tail handling, and integer energies must match a
    plain python reference on synthetic PCM payloads; null payloads drop."""
    import numpy as np

    from bitfilters_spark.operators.multimodal import sample_audio_windows

    payloads = {
        1: bytes(range(0, 200)),            # shorter than one window
        2: bytes([5] * 1500),               # two full + one tail at hop=512? -> offsets 0,512,1024
        3: None,
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in payloads.items()], "doc_id long, payload binary"
    )
    got = {
        (r["doc_id"], r["win_idx"]): (r["start_sample"], r["n_samples"], r["energy"])
        for r in sample_audio_windows(df, win=1024, hop=512).collect()
    }
    want = {}
    for i, b in payloads.items():
        if b is None:
            continue
        x = np.frombuffer(b, dtype=np.int8).astype(np.int64)
        for w, off in enumerate(range(0, len(x), 512)):
            seg = x[off : off + 1024]
            want[(i, w)] = (off, len(seg), int(np.dot(seg, seg)))
    assert got == want
    assert (1, 0) in got and got[(1, 0)][1] == 200  # short clip keeps its tail
    assert len([k for k in got if k[0] == 2]) == 3  # 1500 bytes -> 3 windows


def test_image_phash_stub_locality_and_pairs(spark):
    """Stub path: byte-identical payloads hash equal, near-identical ones
    land within the hamming budget, different content far outside; the
    banded pair join finds exactly the close pairs with exact hamming."""
    import numpy as np

    from bitfilters_spark.operators.multimodal import image_phash, phash_near_pairs

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, 4096, dtype=np.uint8)
    near = base.copy()
    near[100:104] = 255  # tiny edit
    other = rng.integers(0, 256, 4096, dtype=np.uint8)
    rows = [
        (1, bytes(base)),
        (2, bytes(base)),   # exact duplicate
        (3, bytes(near)),   # near duplicate
        (4, bytes(other)),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = {r["doc_id"]: r["phash"] for r in image_phash(df, "doc_id", codec="stub").collect()}
    assert h[1] == h[2]
    assert bin(h[1] ^ h[3]).count("1") <= 8
    assert bin(h[1] ^ h[4]).count("1") > 8
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(df, "doc_id", max_hamming=8, codec="stub").collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 2)] == 0


def test_image_phash_pil_real_images(spark):
    """Pillow path: a re-encoded/slightly-noised image pHashes within a
    small hamming distance of the original; a structurally different
    image does not. Gated on Pillow."""
    import io as _io

    import numpy as np
    import pytest

    PIL = pytest.importorskip("PIL.Image")

    def png(arr):
        im = PIL.fromarray(arr, "L")
        buf = _io.BytesIO()
        im.save(buf, "PNG")
        return buf.getvalue()

    rng = np.random.default_rng(3)
    grad = np.outer(np.arange(64), np.ones(64)).astype(np.uint8) * 3
    noisy = np.clip(
        grad.astype(np.int16) + rng.integers(-6, 7, grad.shape), 0, 255
    ).astype(np.uint8)
    checker = (np.indices((64, 64)).sum(0) % 2 * 255).astype(np.uint8)
    rows = [(1, png(grad)), (2, png(noisy)), (3, png(checker))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    from bitfilters_spark.operators.multimodal import image_phash

    h = {r["doc_id"]: r["phash"] for r in image_phash(df, "doc_id", codec="pil").collect()}
    assert bin(h[1] ^ h[2]).count("1") <= 10
    assert bin(h[1] ^ h[3]).count("1") > 16


def test_audio_fingerprint_and_near_pairs(spark):
    """Energy-envelope fingerprints: identical clips match exactly, a
    clip with a small edit stays above the Jaccard threshold, unrelated
    audio stays below; pairs come back exact-verified."""
    import numpy as np

    from bitfilters_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_pairs,
    )

    rng = np.random.default_rng(11)
    n = 64 * 1024
    # amplitude-modulated noise: the envelope ramps across the clip, so
    # the per-window energy symbols actually vary (flat noise would
    # quantize every window to the same symbol — no shingle structure)
    envelope = 1 + 99 * np.abs(np.sin(np.arange(n) * 2 * np.pi / 8192))
    base = (rng.uniform(-1, 1, n) * envelope).astype(np.int8)
    edited = base.copy()
    edited[:2048] = 0  # silence the first few windows
    other = (rng.integers(-4, 4, n)).astype(np.int8)  # quiet, flat
    rows = [
        (1, bytes(base)),
        (2, bytes(base)),
        (3, bytes(edited)),
        (4, bytes(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df, "doc_id").collect()}
    assert fp[1] == fp[2] != fp[4]
    n_windows = len(fp[1].split(" "))
    assert n_windows == 128  # 64k samples, hop 512
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in audio_near_pairs(df, "doc_id", threshold=0.6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.6
    assert not any(4 in p for p in pairs)


def test_streaming_image_dedup_composes_with_phash(spark, tmp_path):
    """Multimodal dedup composes with the streaming machinery through
    the fingerprint-column contract: phash as streaming_dedup_exact's
    fingerprint drops byte-identical images across micro-batches with
    no new streaming code."""
    import numpy as np

    from bitfilters_spark.operators.multimodal import image_phash
    from bitfilters_spark.streaming import streaming_dedup_exact

    rng = np.random.default_rng(5)
    img_a = bytes(rng.integers(0, 256, 2048, dtype=np.uint8))
    img_b = bytes(rng.integers(0, 256, 2048, dtype=np.uint8))
    img_c = bytes(rng.integers(0, 256, 2048, dtype=np.uint8))

    src = str(tmp_path / "img_in")
    ckpt = str(tmp_path / "img_ckpt")

    def write_batch(rows):
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        image_phash(df, "doc_id", codec="stub").join(df, "doc_id").select(
            "doc_id", F.col("phash").cast("string").alias("fp")
        ).coalesce(1).write.mode("append").parquet(src)

    write_batch([(1, img_a), (2, img_b), (3, img_a)])  # 3 dups 1 in-batch
    stream = spark.readStream.schema("doc_id long, fp string").parquet(src)
    dedup = streaming_dedup_exact(stream, "fp", "doc_id", num_shards=4)
    q = (
        dedup.writeStream.format("memory")
        .queryName("img_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch([(10, img_a), (11, img_c)])  # 10 dups batch-1's img_a
        q.processAllAvailable()
        got = {r["id"] for r in spark.sql("SELECT id FROM img_sink").collect()}
    finally:
        q.stop()
    assert got == {1, 2, 11}


def test_video_fingerprint_and_near_pairs(spark):
    """Frame-hash fingerprints: identical clips j=1.0; a re-cut sharing
    most frames stays above threshold; unrelated content finds no pair;
    frame count matches the chunk geometry."""
    import numpy as np

    from bitfilters_spark.operators.multimodal import (
        video_fingerprint,
        video_near_pairs,
    )

    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, 4096, dtype=np.uint8) for _ in range(32)]
    base = b"".join(bytes(f) for f in frames)
    recut = b"".join(bytes(f) for f in frames[:28]) + bytes(
        rng.integers(0, 256, 4 * 4096, dtype=np.uint8)
    )  # last 4 scenes replaced
    other = bytes(rng.integers(0, 256, 32 * 4096, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, recut), (4, other)],
        "doc_id long, payload binary",
    )
    fp = {r["doc_id"]: r["vfp"] for r in video_fingerprint(df, "doc_id").collect()}
    assert fp[1] == fp[2] != fp[4]
    assert len(fp[1].split(" ")) == 32
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in video_near_pairs(df, "doc_id", threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5
    assert not any(4 in p for p in pairs)


def test_video_codec_validation_and_gate(spark):
    """r8: video codec follows the image-family convention — bad names
    rejected; codec='ffmpeg' requires the binary; codec='stub' output
    is byte-identical to the historical default (oracle stability)."""
    df = spark.createDataFrame(
        [(1, bytes(range(200)) * 40)], "doc_id long, payload binary"
    )
    with pytest.raises(ValueError, match="codec"):
        MM.video_fingerprint(df, codec="avi").collect()
    if not MM.HAS_FFMPEG:
        with pytest.raises(ImportError, match="ffmpeg"):
            MM.video_fingerprint(df, codec="ffmpeg").collect()
    default = MM.video_fingerprint(df).collect()
    stub = MM.video_fingerprint(df, codec="stub").collect()
    assert [r["vfp"] for r in default] == [r["vfp"] for r in stub]
    # auto on undecodable bytes falls back to the stub per payload
    auto = MM.video_fingerprint(df, codec="auto").collect()
    assert [r["vfp"] for r in auto] == [r["vfp"] for r in stub]


@pytest.mark.skipif(not MM.HAS_FFMPEG, reason="ffmpeg binary not on PATH")
def test_video_real_keyframes_reencode_matches(spark, tmp_path):
    """Gated real-decoder test (the video twin of the Pillow-gated image
    tests): a re-encoded copy of a clip shares most per-keyframe pHashes
    within a few bits; an unrelated clip does not."""
    import subprocess

    ff = MM._ffmpeg()

    def clip(src, out, extra):
        subprocess.run(
            [ff, "-v", "error", "-f", "lavfi", "-i", src, "-t", "2"]
            + extra + [str(out)],
            check=True,
        )

    a = tmp_path / "a.mp4"
    a2 = tmp_path / "a2.mp4"
    c = tmp_path / "c.mp4"
    clip("testsrc=size=64x64:rate=10", a, ["-pix_fmt", "yuv420p"])
    # re-encode the SAME content at a different bitrate/gop
    subprocess.run(
        [ff, "-v", "error", "-i", str(a), "-b:v", "64k", "-g", "5", str(a2)],
        check=True,
    )
    clip("testsrc2=size=64x64:rate=10", c, ["-pix_fmt", "yuv420p"])

    rows = [
        (1, a.read_bytes()), (2, a2.read_bytes()), (3, c.read_bytes()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: [int(h, 16) for h in r["vfp"].split(" ")]
        for r in MM.video_fingerprint(df, codec="ffmpeg").collect()
    }

    def sim(xs, ys):
        n = min(len(xs), len(ys))
        close = sum(
            1 for x, y in zip(xs[:n], ys[:n])
            if bin(x ^ y).count("1") <= 12
        )
        return close / max(n, 1)

    assert sim(got[1], got[2]) >= 0.5   # re-encode: most keyframes match
    assert sim(got[1], got[3]) < 0.5    # unrelated content does not


def _make_wav(freq_hz: float, n: int = 8000, rate: int = 8000, amp: float = 0.5,
              nch: int = 1, width: int = 2, envelope=None) -> bytes:
    """Synthesize a real RIFF/WAVE payload (sine tone) via stdlib wave.
    ``envelope`` is an optional per-segment gain sequence (speech-like
    amplitude bursts) — the structure the energy-envelope fingerprint
    actually keys on (a steady tone has a FLAT envelope and is
    indistinguishable from any other steady tone by design)."""
    import io
    import wave

    import numpy as np

    t = np.arange(n) / rate
    x = (amp * 32767 * np.sin(2 * np.pi * freq_hz * t))
    if envelope is not None:
        # fixed 2000-sample gain segments (time-anchored, so truncating the
        # clip keeps the surviving envelope identical)
        g = np.tile(np.repeat(np.asarray(envelope, dtype=np.float64), 2000),
                    -(-n // (2000 * len(envelope))))[:n]
        x = x * g
    if width == 2:
        frames = np.repeat(x.astype("<i2"), nch).tobytes()
    else:
        frames = np.repeat((x / 256 + 128).astype(np.uint8), nch).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_audio_pcm_wav_is_real_decode():
    """codec='wav' decodes actual RIFF/WAVE PCM (not container bytes):
    samples round-trip exactly for 16-bit mono, stereo downmixes by
    integer mean, and 8-bit recenters around zero."""
    import numpy as np

    from bitfilters_spark.operators.multimodal import decode_audio_pcm

    wav = _make_wav(440.0, n=1000)
    x = decode_audio_pcm(wav, codec="wav")
    ref = (0.5 * 32767 * np.sin(2 * np.pi * 440.0 * np.arange(1000) / 8000)).astype("<i2")
    assert np.array_equal(x, ref.astype(np.int64))
    # auto sniffs the RIFF magic and takes the same path
    assert np.array_equal(decode_audio_pcm(wav, codec="auto"), x)
    # stereo: mean of the two identical channels == mono
    st = decode_audio_pcm(_make_wav(440.0, n=1000, nch=2), codec="wav")
    assert np.array_equal(st, x)
    # 8-bit: recentered, scaled copy stays sign-correlated with 16-bit
    b8 = decode_audio_pcm(_make_wav(440.0, n=1000, width=1), codec="wav")
    assert len(b8) == 1000 and abs(int(b8.max())) <= 128
    assert np.sign(b8[10]) == np.sign(x[10])
    # non-WAV bytes under stub: the 8-bit PCM byte model, unchanged
    raw = bytes(range(64))
    assert np.array_equal(
        decode_audio_pcm(raw, codec="stub"),
        np.frombuffer(raw, dtype=np.int8).astype(np.int64),
    )


def test_audio_near_pairs_real_wav_decode(spark):
    """The closure of the last stub modality: with codec='wav', a
    RE-ENCODED clip — the same PCM rewritten through a fresh stereo
    container (lossless for PCM; decode downmixes back) and truncated by
    one hop (a trimmed export) — matches its original, while an
    unrelated clip (different envelope dynamics) matches nothing — on
    REAL decoded PCM, stdlib-only, no gate."""
    from bitfilters_spark.operators.multimodal import audio_near_pairs

    env_a = [1.0, 0.1, 0.7, 0.02, 0.9, 0.3, 0.05, 1.0, 0.5, 0.15,
             0.8, 0.04, 0.6, 1.0, 0.2, 0.35]
    env_b = [0.05, 0.9, 0.02, 1.0, 0.15, 0.6, 1.0, 0.08, 0.3, 0.9,
             0.02, 0.75, 0.1, 0.4, 1.0, 0.02]
    a = _make_wav(440.0, n=32000, amp=0.50, envelope=env_a)
    a2 = _make_wav(440.0, n=31488, amp=0.50, envelope=env_a, nch=2)  # re-encode
    b = _make_wav(440.0, n=32000, amp=0.50, envelope=env_b)  # unrelated content
    df = spark.createDataFrame(
        [(1, a), (2, a2), (3, b)], "doc_id long, payload binary"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in audio_near_pairs(df, "doc_id", threshold=0.5, codec="wav").collect()
    }
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_decode_audio_codec_used_surfaces_degradation(spark):
    """r9 ADVICE: codec='auto' degrading to the stub must be DETECTABLE.
    return_codec names the decoder that ran, and sample_audio_windows
    surfaces it as the codec_used column so a corpus run can count
    undecoded compressed clips instead of fingerprinting garbage."""
    from bitfilters_spark.operators.multimodal import (
        decode_audio_pcm,
        sample_audio_windows,
    )

    wav = _make_wav(440.0, n=2048)
    _, used_wav = decode_audio_pcm(wav, codec="auto", return_codec=True)
    assert used_wav == "wav"
    junk = b"\x01\x02" * 700  # not a parseable container anywhere
    _, used_junk = decode_audio_pcm(junk, codec="auto", return_codec=True)
    assert used_junk == "stub"

    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(junk))], "doc_id long, payload binary"
    )
    got = {
        (r["doc_id"], r["codec_used"])
        for r in sample_audio_windows(df, codec="auto").collect()
    }
    assert {(1, "wav"), (2, "stub")} == {(d, c) for d, c in got}
