"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. The Spark-side mechanics — schema, Arrow batch shape,
``mapInPandas`` partitioned decode, deterministic partitioning — are real
and tested. Codec calls are FEATURE-GATED: when Pillow imports, the
``codec="auto"``/``codec="pil"`` paths decode/resize real image bytes;
otherwise (and for payloads that aren't parseable images) a deterministic
stub parse keeps pipelines end-to-end testable with byte-derived,
oracle-expressible outputs. The entry queries pin ``codec="stub"`` so
their DuckDB oracles hold in any environment; production pipelines use
the default ``"auto"``.
"""

from __future__ import annotations

import io
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _pil():
    """Import Pillow lazily (inside executors too); None when absent."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


HAS_PIL = _pil() is not None


def _resolve_codec(codec: str) -> str:
    if codec not in ("auto", "stub", "pil"):
        raise ValueError(f"codec must be auto|stub|pil, got {codec!r}")
    if codec == "pil" and _pil() is None:
        raise ImportError("codec='pil' requested but Pillow is not installed")
    return codec


FORMATS = ("png", "jpeg", "webp")

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def _decode_payload(payload: bytes) -> tuple:
    """STUB decoder — deterministic fake "header parse" deriving metadata
    purely from byte content, so results are reproducible (and
    oracle-expressible for tests)."""
    if not payload:
        return ("png", 0, 0, 0)
    fmt = FORMATS[len(payload) % 3]
    width = (payload[0] % 16) * 16 + 16
    height = (len(payload) % 16) * 16 + 16
    return (fmt, width, height, len(payload))


def _decode_payload_real(payload: bytes) -> tuple:
    """Pillow header parse; raises when the bytes aren't a known image."""
    Image = _pil()
    with Image.open(io.BytesIO(payload)) as im:
        return ((im.format or "unknown").lower(), im.width, im.height, len(payload))


def _decode_any(payload: bytes, codec: str) -> tuple:
    if codec != "stub" and payload:
        try:
            return _decode_payload_real(payload)
        except Exception:
            if codec == "pil":
                raise
    return _decode_payload(payload)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload column (stand-in for real image bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "auto",
) -> DataFrame:
    """Decode payload headers into typed metadata via mapInPandas.

    ``codec``: "auto" (Pillow when importable, per-payload stub fallback),
    "stub" (always deterministic fake), "pil" (require Pillow, raise on
    unparseable payloads)."""
    codec = _resolve_codec(codec)
    if codec == "auto" and not HAS_PIL:
        codec = "stub"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_any(bytes(b) if b is not None else b"", codec) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "n_bytes": [m[3] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "auto",
) -> DataFrame:
    """Resize every payload to (width, height). With Pillow (codec "auto"
    when importable, or "pil") parseable payloads are decoded, resampled
    and re-encoded as PNG; otherwise the deterministic stub re-encodes the
    payload to ``width*height // 64`` bytes by cycling the source bytes.
    The production mechanics — binary in/binary out mapInPandas, Arrow
    batches, per-partition parallelism — are identical on both paths."""
    codec = _resolve_codec(codec)
    if codec == "auto" and not HAS_PIL:
        codec = "stub"
    target = max(1, width * height // 64)

    def _resize_stub(b: bytes) -> bytes:
        src = np.frombuffer(b or b"\0", dtype=np.uint8)
        if not len(src):
            src = np.zeros(1, dtype=np.uint8)
        return src[np.arange(target) % len(src)].tobytes()

    def _resize_real(b: bytes) -> bytes:
        Image = _pil()
        with Image.open(io.BytesIO(b)) as im:
            buf = io.BytesIO()
            im.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                if codec != "stub" and b:
                    try:
                        out.append(_resize_real(b))
                        continue
                    except Exception:
                        if codec == "pil":
                            raise
                out.append(_resize_stub(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """STUB frame sampler ("video" payload -> k frames). Video decode has
    no Pillow path (needs libav/ffmpeg, not in this environment), so this
    stays stub-only: a payload of L bytes yields k = (L % 4) + 1 frames of
    L // k bytes each — the row-explosion shape (1 input row -> k output
    rows through mapInPandas) is real and the result is
    oracle-expressible. Swap the loop body for av.open(...) frame
    iteration in production."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                L = len(b) if b is not None else 0
                k = (L % 4) + 1
                for f in range(k):
                    ids.append(int(i))
                    idxs.append(f)
                    sizes.append(L // k)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "n_bytes": sizes})

    return df.select(id_col, payload_col).mapInPandas(frames, schema=FRAME_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "auto",
) -> DataFrame:
    """Feature extractor in the shape a real encoder (CLIP, wav2vec, ...)
    would produce. With Pillow, parseable images yield a normalized
    grayscale-luminance histogram (FEATURE_DIM bins); the stub path (and
    unparseable payloads under "auto") yields the deterministic
    byte-histogram. The Arrow batching / array<float> schema / partition
    parallelism are the production mechanics on both paths."""
    codec = _resolve_codec(codec)
    if codec == "auto" and not HAS_PIL:
        codec = "stub"

    def _hist(vals: np.ndarray) -> np.ndarray:
        hist = np.bincount(vals % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
        total = hist.sum() or 1.0
        return (hist / total).astype(np.float32)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for raw in pdf[payload_col]:
                b = bytes(raw) if raw is not None else b""
                if codec != "stub" and b:
                    try:
                        Image = _pil()
                        with Image.open(io.BytesIO(b)) as im:
                            px = np.asarray(im.convert("L"), dtype=np.uint8).ravel()
                        out.append(_hist(px // (256 // FEATURE_DIM)))
                        continue
                    except Exception:
                        if codec == "pil":
                            raise
                out.append(_hist(np.frombuffer(b, dtype=np.uint8)))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(dtype=np.int64), "features": out}
            )

    return df.select(id_col, payload_col).mapInPandas(feats, schema=FEATURE_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("start_sample", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        # which decoder actually ran (wav|soundfile|stub) — lets a corpus
        # run count/flag clips where codec='auto' degraded to the stub
        StructField("codec_used", StringType()),
    ]
)


def _soundfile():
    """Import soundfile lazily (inside executors too); None when absent."""
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except ImportError:
        return None


HAS_SOUNDFILE = _soundfile() is not None


def decode_audio_pcm(
    payload: bytes, codec: str = "auto", return_codec: bool = False
):
    """Decode an audio payload to an int64 mono PCM sample array.

    ``codec`` follows the module convention (cf. ``_resolve_codec``):

    - ``"wav"``: REAL decode of RIFF/WAVE containers via the stdlib
      ``wave`` module (always available — no gate): 8/16/32-bit PCM,
      multi-channel downmixed to mono by integer channel mean. This is
      the production path for the dominant uncompressed interchange
      format; energies stay integer-exact.
    - ``"soundfile"``: libsndfile-gated decode for compressed containers
      (FLAC/OGG/...); samples are read as int16 and downmixed the same
      way. Raises ImportError when the library is absent.
    - ``"stub"``: the payload's bytes read as 8-bit PCM — deterministic,
      dependency-free, oracle-stable (the pre-r9 behavior).
    - ``"auto"``: sniff the RIFF/WAVE magic -> ``wav``; else
      ``soundfile`` when importable and parseable; else ``stub``.

    ``auto`` DEGRADES to the stub read when soundfile is missing or the
    payload doesn't parse — real PCM only for containers it can decode.
    ``return_codec=True`` returns ``(samples, used)`` with ``used`` in
    ``{"wav", "soundfile", "stub"}`` so corpus-scale runs can DETECT
    degraded decodes instead of fingerprinting garbage silently (the
    r9 advisory); ``sample_audio_windows`` surfaces it as the
    ``codec_used`` column."""
    if codec not in ("auto", "stub", "wav", "soundfile"):
        raise ValueError(f"codec must be auto|stub|wav|soundfile, got {codec!r}")

    def _ret(x, used):
        return (x, used) if return_codec else x

    is_wav = payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    if codec == "wav" or (codec == "auto" and is_wav):
        import io as _io  # noqa: PLC0415
        import wave  # noqa: PLC0415

        with wave.open(_io.BytesIO(payload), "rb") as w:
            nch, width = w.getnchannels(), w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 1:  # WAV 8-bit is unsigned, centered at 128
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
        elif width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        elif width == 4:
            x = np.frombuffer(raw, dtype="<i4").astype(np.int64)
        else:
            raise ValueError(f"unsupported WAV sample width {width}")
        if nch > 1:  # integer mean keeps energies engine-reproducible
            x = x[: len(x) - len(x) % nch].reshape(-1, nch).sum(axis=1) // nch
        return _ret(x, "wav")
    if codec == "soundfile" or (codec == "auto" and not is_wav and HAS_SOUNDFILE):
        sf = _soundfile()
        if sf is None:
            raise ImportError("codec='soundfile' requested but soundfile is not installed")
        import io as _io  # noqa: PLC0415

        try:
            data, _sr = sf.read(_io.BytesIO(payload), dtype="int16", always_2d=True)
            return _ret(data.astype(np.int64).sum(axis=1) // data.shape[1], "soundfile")
        except Exception:
            if codec == "soundfile":
                raise
    return _ret(np.frombuffer(payload, dtype=np.int8).astype(np.int64), "stub")


def sample_audio_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    win: int = 1024,
    hop: int = 512,
    codec: str = "stub",
) -> DataFrame:
    """Audio payload -> fixed-length overlapping analysis windows (the
    ASR / audio-embedding preprocessing shape: window, hop, per-window
    energy). The DECODE follows :func:`decode_audio_pcm` — ``codec="wav"``
    is a REAL PCM decode (stdlib ``wave``; 8/16/32-bit, mono downmix),
    ``"soundfile"`` the gated compressed-container path, ``"stub"``
    (default, oracle-stable) reads the bytes as 8-bit PCM; every row
    carries ``codec_used`` — which decoder actually ran — so an
    ``auto`` corpus run can count clips that degraded to the stub
    instead of fingerprinting garbage silently. The Spark
    mechanics are identical on every path: mapInPandas row explosion
    (one clip -> ceil(L/hop) windows), numpy-vectorized per-window
    energy (sum of squared samples, INTEGER arithmetic so the result is
    engine-reproducible), and a tail window shorter than ``win`` kept
    with its true sample count."""
    if win <= 0 or hop <= 0:
        raise ValueError("win and hop must be positive")

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wis, starts, lens, energies, useds = [], [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                x, used = decode_audio_pcm(
                    bytes(b), codec=codec, return_codec=True
                )
                L = len(x)
                for w, off in enumerate(range(0, max(L, 1), hop)):
                    if off >= L:
                        break
                    seg = x[off : off + win]
                    ids.append(int(i))
                    wis.append(w)
                    starts.append(off)
                    lens.append(len(seg))
                    energies.append(int(np.dot(seg, seg)))
                    useds.append(used)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": wis,
                    "start_sample": starts,
                    "n_samples": lens,
                    "energy": energies,
                    "codec_used": useds,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        windows, schema=AUDIO_WINDOW_SCHEMA
    )


# ----------------------------------------------------- perceptual hashing ---


def _phash_bits_gray(g: np.ndarray) -> int:
    """64-bit pHash core over a 32x32 grayscale array: 2D DCT-II (numpy
    matrix form; no scipy) -> top-left 8x8 low-frequency block minus the
    DC term -> median threshold. Shared by the Pillow image path and the
    ffmpeg video-keyframe path (a decoded keyframe IS a 32x32 gray
    array), so both modalities hash identically."""
    n = 32
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct = basis @ g @ basis.T
    low = dct[:8, :8].flatten()[1:]  # drop the DC coefficient
    med = np.median(low)
    bits = 0
    for i, v in enumerate(low):
        if v > med:
            bits |= 1 << i
    return bits


def _phash_bits_real(payload: bytes) -> int:
    """Classic 64-bit image pHash: Pillow grayscale 32x32 resize, then
    the shared DCT/median core. Visually-similar images land within a
    few bits of each other; that is the whole point."""
    Image = _pil()
    with Image.open(io.BytesIO(payload)) as im:
        g = np.asarray(
            im.convert("L").resize((32, 32), Image.BILINEAR), dtype=np.float64
        )
    return _phash_bits_gray(g)


def _phash_bits_stub(payload: bytes) -> int:
    """Deterministic stand-in with LOCAL STABILITY (small byte edits flip
    few bits): the payload is cut into 63 chunks and each bit is that
    chunk's byte-mean vs the global mean. Plumbing-only — it models
    'similar bytes -> similar hash', not perception."""
    if not payload:
        return 0
    x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    chunks = np.array_split(x, 63)
    means = np.array([c.mean() if len(c) else 0.0 for c in chunks])
    bits = 0
    for i, v in enumerate(means > x.mean()):
        if v:
            bits |= 1 << i
    return bits


def image_phash(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    codec: str = "auto",
    out_col: str = "phash",
) -> DataFrame:
    """(id, phash) — 64-bit perceptual hash per image payload, the
    standard image-dedup fingerprint (near-identical images differ in a
    few bits; crops/re-encodes stay close). Arrow-batched mapInPandas;
    ``codec`` follows the module convention (auto = Pillow when
    importable with per-payload stub fallback, stub = deterministic
    byte-model, pil = strict). Pairs via :func:`phash_near_pairs`."""
    codec = _resolve_codec(codec)
    if codec == "auto" and not HAS_PIL:
        codec = "stub"
    schema = StructType(
        [StructField("doc_id", LongType()), StructField(out_col, LongType())]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                if codec != "stub" and raw:
                    try:
                        h = _phash_bits_real(raw)
                    except Exception:
                        if codec == "pil":
                            raise
                        h = _phash_bits_stub(raw)
                else:
                    h = _phash_bits_stub(raw)
                ids.append(int(i))
                # two's-complement i64 (top bit of a u64 hash)
                hs.append(h - (1 << 64) if h >= 1 << 63 else h)
            yield pd.DataFrame({"doc_id": ids, out_col: pd.array(hs, dtype="int64")})

    return (
        df.select(id_col, payload_col)
        .mapInPandas(hash_batch, schema=schema)
        .withColumnRenamed("doc_id", id_col)
    )


def phash_near_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    max_hamming: int = 8,
    codec: str = "auto",
) -> DataFrame:
    """Image near-duplicate pairs: hamming(phash) <= max_hamming, via the
    SAME asymmetric multi-probe banding + exact bit_count verify as text
    SimHash (`dedup.simhash_pairs_from_sigs` — full recall, candidate
    volume bounded by the banding math, never all-pairs). The hash is
    16 bytes/image, so the pair join never touches payload bytes."""
    from .dedup import simhash_pairs_from_sigs

    sig = image_phash(df, id_col, payload_col, codec=codec, out_col="simhash").cache()
    return simhash_pairs_from_sigs(sig, id_col, max_hamming)


# ----------------------------------------------------- audio fingerprint ---


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    win: int = 1024,
    hop: int = 512,
    out_col: str = "afp",
    codec: str = "stub",
) -> DataFrame:
    """(id, afp) — an ENERGY-ENVELOPE fingerprint string per audio clip:
    each analysis window (from :func:`sample_audio_windows`) quantizes
    to its log2 energy symbol, symbols concatenate in window order. Two
    clips that share most of their envelope (same content, small edits,
    a re-encode the stub PCM model can express) share most of their
    symbol SHINGLES — which is exactly `minhash_lsh_pairs`' input
    contract, so audio near-dup is :func:`audio_near_pairs` = this
    column + the existing text machinery. A chromaprint-style DSP
    fingerprint slots in by replacing the symbol expression; the window
    explosion, ordered reassembly, and pair join stay as-is.

    Plan: the window explode is mapInPandas (∝ samples), the ordered
    reassembly is the encode_documents groupBy shape (one shuffle of
    (id, symbol longs)); log2-quantization happens in JVM exprs."""
    w = sample_audio_windows(df, id_col, payload_col, win=win, hop=hop, codec=codec)
    # eighth-of-an-octave energy bins: window-to-window jitter of a
    # steady signal (~±3% energy, ~0.04 in log2) stays in one symbol,
    # while real envelope movement (speech/music dynamics) crosses bins
    sym = F.floor(F.log2(F.col("energy") + F.lit(1.0)) * 8).cast("long")
    return (
        w.select(F.col(id_col), F.col("win_idx"), sym.alias("__sym"))
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("win_idx"), F.col("__sym")))
            ).alias("__ws")
        )
        .select(
            id_col,
            F.array_join(
                F.transform("__ws", lambda s: s["__sym"].cast("string")), " "
            ).alias(out_col),
        )
    )


def audio_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    threshold: float = 0.6,
    win: int = 1024,
    hop: int = 512,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    codec: str = "stub",
) -> DataFrame:
    """Audio near-duplicate pairs: MinHash+LSH over energy-envelope
    shingles (exact-Jaccard verified at ``threshold``, same recall
    semantics as text `minhash_lsh_pairs`). The pair join moves k longs
    per clip — payload bytes never shuffle. ``codec="wav"`` runs the
    REAL stdlib PCM decode (see :func:`decode_audio_pcm`)."""
    from .dedup import minhash_lsh_pairs

    fp = audio_fingerprint(df, id_col, payload_col, win, hop, codec=codec).cache()
    return minhash_lsh_pairs(
        fp, id_col, "afp", k=k, bands=bands, shingle_n=shingle_n,
        threshold=threshold,
    )


# ----------------------------------------------------- video fingerprint ---


def _ffmpeg():
    import shutil

    return shutil.which("ffmpeg")


HAS_FFMPEG = _ffmpeg() is not None


def _video_keyframes_real(payload: bytes, ffmpeg: str) -> list:
    """Decode a clip's KEYFRAMES (I-frames) to 32x32 grayscale arrays
    via the ffmpeg binary — temp file in (mp4-style containers need
    seekable input), rawvideo gray frames out. Clips whose encoder
    emitted no selectable I-frames fall back to decoding every frame so
    short/intra-only clips still fingerprint. Raises on bytes ffmpeg
    cannot decode."""
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".bin") as tf:
        tf.write(payload)
        tf.flush()
        base = [ffmpeg, "-v", "error", "-i", tf.name]
        tail = ["-vsync", "0", "-f", "rawvideo", "pipe:1"]
        out = subprocess.run(
            base + ["-vf", "select=eq(pict_type\\,I),scale=32:32,format=gray"]
            + tail,
            capture_output=True, check=True,
        ).stdout
        if not out:
            out = subprocess.run(
                base + ["-vf", "scale=32:32,format=gray"] + tail,
                capture_output=True, check=True,
            ).stdout
    n = len(out) // 1024
    if n == 0:
        raise ValueError("ffmpeg produced no frames")
    return [
        np.frombuffer(out[i * 1024 : (i + 1) * 1024], dtype=np.uint8)
        .astype(np.float64)
        .reshape(32, 32)
        for i in range(n)
    ]


def _resolve_video_codec(codec: str) -> str:
    if codec not in ("auto", "stub", "ffmpeg"):
        raise ValueError(f"codec must be auto|stub|ffmpeg, got {codec!r}")
    if codec == "ffmpeg" and _ffmpeg() is None:
        raise ImportError(
            "codec='ffmpeg' requested but no ffmpeg binary on PATH"
        )
    return codec


def video_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_len: int = 4096,
    out_col: str = "vfp",
    codec: str = "stub",
) -> DataFrame:
    """(id, vfp) — per-FRAME perceptual hashes in temporal order, one
    hex symbol per frame. Shingles over consecutive frame hashes capture
    temporal structure, so a re-cut sharing most scenes still matches
    while an unrelated clip shares nothing.

    ``codec`` follows the image-family convention (multimodal.py:48):

    - ``"stub"`` (default — oracle-stable, keeps entry queries
      deterministic): a "frame" is a fixed-length ``frame_len`` payload
      chunk hashed with the locally-stable stub pHash;
    - ``"ffmpeg"``: REAL keyframes — the ffmpeg binary (gated, like
      Pillow for images) decodes I-frames to 32x32 grayscale and each
      is hashed with the same DCT pHash core as `image_phash`
      (`_phash_bits_gray`); raises if no binary is on PATH;
    - ``"auto"``: ffmpeg when present, per-payload stub fallback
      (undecodable bytes or no binary).

    Downstream (`video_near_pairs`, the LSH machinery) is identical for
    both paths — the production swap the r6 docstring promised."""
    if frame_len <= 0:
        raise ValueError("frame_len must be positive")
    codec = _resolve_video_codec(codec)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField(out_col, StringType())]
    )

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ffmpeg = _ffmpeg() if codec != "stub" else None
        for pdf in batches:
            ids, fps = [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                hs = None
                if ffmpeg is not None and raw:
                    try:
                        hs = [
                            f"{_phash_bits_gray(g):016x}"
                            for g in _video_keyframes_real(raw, ffmpeg)
                        ]
                    except Exception:
                        if codec == "ffmpeg":
                            raise
                if hs is None:
                    hs = [
                        f"{_phash_bits_stub(raw[off : off + frame_len]):016x}"
                        for off in range(0, max(len(raw), 1), frame_len)
                    ]
                ids.append(int(i))
                fps.append(" ".join(hs))
            yield pd.DataFrame({"doc_id": ids, out_col: fps})

    return (
        df.select(id_col, payload_col)
        .mapInPandas(fp, schema=schema)
        .withColumnRenamed("doc_id", id_col)
    )


def video_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    threshold: float = 0.5,
    frame_len: int = 4096,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    codec: str = "stub",
) -> DataFrame:
    """Video near-duplicate pairs: MinHash+LSH over frame-hash shingles
    (exact-Jaccard verified) — the same pair machinery as text, audio
    (#94), and image (#92); the join moves k longs per clip. ``codec``
    passes through to `video_fingerprint` (stub chunks or real ffmpeg
    keyframes — the pair machinery is identical)."""
    from .dedup import minhash_lsh_pairs

    fp = video_fingerprint(df, id_col, payload_col, frame_len, codec=codec).cache()
    return minhash_lsh_pairs(
        fp, id_col, "vfp", k=k, bands=bands, shingle_n=shingle_n,
        threshold=threshold,
    )
