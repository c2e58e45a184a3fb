"""DuckDB-compatible hashing, vectorized with numpy.

Reimplements (from public DuckDB source semantics, as also documented by the
reference extension in ``bitfilters_duckdb_bloom_filter.cpp:78-175``):

* ``murmur_mix`` — DuckDB's integer hash finalizer (``MurmurHash64``):
  three xor-shift-32 / multiply rounds with constant ``0xd6e8feb86659fd93``.
  Identical in DuckDB v1.0 through v1.6 for ints, floats and timestamps.
* string hashing:
  - v1.4.0+ (``v14``): length-seeded chunked multiply-xor loop followed by
    ``murmur_mix`` (reference ``HashBytes_v1_5``).
  - v1.0.0 (``v10``): classic MurmurHash64A with seed ``0xe17a1465`` —
    this is what the ``duckdb==1.0.0`` oracle in this container uses
    (verified empirically in tests/test_hashing.py).
* ``combine_hash(a, b) = (mix32(a) * C) ^ b`` — DuckDB's CombineHash.

All arithmetic is uint64 with natural wraparound.  NULLs hash to 0 (DuckDB
``HashVectorTyped`` semantics).
"""

from __future__ import annotations

import numpy as np

MURMUR_C = np.uint64(0xD6E8FEB86659FD93)
_M64A = np.uint64(0xC6A4A7935BD1E995)
_SEED_V10 = np.uint64(0xE17A1465)
_R47 = np.uint64(47)
_R32 = np.uint64(32)

#: versions accepted by duckdb_hash / bloom functions. All share the integer
#: hash; they differ only in the string/bytes algorithm.
SUPPORTED_VERSIONS = (
    "v1.0.0",
    "v1.4.0",
    "v1.4.1",
    "v1.4.2",
    "v1.4.3",
    "v1.4.4",
    "v1.5.0",
    "v1.5.1",
    "v1.6.0",
)


def _string_algo(version: str) -> str:
    v = version.lstrip("v")
    if version not in SUPPORTED_VERSIONS and f"v{v}" not in SUPPORTED_VERSIONS:
        raise ValueError(
            f"Unsupported DuckDB version {version!r}; supported: {SUPPORTED_VERSIONS}"
        )
    return "v10" if v == "1.0.0" else "v14"


def murmur_mix(x: np.ndarray) -> np.ndarray:
    """DuckDB MurmurHash64 finalizer over a uint64 array."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> _R32
        x *= MURMUR_C
        x ^= x >> _R32
        x *= MURMUR_C
        x ^= x >> _R32
    return x


def combine_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """DuckDB CombineHash: ``a ^= a>>32; a *= C; return a ^ b``."""
    with np.errstate(over="ignore"):
        a = a.astype(np.uint64, copy=True)
        a ^= a >> _R32
        a *= MURMUR_C
        return a ^ b.astype(np.uint64)


def hash_int_narrow(v: np.ndarray) -> np.ndarray:
    """Hash for <=32-bit integers: value is sign-extended to int32 then
    reinterpreted as uint32 (so -1 hashes as 0xFFFFFFFF) before mixing."""
    u32 = v.astype(np.int64).astype(np.int32).view(np.uint32).astype(np.uint64)
    return murmur_mix(u32)


def hash_int64(v: np.ndarray) -> np.ndarray:
    return murmur_mix(v.astype(np.int64).view(np.uint64))


def hash_float64(v: np.ndarray) -> np.ndarray:
    d = v.astype(np.float64, copy=True)
    d[d == 0.0] = 0.0  # normalize -0.0 -> +0.0
    d[np.isnan(d)] = np.nan  # canonical NaN
    return murmur_mix(d.view(np.uint64))


def hash_float32(v: np.ndarray) -> np.ndarray:
    f = v.astype(np.float32, copy=True)
    f[f == 0.0] = np.float32(0.0)
    f[np.isnan(f)] = np.float32(np.nan)
    return murmur_mix(f.view(np.uint32).astype(np.uint64))


def _pad_to_words(data: list) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of ``bytes`` (None -> empty) into an (n, nwords) uint64
    little-endian matrix plus a lengths vector. Rows are zero-padded, which
    matches both algorithms' tail handling (memcpy into zeroed word)."""
    n = len(data)
    lens = np.zeros(n, dtype=np.uint64)
    for i, b in enumerate(data):
        if b is not None:
            lens[i] = len(b)
    maxlen = int(lens.max()) if n else 0
    nwords = max(1, (maxlen + 7) // 8)
    buf = np.zeros((n, nwords * 8), dtype=np.uint8)
    for i, b in enumerate(data):
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return buf.view("<u8").reshape(n, nwords), lens


def pack_flat_to_words(
    data: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``_pad_to_words`` over a FLAT byte buffer + offsets (the
    Arrow string/binary layout): no per-row Python. Rows are zero-padded."""
    n = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    maxlen = int(lens.max()) if n else 0
    nwords = max(1, (maxlen + 7) // 8)
    buf = np.zeros((n, nwords * 8), dtype=np.uint8)
    if maxlen:
        cols = np.arange(maxlen, dtype=np.int64)
        mask = cols[None, :] < lens[:, None]
        pos = offsets[:-1, None].astype(np.int64) + cols[None, :]
        buf[:, :maxlen][mask] = data[pos[mask]]
    return buf.view("<u8").reshape(n, nwords), lens.astype(np.uint64)


def hash_bytes_v10(data: list) -> np.ndarray:
    """MurmurHash64A(seed=0xe17a1465) — DuckDB 1.0.x string hash."""
    h = hash_words_v10(*_pad_to_words(data))
    h[np.array([b is None for b in data], dtype=bool)] = np.uint64(0)
    return h


def hash_words_v10(words: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """v10 algorithm over a pre-packed (n, nwords) u64 matrix + lengths."""
    n = len(lens)
    with np.errstate(over="ignore"):
        h = _SEED_V10 ^ (lens * _M64A)
        fullw = lens >> np.uint64(3)
        rem = lens & np.uint64(7)
        for w in range(words.shape[1]):
            mask = fullw > w
            if not mask.any():
                break
            k = words[:, w] * _M64A
            k ^= k >> _R47
            k *= _M64A
            h = np.where(mask, (h ^ k) * _M64A, h)
        tmask = rem > 0
        if tmask.any():
            tw = words[np.arange(n), np.minimum(fullw, np.uint64(words.shape[1] - 1)).astype(np.int64)]
            h = np.where(tmask, (h ^ tw) * _M64A, h)
        h ^= h >> _R47
        h *= _M64A
        h ^= h >> _R47
    return h


def hash_bytes_v14(data: list) -> np.ndarray:
    """DuckDB v1.4+ string hash (reference ``HashBytes_v1_5``)."""
    h = hash_words_v14(*_pad_to_words(data))
    h[np.array([b is None for b in data], dtype=bool)] = np.uint64(0)
    return h


def hash_words_v14(words: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """v14 algorithm over a pre-packed (n, nwords) u64 matrix + lengths."""
    n = len(lens)
    with np.errstate(over="ignore"):
        h = np.uint64(0xE17A1465) ^ (lens * _M64A)
        fullw = lens >> np.uint64(3)
        rem = lens & np.uint64(7)
        for w in range(words.shape[1]):
            mask = fullw > w
            if not mask.any():
                break
            h = np.where(mask, (h ^ words[:, w]) * MURMUR_C, h)
        tmask = rem > 0
        if tmask.any():
            tw = words[np.arange(n), np.minimum(fullw, np.uint64(words.shape[1] - 1)).astype(np.int64)]
            h = np.where(tmask, (h ^ tw) * MURMUR_C, h)
    return murmur_mix(h)


def hash_bytes(data: list, version: str = "v1.0.0") -> np.ndarray:
    return hash_bytes_v10(data) if _string_algo(version) == "v10" else hash_bytes_v14(data)


def hash_words(words: np.ndarray, lens: np.ndarray, version: str = "v1.0.0") -> np.ndarray:
    return (
        hash_words_v10(words, lens)
        if _string_algo(version) == "v10"
        else hash_words_v14(words, lens)
    )
