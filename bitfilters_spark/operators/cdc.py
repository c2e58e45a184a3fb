"""Content-defined chunking (FastCDC-style gear hash) — shift-invariant
dedup units.

Fixed-size or fixed-token chunking breaks under EDITS: inserting one
byte near the top of a page shifts every later chunk boundary, so a
re-crawled page that gained a banner dedups as 0% identical to
yesterday's copy. Content-defined chunking (Muthitacharoen et al. 2001
LBFS; Xia et al. 2016 FastCDC) cuts where a ROLLING HASH of the local
byte window hits a mask — boundaries are a pure function of local
content, so an insertion disturbs only the chunk it lands in and
boundaries re-synchronize immediately after. That is the storage-dedup
trick (rsync/borg/ZFS) applied to corpus maintenance: re-crawls, doc
versions, and boilerplate-wrapped copies share most chunk hashes even
when nothing aligns byte-for-byte.

The gear hash is the FastCDC rolling function: ``h = (h << 1) +
gear[byte]`` over a 256-entry random table — after 64 steps a byte has
shifted out of the 64-bit word, so ``h_i`` depends on exactly the last
64 bytes and is computable VECTORIZED as sixty-four shifted numpy adds
per document (wrapping uint64 — which is why the kernel lives in an
Arrow-batched ``mapInPandas``, not ANSI Column arithmetic; the repo's
`functions/hashing.py` convention). Boundary candidates are the
positions with ``h & mask == 0`` (mask = 2^log2(avg) − 1 ⇒ expected
chunk ≈ avg bytes); the min/max walk over the CANDIDATE list (not the
bytes) enforces [min_size, max_size] with forced cuts, exactly the
FastCDC normalization shape.

Spark posture: chunking is row-local (no shuffle — the scan's
partitioning survives); the dup report's only wide op is one
8-byte-hash aggregation with a map-side-combined ``min(struct)`` winner
election (the `substring.py`/`dedup_paragraphs` shape, so a 10^8-copy
boilerplate chunk partial-aggregates instead of hot-spotting a task).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["gear_table", "cdc_chunks", "cdc_dup_report"]


def gear_table(seed: int = 0x3ECD) -> np.ndarray:
    """Deterministic 256-entry uint64 gear table via splitmix64 — same
    table on every executor, session, and engine (no RNG state)."""
    out = np.empty(256, dtype=np.uint64)
    x = np.uint64(seed)
    for i in range(256):
        x = np.uint64((int(x) + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        z = int(x)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out[i] = np.uint64(z ^ (z >> 31))
    return out


def _gear_hashes(data: np.ndarray, gear: np.ndarray) -> np.ndarray:
    """h[i] = sum_{j=0..63} gear[data[i-j]] << j (wrapping uint64) —
    the gear rolling hash at every position, vectorized: 64 shifted
    adds instead of a per-byte loop."""
    g = gear[data]
    h = g.copy()
    n = len(g)
    for j in range(1, min(64, n)):
        h[j:] += g[: n - j] << np.uint64(j)
    return h


def _boundaries(
    h: np.ndarray, n: int, min_size: int, max_size: int, mask: int
) -> list:
    """Chunk end positions (exclusive) — walk the candidate list, not
    the bytes: next cut is the first mask-hit in [start+min_size,
    start+max_size], else a forced cut at start+max_size. The TAIL also
    honors candidates (r13 review): when fewer than max_size bytes
    remain, a mask hit in [start+min_size, n) still cuts — dropping it
    would desynchronize suffix-edited re-crawls, the exact pattern CDC
    exists for; only a candidate-free tail (or one shorter than
    min_size) becomes the final short chunk."""
    cand = np.nonzero((h & np.uint64(mask)) == 0)[0] + 1  # cut AFTER pos
    ends = []
    start = 0
    while start < n:
        lo, hi = start + min_size, start + max_size
        ci = int(np.searchsorted(cand, lo))
        if ci < len(cand) and cand[ci] <= min(hi, n - 1):
            ends.append(int(cand[ci]))
        elif hi >= n:
            ends.append(n)
        else:
            ends.append(hi)
        start = ends[-1]
    return ends


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
    keep_bytes: bool = True,
) -> DataFrame:
    """(id, chunk_id, start, length, chunk_hash[, chunk_bytes]) — the
    document split at content-defined boundaries. CDC is a BYTE-level
    operator: ``start``/``length`` index the UTF-8 encoding, cuts can
    land inside a multi-byte codepoint, and the payload column is
    therefore BINARY ``chunk_bytes`` (exact — a lossy text decode would
    silently corrupt split codepoints with U+FFFD; decode AFTER
    reassembly, never per chunk). ``chunk_hash`` is the 60-bit md5
    integer of the chunk bytes (the cross-engine-parity hash family
    `span_corruption(hash="duckdb")` uses), so equal chunks collide
    deterministically everywhere. Chunks partition the document
    exactly (law pinned in pytest on a multi-byte corpus: byte-concat
    of chunks == the document's UTF-8); every chunk length is in
    [min_size, max_size] except a shorter final chunk. The id column
    keeps its input dtype (string keys work). NULL/empty documents
    produce no chunk rows — there is nothing to chunk;
    `cdc_dup_report` still reports them (n_chunks = 0)."""
    if not 0 < min_size <= avg_size <= max_size:
        raise ValueError("require 0 < min_size <= avg_size <= max_size")
    bits = max(1, int(round(np.log2(avg_size))))
    mask = (1 << bits) - 1
    gear = gear_table()

    fields = [
        StructField("__id", df.schema[id_col].dataType),
        StructField("chunk_id", LongType()),
        StructField("start", LongType()),
        StructField("length", LongType()),
        StructField("chunk_hash", LongType()),
    ]
    if keep_bytes:
        fields.append(StructField("chunk_bytes", BinaryType()))
    schema = StructType(fields)

    # Batched hashing (min_size >= 64 only): concatenate the batch's
    # bytes and run the 64 shifted adds ONCE over the whole buffer
    # instead of per document (64 tiny numpy ops per row was the
    # measured cost at 50k-doc stress). A position's gear window then
    # reaches into the PREVIOUS document for absolute offsets 0..62 —
    # but a cut after position p implies p >= min_size-1 >= 63, so the
    # contaminated positions are never consulted and the batched path
    # is EXACT (pinned against the per-doc path in pytest). Below 63
    # the per-doc path runs instead.
    batched = min_size >= 64

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            docs = [
                (did, txt.encode("utf-8"))
                for did, txt in zip(pdf[id_col], pdf[text_col])
                if txt is not None and len(txt) > 0
            ]
            if not docs:
                yield pd.DataFrame(
                    [],
                    columns=["__id", "chunk_id", "start", "length",
                             "chunk_hash"]
                    + (["chunk_bytes"] if keep_bytes else []),
                )
                continue
            if batched:
                buf = np.frombuffer(b"".join(b for _, b in docs), np.uint8)
                hall = _gear_hashes(buf, gear)
            off = 0
            for did, raw in docs:
                data = np.frombuffer(raw, dtype=np.uint8)
                n = len(data)
                if batched:
                    h = hall[off : off + n]
                    off += n
                else:
                    h = _gear_hashes(data, gear)
                ends = _boundaries(h, n, min_size, max_size, mask)
                start = 0
                for cid, end in enumerate(ends):
                    blob = raw[start:end]
                    chash = int(hashlib.md5(blob).hexdigest()[:15], 16)
                    row = [did, cid, start, end - start, chash]
                    if keep_bytes:
                        row.append(blob)
                    out.append(tuple(row))
                    start = end
            cols = ["__id", "chunk_id", "start", "length", "chunk_hash"]
            if keep_bytes:
                cols.append("chunk_bytes")
            yield pd.DataFrame(out, columns=cols)

    return (
        df.select(id_col, text_col)
        .mapInPandas(kernel, schema=schema)
        .withColumnRenamed("__id", id_col)
    )


def cdc_dup_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> DataFrame:
    """Per-document chunk-level dedup accounting: ``n_chunks``,
    ``n_dup_chunks`` (chunks whose bytes occur at an EARLIER
    (id, chunk_id) anywhere in the corpus — first occurrence corpus-wide
    stays unflagged, the `substring.py` winner convention), and
    ``dup_bytes`` (their byte mass — the storage/training tokens a
    chunk-level dedup would save). One chunking pass + one hash-keyed
    aggregation with a map-side ``min(struct)`` election."""
    chunks = cdc_chunks(
        df, id_col, text_col, min_size, avg_size, max_size, keep_bytes=False
    )
    winners = chunks.groupBy("chunk_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_id"))).alias("__w")
    )
    flagged = chunks.join(winners, "chunk_hash").withColumn(
        "__dup",
        (F.col("__w")[id_col] != F.col(id_col))
        | (F.col("__w")["chunk_id"] != F.col("chunk_id")),
    )
    per = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("__dup").cast("long")).alias("n_dup_chunks"),
        F.sum(F.when(F.col("__dup"), F.col("length")).otherwise(F.lit(0))).alias(
            "dup_bytes"
        ),
    )
    # LEFT join back onto the input ids: NULL/empty documents produce no
    # chunks, but per-document accounting must still cover them
    # (n_chunks = 0) — r13 review
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).alias("n_dup_chunks"),
            F.coalesce("dup_bytes", F.lit(0)).alias("dup_bytes"),
        )
    )
