"""WARC crawl-archive ingest (#139) — the standard container every real
crawl corpus ships in (Common Crawl, Internet Archive; ISO 28500). The
engine's crawl loop starts from fetched pages; this is where fetched
pages actually COME FROM at 100 TB: directories of ``.warc`` /
``.warc.gz`` archives, each holding thousands of length-prefixed
records.

Spark-first shape: archives load through the built-in ``binaryFile``
source (one row per archive — Catalyst handles listing, partitioning
and pushdown on path/size), and record splitting runs in ONE
``mapInPandas`` pass per archive. Per-archive imperative Python is the
honest granularity here — a WARC file is a sequential container whose
records are found by walking Content-Length offsets, so the
parallelism that matters is ACROSS archives (a Common Crawl segment is
~56k files; 1000 executors chew the listing), never within one. Payload
bytes stay map-side: no shuffle touches them, and downstream column
pruning drops ``payload`` for metadata-only queries before it ever
crosses a stage boundary.

Failure posture (the `sources.ingest` dead-letter convention): a
malformed record ends parsing of THAT archive's remainder — offsets are
chained, so resynchronizing would guess — and emits one row with
``parse_error`` set (reason + byte offset) and the raw remainder as
payload for quarantine/replay; every prior good record is kept. Good
rows carry ``parse_error`` NULL.

gzip: Common Crawl archives are per-record gzip MEMBERS concatenated
into one ``.warc.gz`` — detected by magic bytes and inflated member by
member (zlib, stdlib); plain ``.warc`` bytes pass through.

Composition (pytest, tests/test_warc.py): ``read_warc`` →
:func:`warc_pages` → ``web.extract_links`` → ``graph.pagerank`` →
frontier — the crawl loop now starts from the wire format.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("record_offset", LongType()),
        StructField("record_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("http_location", StringType()),
        StructField("payload", BinaryType()),
        StructField("parse_error", StringType()),
    ]
)


def _gunzip_members(raw: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the Common Crawl layout:
    one member per record) into one plain byte stream."""
    out = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=47)  # 47 = auto gzip/zlib header
        out.append(d.decompress(raw[pos:]))
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:  # no forward progress: corrupt tail
            raise zlib.error(f"gzip member at offset {pos} did not advance")
        pos += consumed
    return b"".join(out)


def _parse_one(buf: bytes, source: str):
    """Yield WARC_SCHEMA tuples for one archive's plain bytes."""
    n = len(buf)
    pos = 0
    while pos < n:
        # skip inter-record CRLFs (spec: two CRLF after each block)
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        start = pos
        if not buf.startswith(b"WARC/", pos):
            yield (source, start, None, None, None, None, None, None, None, None,
                   bytes(buf[pos:]), f"expected WARC/ header at offset {start}")
            return
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield (source, start, None, None, None, None, None, None, None, None,
                   bytes(buf[pos:]), f"unterminated header at offset {start}")
            return
        headers = {}
        for line in buf[pos:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get(b"content-length", b""))
        except ValueError:
            clen = -1
        if clen < 0:
            # a negative Content-Length (e.g. b"-5" parses fine under int())
            # would walk `pos = body_start + clen` BACKWARDS onto this very
            # record's start and re-yield it forever — dead-letter and stop.
            yield (source, start, None, None, None, None, None, None, None, None,
                   bytes(buf[pos:]),
                   f"missing/invalid Content-Length at offset {start}")
            return
        body_start = hdr_end + 4
        if body_start + clen > n:
            yield (source, start, None, None, None, None, None, None, None, None,
                   bytes(buf[pos:]),
                   f"truncated record at offset {start} (need {clen} bytes)")
            return
        block = buf[body_start : body_start + clen]
        rtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
        ctype = headers.get(b"content-type", b"").decode("ascii", "replace")
        uri = headers.get(b"warc-target-uri")
        date = headers.get(b"warc-date")
        status = None
        http_ct = None
        http_loc = None
        payload = block
        # an application/http block carries HTTP headers + body: split
        # them so downstream gets the entity body and typed status/mime
        if ctype.lower().startswith("application/http"):
            sep = block.find(b"\r\n\r\n")
            if sep >= 0:
                http_head = block[:sep].split(b"\r\n")
                payload = block[sep + 4 :]
                first = http_head[0].split(b" ")
                if len(first) >= 2 and first[0].startswith(b"HTTP/"):
                    try:
                        status = int(first[1])
                    except ValueError:
                        status = None
                for line in http_head[1:]:
                    k, s2, v = line.partition(b":")
                    if not s2:
                        continue
                    key = k.strip().lower()
                    if key == b"content-type" and http_ct is None:
                        http_ct = v.strip().decode("ascii", "replace")
                    elif key == b"location" and http_loc is None:
                        http_loc = v.strip().decode("utf-8", "replace")
        yield (
            source,
            start,
            rtype,
            uri.decode("utf-8", "replace") if uri is not None else None,
            date.decode("ascii", "replace") if date is not None else None,
            ctype,
            clen,
            status,
            http_ct,
            http_loc,
            bytes(payload),
            None,
        )
        pos = body_start + clen


def parse_warc_records(
    df: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """(source_file, record_offset, record_type, target_uri, warc_date,
    content_type, content_length, http_status, http_content_type,
    http_location, payload, parse_error) — one row per WARC record, from one
    mapInPandas pass over (path, archive-bytes) rows. gzip archives
    (magic-detected) inflate member-by-member first."""

    def split(batches):
        for pdf in batches:
            rows = []
            for path, raw in zip(pdf[path_col], pdf[content_col]):
                raw = bytes(raw)
                if raw[:2] == b"\x1f\x8b":
                    try:
                        raw = _gunzip_members(raw)
                    except zlib.error as exc:
                        rows.append(
                            (path, 0, None, None, None, None, None, None,
                             None, None, raw, f"gzip: {exc}")
                        )
                        continue
                rows.extend(_parse_one(raw, path))
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA])

    return df.select(path_col, content_col).mapInPandas(
        split, schema=WARC_SCHEMA
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Records of every ``.warc``/``.warc.gz`` under ``path`` — the
    ``binaryFile`` source does the listing/partitioning (one task per
    archive), :func:`parse_warc_records` does the splitting."""
    return parse_warc_records(
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
    )


def warc_pages(records: DataFrame, min_status: int = 200, max_status: int = 299) -> DataFrame:
    """(url, html) fetched pages from a record stream: response records
    with a 2xx status, entity body read as UTF-8 bytes via a binary→
    string CAST — unlike ``decode(...,'UTF-8')``, the cast never throws
    on malformed sequences (one latin-1 page in a crawl must not kill
    the job; real charset repair is `fix_mojibake`'s job downstream) —
    the exact input shape ``web.extract_links``/``strip_html`` consume."""
    return (
        records.where(
            (F.col("record_type") == "response")
            & F.col("http_status").between(min_status, max_status)
            & F.col("parse_error").isNull()
        )
        .select(
            F.col("target_uri").alias("url"),
            F.col("payload").cast("string").alias("html"),
        )
    )


def surt_key(col) -> "F.Column":
    """SURT (Sort-friendly URI Reordering Transform) key of a URL —
    ``com,example)/path?q`` — the canonical CDX sort key: reversing the
    host labels puts every page of a registrable domain (and every
    subdomain of it) into ONE contiguous key range, so a range scan
    answers "everything under example.com". Pure JVM expressions
    (parse_url + split/reverse/array_join); scheme/port/fragment drop,
    host lowercases, NULL for unparseable URLs."""
    c = F.col(col) if isinstance(col, str) else col
    # r15 (guide §8.3, do the work once): the naive expression tree
    # references host 2x / path 2x / query 3x, and each reference is its
    # own ParseUrlEvaluator — 7 URL parses per row in the final plan
    # (plans/r14/q_crawl_frontier_after.txt:145). Bind the three parsed
    # parts to a higher-order-function lambda variable instead: the
    # struct is evaluated ONCE per row (3 parses) and every downstream
    # reference reads the bound value. Catalyst cannot inline through a
    # lambda binding, so projection collapse can't re-duplicate them.
    parts = F.struct(
        F.lower(F.try_parse_url(c, F.lit("HOST"))).alias("h"),
        F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit("")).alias("p"),
        F.try_parse_url(c, F.lit("QUERY")).alias("q"),
    )

    def _assemble(s):
        host, path, query = s["h"], s["p"], s["q"]
        rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
        rest = F.when(
            query.isNull() | (query == ""), path
        ).otherwise(F.concat(path, F.lit("?"), query))
        return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
            F.concat(rev, F.lit(")"), rest)
        )

    return F.element_at(F.transform(F.array(parts), _assemble), 1)


def warc_cdx(records: DataFrame) -> DataFrame:
    """(surt, warc_date, url, source_file, record_offset, http_status,
    mime) — the CDX-style capture index of a record stream: everything a
    random-access reader needs to seek one record out of a 100 TB
    archive set without scanning it. Response records only; rows with a
    NULL surt (unparseable URI) are kept with surt NULL so nothing is
    silently lost — filter or quarantine by policy."""
    return records.where(
        (F.col("record_type") == "response") & F.col("parse_error").isNull()
    ).select(
        surt_key("target_uri").alias("surt"),
        "warc_date",
        F.col("target_uri").alias("url"),
        "source_file",
        "record_offset",
        "http_status",
        F.col("http_content_type").alias("mime"),
    )


def write_cdx(records: DataFrame, path: str, num_files: int = 32) -> None:
    """Materialize the capture index GLOBALLY SORTED by (surt,
    warc_date): ``repartitionByRange`` gives non-overlapping sorted key
    ranges across ``num_files`` files and the in-file sort finishes the
    order — a reader binary-searches file ranges by parquet min/max
    stats, then rows within the file; one shuffle total, index-scale
    (metadata columns only, payloads never move)."""
    (
        warc_cdx(records)
        .repartitionByRange(num_files, F.col("surt"), F.col("warc_date"))
        .sortWithinPartitions("surt", "warc_date")
        .write.mode("overwrite")
        .parquet(path)
    )


def latest_captures(cdx: DataFrame) -> DataFrame:
    """One row per URL — the NEWEST capture (max ``warc_date``, archive
    position as the deterministic tiebreak) — the recrawl-dedup cut a
    training pipeline takes before text extraction: a page captured 40
    times contributes one document, and `snapshot_diff`-style consumers
    get exactly the freshest body. One window over the surt key — the
    same partitioning the sorted CDX layout already has."""
    from pyspark.sql import Window

    w = Window.partitionBy("surt").orderBy(
        F.col("warc_date").desc(),
        F.col("source_file").desc(),
        F.col("record_offset").desc(),
    )
    return (
        cdx.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )


def cdx_lookup(
    spark: SparkSession, path: str, url_or_domain: str
) -> DataFrame:
    """Range lookup on a :func:`write_cdx` index: all captures of one
    URL, or of EVERYTHING under a domain (pass ``example.com`` or any
    URL — a domain becomes the SURT prefix ``com,example``, which is
    exactly why the index is SURT-sorted). The prefix turns into a
    ``surt >= p AND surt < p+MAXCHAR`` range predicate that parquet
    min/max stats push to the file level: on the range-sorted layout a
    reader opens only the covering files, never the 100 TB index —
    the read-side payoff of :func:`write_cdx`'s one sort."""
    probe = url_or_domain
    if "://" not in probe:
        # bare domain: reverse the labels ourselves (no URL to parse).
        # The naked label prefix must be CLOSED before widening — an open
        # range [com,example, com,example<MAX>) also swallows sibling
        # domains like com,exampleshop)/… — so match only the domain
        # itself (prefix + ')') and its subdomains (prefix + ',').
        prefix = ",".join(reversed(probe.lower().strip("/").split(".")))
        lo_self, hi_self = prefix + ")", prefix + ")" + "￿"
        lo_sub, hi_sub = prefix + ",", prefix + "," + "￿"
        return spark.read.parquet(path).where(
            ((F.col("surt") >= lo_self) & (F.col("surt") < hi_self))
            | ((F.col("surt") >= lo_sub) & (F.col("surt") < hi_sub))
        )
    row = (
        spark.range(1)
        .select(surt_key(F.lit(probe).cast("string")).alias("s"))
        .collect()[0]
    )
    if row["s"] is None:
        raise ValueError(f"cannot derive a SURT key from {url_or_domain!r}")
    # a full URL names ONE capture identity: its complete SURT key
    # (host))/path?query) — exact equality, else a probe for /path would
    # also return /pathological… from the open prefix range.
    return spark.read.parquet(path).where(F.col("surt") == row["s"])


def warc_redirects(records: DataFrame, normalize: bool = True) -> DataFrame:
    """Redirect edges out of a parsed archive: every 3xx response with a
    ``Location`` header becomes ``(src_url, dst_url, http_status,
    warc_date)``, the Location resolved against the capture URL per
    RFC 3986 (redirect Locations are allowed to be relative —
    `web.resolve_reference` handles every form) and both endpoints
    normalized like `web.extract_links` edges so redirect identity
    matches link/dedup/CDX identity. Feed the result to
    `web.resolve_redirect_chains` to collapse chains, then rewrite
    URL-keyed tables onto the canonical target — the step that makes a
    301-moved site count as ONE site instead of two.

    Pure column expressions over the already-parsed record table — the
    payload column is never touched (3xx bodies are boilerplate)."""
    from ..operators.web import normalize_url, resolve_reference

    r = records.where(
        (F.col("record_type") == "response")
        & F.col("parse_error").isNull()
        & F.col("http_status").between(300, 399)
        & F.col("http_location").isNotNull()
        & (F.trim(F.col("http_location")) != "")
    )
    src = F.col("target_uri")
    dst = resolve_reference(src, F.col("http_location"))
    if normalize:
        src, dst = normalize_url(src), normalize_url(dst)
    return r.select(
        src.alias("src_url"),
        dst.alias("dst_url"),
        "http_status",
        "warc_date",
    )
