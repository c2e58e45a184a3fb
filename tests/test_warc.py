"""WARC crawl-archive ingest (#139, sources/warc.py): record splitting
(plain + member-gzip), HTTP response payload extraction, dead-letter
rows for malformed tails, and the wire-format crawl-loop composition
read_warc → warc_pages → extract_links."""

import gzip

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.sources.warc import (
    WARC_SCHEMA,
    parse_warc_records,
    read_warc,
    warc_pages,
)


def _record(rtype, uri, body: bytes, ctype="application/http; msgtype=response"):
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _http_response(html: bytes, status=200, mime=b"text/html; charset=utf-8"):
    return (
        b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
        b"Content-Type: " + mime + b"\r\n"
        b"Server: test\r\n\r\n" + html
    )


def _archive():
    info = _record("warcinfo", None, b"software: test\r\n", ctype="application/warc-fields")
    page1 = _record(
        "response",
        "http://h1.test/index.html",
        _http_response(b'<a href="http://h2.test/x">next</a>'),
    )
    req = _record(
        "request",
        "http://h1.test/index.html",
        b"GET /index.html HTTP/1.1\r\nHost: h1.test\r\n\r\n",
        ctype="application/http; msgtype=request",
    )
    page2 = _record(
        "response",
        "http://h2.test/a/b.html",
        _http_response(b'<a href="../up.html">u</a>', status=200),
    )
    gone = _record(
        "response",
        "http://h2.test/gone",
        _http_response(b"not here", status=404),
    )
    return info + page1 + req + page2 + gone


def _df(spark, blobs):
    return spark.createDataFrame(
        [(f"file:/arc{i}.warc", b) for i, b in enumerate(blobs)],
        "path string, content binary",
    )


def test_plain_archive_records(spark):
    recs = parse_warc_records(_df(spark, [_archive()])).collect()
    assert [r.record_type for r in recs] == [
        "warcinfo", "response", "request", "response", "response"
    ]
    assert all(r.parse_error is None for r in recs)
    by_uri = {r.target_uri: r for r in recs if r.record_type == "response"}
    p1 = by_uri["http://h1.test/index.html"]
    assert p1.http_status == 200
    assert p1.http_content_type == "text/html; charset=utf-8"
    assert bytes(p1.payload) == b'<a href="http://h2.test/x">next</a>'
    assert by_uri["http://h2.test/gone"].http_status == 404
    # the warcinfo block is NOT http: raw payload, no status
    info = recs[0]
    assert info.http_status is None
    assert bytes(info.payload) == b"software: test\r\n"
    # offsets are increasing and start at 0
    offs = [r.record_offset for r in recs]
    assert offs[0] == 0 and offs == sorted(offs)


def test_gzip_member_archive(spark):
    """Common Crawl layout: one gzip member per record, concatenated."""
    members = b"".join(
        gzip.compress(part)
        for part in [
            _record("warcinfo", None, b"x", ctype="application/warc-fields"),
            _record(
                "response", "http://g.test/p", _http_response(b"<p>gz</p>")
            ),
        ]
    )
    recs = parse_warc_records(_df(spark, [members])).collect()
    assert [r.record_type for r in recs] == ["warcinfo", "response"]
    assert bytes(recs[1].payload) == b"<p>gz</p>"
    assert all(r.parse_error is None for r in recs)


def test_malformed_tail_dead_letter(spark):
    """A corrupt record keeps every prior good record and emits ONE
    parse_error row with the raw remainder for quarantine."""
    good = _record("response", "http://ok.test/", _http_response(b"fine"))
    bad = good + b"GARBAGE-NOT-A-HEADER" + b"\x00" * 10
    recs = parse_warc_records(_df(spark, [bad])).collect()
    assert len(recs) == 2
    assert recs[0].parse_error is None and recs[0].http_status == 200
    assert recs[1].parse_error is not None
    assert b"GARBAGE" in bytes(recs[1].payload)
    # truncated Content-Length is also a dead-letter, not a crash
    trunc = _record("response", "http://t.test/", _http_response(b"fine"))
    trunc = trunc[: len(trunc) - 12]  # cut into the body
    recs2 = parse_warc_records(_df(spark, [trunc])).collect()
    assert len(recs2) == 1 and "truncated" in recs2[0].parse_error


def test_negative_content_length_dead_letter(spark):
    """Adversarial `Content-Length: -N` must dead-letter and STOP, in
    bounded time — int(b'-N') parses fine and `pos = body_start + clen`
    with clen = -(header_len+4) lands exactly back on the record's own
    start, so the unguarded generator re-yields the same record forever
    (r11 verdict finding 1)."""
    body = _http_response(b"x")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://evil.test/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
    )
    # craft clen = -(len(head-with-clen-line) + 4): pos lands back on start
    for probe in range(-1, -400, -1):
        full_head = head + f"Content-Length: {probe}\r\n\r\n".encode()
        if probe == -len(full_head):
            evil = full_head + body + b"\r\n\r\n"
            break
    else:  # fall back: any negative length still must terminate
        evil = head + b"Content-Length: -7\r\n\r\n" + body + b"\r\n\r\n"
    good = _record("response", "http://ok.test/", _http_response(b"fine"))
    recs = parse_warc_records(_df(spark, [good + evil])).collect()
    assert len(recs) == 2
    assert recs[0].parse_error is None
    assert "Content-Length" in recs[1].parse_error


def test_cdx_lookup_surt_boundaries(spark, tmp_path):
    """SURT range boundaries (r11 verdict finding 2): a domain lookup for
    example.com must NOT return exampleshop.com (sibling label sharing
    the byte prefix), and a full-URL probe for /path must NOT return
    /pathological…"""
    from bitfilters_spark.sources.warc import cdx_lookup, write_cdx

    blobs = []
    for host, paths in (
        ("example.com", ["/path", "/pathological/long", "/other"]),
        ("exampleshop.com", ["/p"]),
        ("sub.example.com", ["/s"]),
    ):
        for p in paths:
            blobs.append(
                _record("response", f"http://{host}{p}", _http_response(b"x"))
            )
    recs = parse_warc_records(_df(spark, [b"".join(blobs)]))
    out = str(tmp_path / "cdx")
    write_cdx(recs, out, num_files=2)

    dom = {r.url for r in cdx_lookup(spark, out, "example.com").collect()}
    assert dom == {
        "http://example.com/path",
        "http://example.com/pathological/long",
        "http://example.com/other",
        "http://sub.example.com/s",
    }  # exampleshop.com excluded

    one = [r.url for r in cdx_lookup(spark, out, "http://example.com/path").collect()]
    assert one == ["http://example.com/path"]  # /pathological excluded


def test_read_warc_and_crawl_loop_composition(spark, tmp_path):
    """The wire-format front door: .warc.gz files on disk → binaryFile →
    records → warc_pages → extract_links. 404s and non-response records
    never become pages; the outlink edge comes out resolved."""
    from bitfilters_spark.operators.web import extract_links

    (tmp_path / "seg").mkdir()
    (tmp_path / "seg" / "a.warc").write_bytes(_archive())
    (tmp_path / "seg" / "b.warc.gz").write_bytes(
        gzip.compress(
            _record(
                "response",
                "http://h3.test/",
                _http_response(b'<a href="/deep">d</a>'),
            )
        )
    )
    (tmp_path / "seg" / "ignore.txt").write_bytes(b"not an archive")
    recs = read_warc(spark, str(tmp_path / "seg"))
    pages = warc_pages(recs)
    got = {r.url for r in pages.collect()}
    assert got == {
        "http://h1.test/index.html",
        "http://h2.test/a/b.html",
        "http://h3.test/",
    }
    edges = extract_links(pages, "html", "url")
    dsts = {r.dst_url for r in edges.collect()}
    assert dsts == {
        "http://h2.test/x",
        "http://h2.test/up.html",
        "http://h3.test/deep",
    }


def test_empty_and_non_utf8(spark):
    empty = spark.createDataFrame([], "path string, content binary")
    assert parse_warc_records(empty).count() == 0
    assert parse_warc_records(empty).schema == WARC_SCHEMA
    # latin-1 bytes in a page body must not kill the decode
    page = _record(
        "response", "http://l.test/", _http_response(b"caf\xe9 <a href='/x'>x</a>")
    )
    pages = warc_pages(parse_warc_records(_df(spark, [page])))
    [row] = pages.collect()
    assert "<a href='/x'>x</a>" in row.html


def test_surt_and_cdx_index(spark, tmp_path):
    """SURT keys put a domain's pages in one contiguous range; write_cdx
    materializes a globally-sorted capture index (non-overlapping file
    ranges + in-file order) that covers exactly the good response
    records."""
    from bitfilters_spark.sources.warc import surt_key, warc_cdx, write_cdx

    urls = spark.createDataFrame(
        [
            ("http://www.Example.com/a/b?q=1",),
            ("https://sub.example.com/x",),
            ("http://other.test/",),
            ("not a url",),
        ],
        ["u"],
    )
    got = [r.s for r in urls.select(surt_key("u").alias("s")).collect()]
    assert got[0] == "com,example,www)/a/b?q=1"
    assert got[1] == "com,example,sub)/x"
    assert got[2] == "test,other)/"
    assert got[3] is None
    # domain-range law: every example.com capture sorts together
    assert got[1].startswith("com,example,") and got[0].startswith("com,example,")

    recs = parse_warc_records(_df(spark, [_archive()]))
    cdx = warc_cdx(recs).collect()
    assert {r.url for r in cdx} == {
        "http://h1.test/index.html",
        "http://h2.test/a/b.html",
        "http://h2.test/gone",  # 404 stays in the INDEX (it was captured)
    }
    assert all(r.record_offset is not None and r.source_file for r in cdx)

    out = str(tmp_path / "cdx")
    write_cdx(recs, out, num_files=2)
    back = spark.read.parquet(out).collect()
    surts = [r.surt for r in back]
    assert len(back) == 3
    # global order is recoverable by (file min/max, in-file order):
    # within each input file rows are sorted
    import collections

    by_file = collections.defaultdict(list)
    for r in spark.read.parquet(out).select(
        F.input_file_name().alias("f"), "surt"
    ).collect():
        by_file[r.f].append(r.surt)
    # rows were written sortWithinPartitions, but parquet read order per
    # file equals write order, so each file's list is sorted
    for f, ss in by_file.items():
        assert ss == sorted(ss)


def test_streaming_warc_ingest(spark, tmp_path):
    """Archives landing in a directory stream straight through the same
    splitter (binaryFile is a streaming source; parse_warc_records is
    map-side) — the live form of the wire-format front door."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "a.warc").write_bytes(_archive())
    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .load(src)
    )
    pages = warc_pages(parse_warc_records(stream))
    q = (
        pages.writeStream.format("memory")
        .queryName("warc_live")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        (tmp_path / "in" / "b.warc").write_bytes(
            _record("response", "http://late.test/", _http_response(b"<p>l</p>"))
        )
        q.processAllAvailable()
        got = {r.url for r in spark.sql("SELECT * FROM warc_live").collect()}
        assert got == {
            "http://h1.test/index.html",
            "http://h2.test/a/b.html",
            "http://late.test/",
        }
    finally:
        q.stop()


def test_latest_captures(spark):
    """Recrawl dedup over the capture index: max warc_date per surt,
    offset tiebreak on equal dates."""
    from bitfilters_spark.sources.warc import latest_captures

    cdx = spark.createDataFrame(
        [
            ("com,a)/p", "2024-01-01T00:00:00Z", "http://a.com/p", "f1", 0, 200, "text/html"),
            ("com,a)/p", "2024-03-01T00:00:00Z", "http://a.com/p", "f2", 10, 200, "text/html"),
            ("com,a)/p", "2024-03-01T00:00:00Z", "http://a.com/p", "f2", 5, 200, "text/html"),
            ("com,b)/q", "2024-02-01T00:00:00Z", "http://b.com/q", "f1", 7, 404, "text/html"),
        ],
        "surt string, warc_date string, url string, source_file string, "
        "record_offset long, http_status int, mime string",
    )
    got = {r.surt: (r.warc_date, r.record_offset) for r in latest_captures(cdx).collect()}
    assert got == {
        "com,a)/p": ("2024-03-01T00:00:00Z", 10),
        "com,b)/q": ("2024-02-01T00:00:00Z", 7),
    }


def test_cdx_lookup_prefix_range(spark, tmp_path):
    """Read side of the sorted index: a domain lookup returns exactly
    that domain's captures (subdomains included), a full-URL lookup
    exactly that URL's, and the range predicate reaches the parquet scan
    as pushed filters (file-level pruning on the sorted layout)."""
    import contextlib
    import io as _io

    from bitfilters_spark.sources.warc import cdx_lookup, write_cdx

    blobs = []
    for host, n in (("a.test", 3), ("sub.a.test", 2), ("b.test", 4)):
        for i in range(n):
            blobs.append(
                _record(
                    "response",
                    f"http://{host}/p/{i}",
                    _http_response(b"<p>x</p>"),
                )
            )
    recs = parse_warc_records(_df(spark, [b"".join(blobs)]))
    out = str(tmp_path / "cdx")
    write_cdx(recs, out, num_files=4)

    dom = cdx_lookup(spark, out, "a.test")
    assert {r.url for r in dom.collect()} == {
        f"http://a.test/p/{i}" for i in range(3)
    } | {f"http://sub.a.test/p/{i}" for i in range(2)}
    one = cdx_lookup(spark, out, "http://b.test/p/2")
    assert [r.url for r in one.collect()] == ["http://b.test/p/2"]

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        dom.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(surt" in plan


# ------------------------------------------------------- redirect edges ---


def _http_redirect(location: bytes, status=301):
    return (
        b"HTTP/1.1 " + str(status).encode() + b" Moved\r\n"
        b"Location: " + location + b"\r\n"
        b"Content-Type: text/html\r\n\r\n"
        b"<html>moved</html>"
    )


def test_warc_redirects_resolution_and_normalization(spark, tmp_path):
    from bitfilters_spark.sources.warc import read_warc, warc_redirects

    archive = b"".join(
        [
            _record("response", "http://old.test/a", _http_redirect(b"http://new.test/a")),
            _record("response", "http://old.test/b", _http_redirect(b"/moved/b", 302)),
            _record("response", "http://old.test/dir/c", _http_redirect(b"../up/./c#frag", 307)),
            _record("response", "http://old.test/keep", _http_response(b"<p>ok</p>")),  # 200: no edge
            _record("response", "http://old.test/nohdr", b"HTTP/1.1 301 Moved\r\nServer: t\r\n\r\nx"),  # 3xx w/o Location
        ]
    )
    f = tmp_path / "r.warc"
    f.write_bytes(archive)
    recs = read_warc(spark, str(f))
    got = {
        r["src_url"]: (r["dst_url"], r["http_status"])
        for r in warc_redirects(recs).collect()
    }
    assert got["http://old.test/a"] == ("http://new.test/a", 301)
    assert got["http://old.test/b"] == ("http://old.test/moved/b", 302)
    # ../up/./c resolves against /dir/, fragment stripped
    assert got["http://old.test/dir/c"] == ("http://old.test/up/c", 307)
    assert "http://old.test/keep" not in got
    assert "http://old.test/nohdr" not in got


def test_resolve_redirect_chains(spark):
    from bitfilters_spark.operators.web import resolve_redirect_chains

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),   # 3-hop chain
            ("x", "y"),                           # single hop
            ("p", "q"), ("q", "p"),               # loop
            ("s", "s"),                           # self-redirect: dropped
        ],
        "src_url string, dst_url string",
    )
    got = {
        r["src_url"]: r
        for r in resolve_redirect_chains(edges, max_hops=4).collect()
    }
    assert (got["a"]["final_url"], got["a"]["hops"], got["a"]["unresolved"]) == ("d", 3, False)
    assert (got["b"]["final_url"], got["b"]["hops"]) == ("d", 2)
    assert (got["x"]["final_url"], got["x"]["hops"], got["x"]["unresolved"]) == ("y", 1, False)
    # the loop bounces until the hop budget and stays flagged
    assert got["p"]["unresolved"] and got["q"]["unresolved"]
    assert got["p"]["hops"] == 4
    assert "s" not in got
    with pytest.raises(ValueError, match="max_hops"):
        resolve_redirect_chains(edges, max_hops=0)


def test_resolve_reference_matrix(spark):
    from bitfilters_spark.operators.web import resolve_reference

    base = "http://h.test/a/b/page.html?old=1"
    cases = [
        ("https://x.test/p", "https://x.test/p"),
        ("//cdn.test/lib.js", "http://cdn.test/lib.js"),
        ("/root.html", "http://h.test/root.html"),
        ("?q=2", "http://h.test/a/b/page.html?q=2"),
        # empty / fragment-only refs keep the base QUERY (RFC 3986 §5.2.2)
        ("", "http://h.test/a/b/page.html?old=1"),
        ("#only-frag", "http://h.test/a/b/page.html?old=1"),
        ("sib.html", "http://h.test/a/b/sib.html"),
        ("../up.html", "http://h.test/a/up.html"),
        ("../../../clamp.html", "http://h.test/clamp.html"),
        ("./same.html#frag", "http://h.test/a/b/same.html"),
    ]
    df = spark.createDataFrame(
        [(base, ref, want) for ref, want in cases],
        "base string, ref string, want string",
    )
    rows = df.select(
        "ref", "want", resolve_reference("base", "ref").alias("got")
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], r["ref"]


def test_redirects_canonicalize_captures(spark, tmp_path):
    """Composition: redirect chains rewrite capture identity — the
    moved page and its target dedup to one URL."""
    from bitfilters_spark.operators.web import resolve_redirect_chains
    from bitfilters_spark.sources.warc import read_warc, warc_redirects

    archive = b"".join(
        [
            _record("response", "http://m.test/p", _http_redirect(b"http://w.test/p")),
            _record("response", "http://w.test/p", _http_response(b"<p>canonical</p>")),
        ]
    )
    f = tmp_path / "c.warc"
    f.write_bytes(archive)
    recs = read_warc(spark, str(f))
    chains = resolve_redirect_chains(warc_redirects(recs))
    canon = (
        recs.where(F.col("target_uri").isNotNull())
        .join(
            chains.select(
                F.col("src_url").alias("target_uri"), "final_url"
            ),
            "target_uri",
            "left",
        )
        .select(F.coalesce("final_url", "target_uri").alias("canonical"))
        .distinct()
    )
    assert [r["canonical"] for r in canon.collect()] == ["http://w.test/p"]
