"""extract_links (#138): HTML outlink extraction — RFC 3986 resolution
cases, dead-zone suppression, nofollow, entity unescaping, and the full
crawl-loop composition fetch → extract_links → pagerank →
url_frontier_schedule that VERDICT r10 flagged as the engine's missing
link-graph step."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.web import extract_links


PAGE_URL = "http://page.example.com/a/b.html"


def _links(spark, html, url=PAGE_URL, **kw):
    df = spark.createDataFrame([(url, html)], ["url", "html"])
    return {
        r.dst_url: r for r in extract_links(df, "html", "url", **kw).collect()
    }


def test_absolute_and_scheme_filtering(spark):
    out = _links(
        spark,
        '<a href="http://other.example.com/x">a</a>'
        '<a href="https://tls.example.com/y">b</a>'
        '<a href="mailto:x@example.com">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="tel:+15551234">t</a>'
        '<a href="data:text/plain,hi">d</a>',
    )
    assert set(out) == {
        "http://other.example.com/x",
        "https://tls.example.com/y",
    }
    for r in out.values():
        assert r.src_url == PAGE_URL
        assert r.src_host == "page.example.com"


def test_relative_resolution_cases(spark):
    out = _links(
        spark,
        '<a href="/root.html">1</a>'
        '<a href="?p=2">2</a>'
        '<a href="sub/c.html">3</a>'
        '<a href="../up.html">4</a>'
        '<a href="./same.html">5</a>'
        '<a href="x/y/../../z.html">6</a>'
        '<a href="//cdn.example.com/lib.js">7</a>',
    )
    assert set(out) == {
        "http://page.example.com/root.html",
        "http://page.example.com/a/b.html?p=2",
        "http://page.example.com/a/sub/c.html",
        "http://page.example.com/up.html",
        "http://page.example.com/a/same.html",
        "http://page.example.com/a/z.html",
        "http://cdn.example.com/lib.js",
    }


def test_dot_segment_edge_cases(spark):
    out = _links(
        spark,
        '<a href="../../../../clamp.html">1</a>'  # past the root
        '<a href="trail/..">2</a>'                # trailing ..
        '<a href="d/.">3</a>',                    # trailing .
    )
    # normalize_url strips the trailing slash of a bare directory path
    assert set(out) == {
        "http://page.example.com/clamp.html",
        "http://page.example.com/a",
        "http://page.example.com/a/d",
    }


def test_base_tag_governs_when_absolute(spark):
    html = (
        '<base href="http://base.example.com/dir/index.html">'
        '<a href="x.html">x</a>'
    )
    out = _links(spark, html)
    assert set(out) == {"http://base.example.com/dir/x.html"}
    # a RELATIVE base falls back to the page URL
    out = _links(spark, '<base href="/dir/"><a href="x.html">x</a>')
    assert set(out) == {"http://page.example.com/a/x.html"}


def test_dead_zones_and_fragments_dropped(spark):
    out = _links(
        spark,
        '<!-- <a href="http://comment.example.com/">c</a> -->'
        "<script>var s='<a href=\"http://script.example.com/\">s</a>';</script>"
        '<style>/* <a href="http://style.example.com/">y</a> */</style>'
        '<a href="#frag">f</a>'
        '<a href="">e</a>'
        '<a href="real.html#sec">r</a>',
    )
    assert set(out) == {"http://page.example.com/a/real.html"}


def test_quoting_entities_nofollow_and_newlines(spark):
    out = _links(
        spark,
        "<a href='http://sq.example.com/p'>sq</a>\n"
        "<a href=http://uq.example.com/p>uq</a>\n"
        '<a href="http://amp.example.com/p?a=1&amp;b=2">amp</a>\n'
        '<a rel="nofollow" href="http://nf.example.com/">nf</a>\n'
        '<a href="http://follow.example.com/" rel="external">f</a>\n'
        '<a\nhref="http://nl.example.com/">nl</a>',
    )
    assert set(out) == {
        "http://sq.example.com/p",
        "http://uq.example.com/p",
        "http://amp.example.com/p?a=1&b=2",
        "http://nf.example.com/",
        "http://follow.example.com/",
        "http://nl.example.com/",
    }
    assert out["http://nf.example.com/"].nofollow
    assert not out["http://follow.example.com/"].nofollow


def test_normalization_and_hosts(spark):
    out = _links(
        spark,
        '<a href="HTTP://UP.Example.com/P?utm_source=x&amp;id=1">u</a>',
    )
    assert set(out) == {"http://up.example.com/P?id=1"}
    assert out["http://up.example.com/P?id=1"].dst_host == "up.example.com"
    # normalize=False keeps the raw resolved URL
    raw = _links(
        spark,
        '<a href="HTTP://UP.Example.com/P?utm_source=x&amp;id=1">u</a>',
        normalize=False,
    )
    assert set(raw) == {"HTTP://UP.Example.com/P?utm_source=x&id=1"}


def test_carry_cols_and_empty_inputs(spark):
    df = spark.createDataFrame(
        [(7, PAGE_URL, '<a href="/x">x</a>')], ["doc_id", "url", "html"]
    )
    out = extract_links(df, "html", "url", carry_cols=("doc_id",)).collect()
    assert [(r.doc_id, r.dst_url) for r in out] == [
        (7, "http://page.example.com/x")
    ]
    empty = spark.createDataFrame([], "url string, html string")
    assert extract_links(empty, "html", "url").count() == 0
    nul = spark.createDataFrame(
        [(PAGE_URL, None)], "url string, html string"
    )
    assert extract_links(nul, "html", "url").count() == 0
    nolinks = spark.createDataFrame([(PAGE_URL, "<p>plain</p>")], ["url", "html"])
    assert extract_links(nolinks, "html", "url").count() == 0


def test_crawl_loop_composition(spark):
    """The full loop the engine was missing: fetched pages → outlink
    edges → host pagerank → frontier priority. Hub hosts (linked by
    everyone) must outrank leaf hosts and be scheduled first."""
    from bitfilters_spark.operators.graph import pagerank
    from bitfilters_spark.operators.web import url_frontier_schedule

    # 4 hosts; every host links to hub h0; h0 links only to h1
    pages = []
    for i in range(1, 4):
        pages.append(
            (f"http://h{i}.test/index.html",
             '<a href="http://h0.test/page.html">hub</a>'
             f'<a href="/local{i}.html">self</a>')
        )
    pages.append(("http://h0.test/index.html", '<a href="http://h1.test/p">x</a>'))
    df = spark.createDataFrame(pages, ["url", "html"])
    edges = (
        extract_links(df, "html", "url")
        .where(F.col("src_host") != F.col("dst_host"))  # cross-host graph
        .select(
            F.xxhash64("src_host").alias("src"),
            F.xxhash64("dst_host").alias("dst"),
            "src_host",
            "dst_host",
        )
    )
    ranks = pagerank(edges, "src", "dst", iters=5)
    hostmap = {
        r.h: r.node
        for r in edges.select(F.col("dst_host").alias("h"), F.col("dst").alias("node"))
        .union(edges.select("src_host", "src"))
        .distinct()
        .collect()
    }
    rk = {r.node: r.rank for r in ranks.collect()}
    assert rk[hostmap["h0.test"]] > rk[hostmap["h1.test"]] > rk[hostmap["h2.test"]]

    # ranks feed the frontier as priority: hub URLs land in round 0
    urls = spark.createDataFrame(
        [(f"http://h{i}.test/u{j}", f"h{i}.test") for i in range(3) for j in range(2)],
        ["url", "host"],
    )
    pr = ranks.select(F.col("node").alias("hnode"), F.col("rank").alias("prio"))
    urls = urls.withColumn("hnode", F.xxhash64("host")).join(pr, "hnode", "left")
    sched = url_frontier_schedule(
        urls.fillna(0.0, subset=["prio"]),
        "url",
        host_col="host",
        priority_col="prio",
        per_host_per_round=1,
    )
    first = {r.host for r in sched.where(F.col("round") == 0).collect()}
    assert "h0.test" in first


def test_extract_links_streaming(spark, tmp_path):
    """extract_links is pure map-side expression work, so it applies
    unchanged to a readStream of fetched pages — the live form of the
    crawl loop (fetch stream -> edges -> frontier priority refresh)."""
    src = str(tmp_path / "pages_in")
    ckpt = str(tmp_path / "pages_ckpt")
    spark.createDataFrame(
        [
            ("http://a.test/p1", '<a href="http://b.test/x">b</a>'),
            ("http://b.test/p2", '<a href="/local">l</a>'),
        ],
        "url string, html string",
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("url string, html string").parquet(src)
    edges = extract_links(stream, "html", "url")
    q = (
        edges.writeStream.format("memory")
        .queryName("live_edges")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.src_host, r.dst_url)
            for r in spark.sql("SELECT * FROM live_edges").collect()
        }
        assert got == {
            ("a.test", "http://b.test/x"),
            ("b.test", "http://b.test/local"),
        }
    finally:
        q.stop()


def test_resolver_parity_extract_links_vs_resolve_reference(spark):
    """extract_links' inline resolver (staged for codegen limits) and
    web.resolve_reference are two copies of the same RFC 3986 algebra —
    any future divergence would split link-edge identity from
    redirect-edge identity. Pin them equal over the resolution matrix
    (code-review finding #9: the duplication is deliberate, the parity
    must be tested)."""
    from bitfilters_spark.operators.web import extract_links, resolve_reference

    base = "http://h.test/a/b/page.html?x=1"
    refs = [
        "https://x.test/p",
        "//cdn.test/lib.js",
        "/root.html",
        "?q=2",
        "sib.html",
        "../up.html",
        "../../../clamp.html",
        "./same.html",
        "deep/./x/../y.html",
    ]
    pages = spark.createDataFrame(
        [(base, "".join(f'<a href="{r}">a</a>' for r in refs))],
        "url string, html string",
    )
    via_links = [
        r["dst_url"]
        for r in extract_links(pages, "html", "url", normalize=False)
        .orderBy("dst_url")
        .collect()
    ]
    via_resolver = sorted(
        r["got"]
        for r in spark.createDataFrame([(base, x) for x in refs], "b string, r string")
        .select(resolve_reference("b", "r").alias("got"))
        .collect()
    )
    assert via_links == via_resolver


def test_double_escaped_href_and_amp_last(spark):
    """Entity order regression (r11 verdict finding 5): &amp; decodes
    LAST so a double-escaped href piece `&amp;lt;` becomes the literal
    `&lt;`, never double-decoding to `<`; ordinary `&amp;` in query
    strings still decodes."""
    df = spark.createDataFrame(
        [
            ("http://h.test/",
             '<a href="/q?a=1&amp;b=2">q</a>'
             '<a href="/esc?x=&amp;lt;tag&amp;gt;">e</a>'),
        ],
        "url string, html string",
    )
    got = {r["dst_url"] for r in extract_links(df, normalize=False).collect()}
    assert "http://h.test/q?a=1&b=2" in got
    assert "http://h.test/esc?x=&lt;tag&gt;" in got
    assert not any("<tag>" in u for u in got)


def test_attribute_scan_ignores_anchor_text(spark):
    """Attribute-scan regression (r11 verdict finding 8): rel=nofollow
    in the VISIBLE text must not flip the flag, and an href-less anchor
    whose text contains `href=...` must not fabricate an edge."""
    df = spark.createDataFrame(
        [
            ("http://h.test/",
             '<a href="/x">set rel=nofollow on links</a>'
             '<a name="n">see href=http://fake.test/ here</a>'
             '<a href="/real" rel="nofollow">real nofollow</a>'),
        ],
        "url string, html string",
    )
    rows = extract_links(df, normalize=False).collect()
    by_dst = {r["dst_url"]: r for r in rows}
    assert by_dst["http://h.test/x"]["nofollow"] is False
    assert by_dst["http://h.test/real"]["nofollow"] is True
    assert "http://fake.test/" not in by_dst
