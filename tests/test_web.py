"""Crawl-side operators: HTML stripping and URL hygiene (pure expression
chains — the map-side front door of the text pipeline)."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.web import normalize_url, strip_html, url_domain


def _one(spark, col_expr, value):
    return (
        spark.createDataFrame([(value,)], "v string")
        .select(col_expr.alias("r"))
        .collect()[0]["r"]
    )


def test_strip_html_extracts_visible_text(spark):
    html = (
        "<html><head><title>T</title><style>p {color: red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- hidden --><h1>Hello</h1><p>world &amp; friends"
        " &lt;3</p><div>spaced</div>words</body></html>"
    )
    got = _one(spark, strip_html(F.col("v")), html)
    assert got == "T Hello world & friends <3 spaced words"


def test_strip_html_plain_text_passthrough(spark):
    got = _one(spark, strip_html(F.col("v")), "already   plain\n text")
    assert got == "already plain text"


def test_normalize_url_strips_tracking_and_canonicalizes(spark):
    url = "HTTPS://Example.COM/Path/Sub/?utm_source=x&id=7&fbclid=abc#frag"
    got = _one(spark, normalize_url(F.col("v")), url)
    assert got == "https://example.com/Path/Sub?id=7"
    # identity-only differences collapse to the same canonical form
    a = _one(spark, normalize_url(F.col("v")), "https://example.com/p?utm_medium=m")
    b = _one(spark, normalize_url(F.col("v")), "https://EXAMPLE.com/p/")
    assert a == b == "https://example.com/p"
    bare = _one(spark, normalize_url(F.col("v")), "http://example.com")
    assert bare == "http://example.com/"


def test_url_domain_registrable_heuristic(spark):
    assert _one(spark, url_domain(F.col("v")), "https://news.bbc.co.uk/x") == "bbc.co.uk"
    assert _one(spark, url_domain(F.col("v")), "http://a.b.example.com/") == "example.com"
    assert (
        _one(spark, url_domain(F.col("v"), registrable=False), "http://A.B.Example.com/")
        == "a.b.example.com"
    )


def test_web_ops_compose_with_dedup_and_caps(spark):
    """The intended composition: normalize -> exact dedup by URL, then
    per-domain caps."""
    from bitfilters_spark.operators.dedup import dedup_exact
    from bitfilters_spark.operators.sampling import cap_per_group

    rows = [
        (1, "https://a.com/x?utm_source=1"),
        (2, "https://A.COM/x/"),           # same page as 1
        (3, "https://a.com/y"),
        (4, "https://b.com/z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string").select(
        "doc_id", normalize_url(F.col("url")).alias("nurl"),
        url_domain(F.col("url")).alias("domain"),
    )
    deduped = dedup_exact(df, "nurl", "doc_id")
    assert sorted(r["doc_id"] for r in deduped.collect()) == [1, 3, 4]
    capped = cap_per_group(deduped, "doc_id", "domain", 1).collect()
    by_domain = {r["domain"]: r["doc_id"] for r in capped}
    # one survivor per domain, deterministic hash order picks within a.com
    assert set(by_domain) == {"a.com", "b.com"}
    assert by_domain["b.com"] == 4 and by_domain["a.com"] in (1, 3)


def test_normalize_text_canonicalizes_noise(spark):
    """Formatting noise (case, punctuation, counters, whitespace) must not
    split a duplicate group: normalized variants fingerprint identically
    and dedup_exact collapses them."""
    from bitfilters_spark.operators.dedup import dedup_exact
    from bitfilters_spark.operators.text import normalize_text

    rows = [
        (1, "Breaking News: markets rallied 1,234 points today!!"),
        (2, "breaking news  markets rallied 987 points today"),
        (3, "An entirely different article body goes here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "norm", normalize_text(F.col("text"))
    )
    got = {r["doc_id"]: r["norm"] for r in df.collect()}
    assert got[1] == got[2] == "breaking news markets rallied 0 points today"
    kept = sorted(r["doc_id"] for r in dedup_exact(df, "norm", "doc_id").collect())
    assert kept == [1, 3]
    # knobs: keeping digits distinguishes the counters again
    raw = {
        r["doc_id"]: r["n"]
        for r in spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("n", normalize_text(F.col("text"), collapse_digits=False))
        .collect()
    }
    assert raw[1] != raw[2]


def test_url_ops_tolerate_garbage(spark):
    """Malformed URLs and NULLs must yield NULL, never a job-killing ANSI
    parse error (one bad row in a crawl cannot fail the pipeline)."""
    rows = [
        (1, None),
        (2, "not a url at all"),
        (3, "https://ok.example.com/x"),
        (4, "::::"),
    ]
    df = spark.createDataFrame(rows, "id long, u string")
    out = {
        r["id"]: (r["n"], r["d"])
        for r in df.select(
            "id",
            normalize_url(F.col("u")).alias("n"),
            url_domain(F.col("u")).alias("d"),
        ).collect()
    }
    assert out[3] == ("https://ok.example.com/x", "example.com")
    for bad in (1, 2, 4):
        assert out[bad][0] is None
    assert out[1][1] is None


def test_strip_html_double_escaped_entities_stay_literal(spark):
    """&amp;lt; renders as the literal text "&lt;" — decoding &amp; before
    &lt; would double-decode it to "<". &amp; must decode LAST."""
    got = _one(spark, strip_html(F.col("v")), "<p>a &amp;lt; b &amp;amp; c &lt; d</p>")
    assert got == "a &lt; b &amp; c < d"


def test_url_domain_with_suffix_list(spark):
    """A supplied public-suffix list beats the heuristic: uk.com and
    github.io are public suffixes (heuristic mis-splits them), and the
    longest suffix wins."""
    sfx = ["co.uk", "uk.com", "github.io", "com", "org"]
    rows = [
        (1, "https://www.example.co.uk/x"),
        (2, "https://foo.bar.uk.com/x"),      # heuristic would say bar.uk.com? no: uk.com needs the list
        (3, "https://user.github.io/page"),
        (4, "https://deep.sub.example.com/x"),
        (5, "https://unknown.zz/x"),           # no rule -> last two labels
    ]
    df = spark.createDataFrame(rows, "id long, u string")
    got = {
        r["id"]: r["d"]
        for r in df.select(
            "id", url_domain(F.col("u"), suffixes=sfx).alias("d")
        ).collect()
    }
    assert got[1] == "example.co.uk"
    assert got[2] == "bar.uk.com"
    assert got[3] == "user.github.io"
    assert got[4] == "example.com"
    assert got[5] == "unknown.zz"


def test_resolve_url_domain_broadcast_table(spark):
    """The table-driven variant: same answers as the inline list, zero
    shuffle of the input (broadcast joins only), fallback for unknown
    TLDs, and pass-through of other columns."""
    from bitfilters_spark.operators.web import resolve_url_domain

    sfx_df = spark.createDataFrame(
        [("co.uk",), ("uk.com",), ("github.io",), ("com",), ("org",)], "suffix string"
    )
    rows = [
        (1, "https://www.example.co.uk/x"),
        (2, "https://foo.bar.uk.com/x"),
        (3, "https://user.github.io/page"),
        (4, "https://deep.sub.example.com/x"),
        (5, "https://unknown.zz/x"),
        (6, "https://single/x"),  # one-label host: no registrable split
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, u string")
    out = resolve_url_domain(df, "u", sfx_df)
    assert set(out.columns) == {"id", "u", "domain"}
    got = {r["id"]: r["domain"] for r in out.collect()}
    assert got[1] == "example.co.uk"
    assert got[2] == "bar.uk.com"
    assert got[3] == "user.github.io"
    assert got[4] == "example.com"
    assert got[5] == "unknown.zz"
    assert got[6] == "single"
    assert got[7] is None
    # scale shape: broadcast joins only; the sole Exchange is the
    # suffix table's own distinct() (metadata-scale), never the input
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "_bf_sfx" in line, line


def test_remove_boilerplate_lines_drops_all_occurrences(spark):
    """Lines in >= min_df distinct docs vanish EVERYWHERE (unlike
    dedup_paragraphs' keep-first); unique lines survive in order; a doc
    of pure boilerplate becomes empty; counts are per-doc."""
    from bitfilters_spark.operators.web import remove_boilerplate_lines

    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"alpha unique one\n{boiler}\nbeta unique two"),
        (2, f"{boiler}\ngamma unique three"),
        (3, f"delta unique four\n{boiler}"),
        (4, boiler),                      # all-boilerplate page
        (5, "epsilon unique five"),       # untouched
        (6, f"zeta six\nzeta six"),       # intra-doc repeat: df=1, kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(df, "doc_id", "text", min_df=3).collect()
    }
    assert out[1]["text"] == "alpha unique one\nbeta unique two"
    assert out[2]["text"] == "gamma unique three"
    assert out[3]["text"] == "delta unique four"
    assert out[4]["text"] == "" and out[4]["n_removed"] == 1
    assert out[5]["text"] == "epsilon unique five" and out[5]["n_removed"] == 0
    # df counts DISTINCT docs: an intra-doc repeat is not boilerplate
    assert out[6]["text"] == "zeta six\nzeta six"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1


def test_remove_boilerplate_lines_threshold_boundary(spark):
    """min_df is inclusive: a line in exactly min_df docs is removed, one
    in min_df - 1 survives."""
    from bitfilters_spark.operators.web import remove_boilerplate_lines

    rows = [
        (1, "at-threshold\nbelow-threshold"),
        (2, "at-threshold\nbelow-threshold"),
        (3, "at-threshold\nfiller line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, "doc_id", "text", min_df=3).collect()
    }
    assert out[1] == "below-threshold"
    assert out[3] == "filler line"


def test_fix_mojibake_repairs_common_sequences(spark):
    from bitfilters_spark.operators.web import fix_mojibake

    broken_quote = "it\u00e2\u0080\u0099s"          # UTF-8 of \u2019 read as cp1252
    broken_eacute = "caf\u00c3\u00a9"                 # UTF-8 of \u00e9 read as cp1252
    broken_rdquo = "say \u00e2\u0080\u009dhi"        # contains the C1-control leg
    df = spark.createDataFrame(
        [(0, broken_quote), (1, broken_eacute), (2, broken_rdquo), (3, "clean text")],
        "id long, text string",
    )
    got = {r["id"]: r["t"] for r in df.select("id", fix_mojibake("text").alias("t")).collect()}
    assert got[0] == "it\u2019s"
    assert got[1] == "caf\u00e9"
    assert got[2] == "say \u201dhi"
    assert got[3] == "clean text"


def test_fix_mojibake_exact_roundtrip_and_idempotent(spark):
    from bitfilters_spark.operators.web import fix_mojibake_exact

    originals = ["it\u2019s caf\u00e9 \u2014 na\u00efve \u201cquoted\u201d", "plain ascii", "\u20ac 9.99"]
    def mangle(t):
        # sloppy cp1252 decode of the UTF-8 bytes
        out = []
        for b in t.encode("utf-8"):
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
        return "".join(out)

    rows = [(i, mangle(t)) for i, t in enumerate(originals)] + [(99, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    once = df.select("id", fix_mojibake_exact("text").alias("t"))
    got = {r["id"]: r["t"] for r in once.collect()}
    for i, t in enumerate(originals):
        assert got[i] == t
    assert got[99] is None
    # idempotent: repairing repaired text changes nothing
    twice = once.select("id", fix_mojibake_exact("t").alias("t2"))
    got2 = {r["id"]: r["t2"] for r in twice.collect()}
    assert got2 == got


def test_fix_mojibake_agrees_with_exact_on_table_chars(spark):
    from bitfilters_spark.operators.web import (
        _MOJIBAKE, fix_mojibake, fix_mojibake_exact,
    )

    rows = [(i, f"x {broken} y") for i, (broken, _) in enumerate(_MOJIBAKE)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = df.select(
        "id",
        fix_mojibake("text").alias("chain"),
        fix_mojibake_exact("text").alias("exact"),
    ).collect()
    for r in out:
        assert r["chain"] == r["exact"], r


def test_fix_mojibake_gated_identical_to_ungated(spark):
    """gated=True must be byte-identical on every input class: each raw
    table entry (incl. C1-control legs), mixed clean+broken, lead chars
    with no full sequence, clean text, empty, NULL."""
    from bitfilters_spark.operators.web import _MOJIBAKE, fix_mojibake

    rows = [(i, f"pre {broken} post") for i, (broken, _) in enumerate(_MOJIBAKE)]
    rows += [
        (900, "clean ascii only"),
        (901, ""),
        (902, None),
        (903, "lone leads â Ã Â no continuation"),
        (904, "itâs cafÃ© mixed"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = df.select(
        "id",
        fix_mojibake("text").alias("plain"),
        fix_mojibake("text", gated=True).alias("gated"),
    ).collect()
    for r in out:
        assert r["plain"] == r["gated"], r
    got = {r["id"]: r["gated"] for r in out}
    assert got[900] == "clean ascii only"
    assert got[902] is None
    assert got[904] == "it’s café mixed"


def test_pii_scan_fuses_metrics_and_redaction(spark):
    """pii_scan (3 pre-gated regex scans) must equal pii_metrics +
    redact_pii (4 scans) value-for-value AND dtype-for-dtype — including
    NULL text, adjacent/trailing matches, and '@'/'-' present without a
    real match."""
    from bitfilters_spark.operators.text import pii_metrics, pii_scan, redact_pii

    rows = [
        (0, None),
        (1, ""),
        (2, "clean text"),
        (3, "a@b.co then 555-1234 end"),
        (4, "ends with e@f.gg"),
        (5, "555-0000"),
        (6, "a@b.cc c@d.ee adjacent"),
        (7, "888-9999 000-1111"),
        (8, "user5.a_b%c+d@mail-host.example.com mid 123-4567"),
        (9, "has @ alone and - alone"),
        (10, "@@--@@"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    old = df.select("id", *pii_metrics("text"), redact_pii("text").alias("redacted"))
    new = df.select("id", *pii_scan("text"))
    assert dict(old.dtypes) == dict(new.dtypes)
    o = {r["id"]: r.asDict() for r in old.collect()}
    n = {r["id"]: r.asDict() for r in new.collect()}
    assert o == n
    assert n[3]["redacted"] == "<EMAIL> then <PHONE> end"
    assert n[3]["n_emails"] == 1 and n[3]["n_phones"] == 1
    assert n[0]["n_emails"] is None and n[0]["redacted"] is None
    assert n[9]["n_emails"] == 0 and n[9]["n_phones"] == 0


def test_pii_scan_parity_combinatorial(spark):
    """All 3-fragment combinations of adversarial pieces (partial
    emails, boundary phones, separators, lone trigger chars) — several
    hundred generated rows in ONE job, pii_scan ≡ pii_metrics+redact
    row-for-row."""
    import itertools

    from bitfilters_spark.operators.text import pii_metrics, pii_scan, redact_pii

    frags = [
        "", "x", "@", "-", "a@b.cd", "555-1234", "a@b", "1-2", "@x.co",
        "user+tag@host-name.org", "...", "12-345-6789", "e@f.gg h@i.jj",
    ]
    rows = [
        (i, " ".join(c))
        for i, c in enumerate(itertools.product(frags, repeat=3))
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    old = df.select("id", *pii_metrics("text"), redact_pii("text").alias("redacted"))
    new = df.select("id", *pii_scan("text"))
    o = {r["id"]: r.asDict() for r in old.collect()}
    n = {r["id"]: r.asDict() for r in new.collect()}
    assert o == n
    assert len(o) == len(frags) ** 3


def test_url_frontier_schedule_politeness_and_stability(spark):
    """Crawl scheduling (#127): no host exceeds per_host_per_round URLs in
    any round, rounds fill highest-priority-first, the host->fetcher map
    is stable (a host never splits across fetchers), and host_col=None
    derives the host from the URL itself."""
    from bitfilters_spark.operators.web import url_frontier_schedule

    rows = []
    for h in range(20):
        for i in range(7):
            rows.append((f"https://site{h}.example.com/p{i}", float((h * 7 + i) % 13)))
    df = spark.createDataFrame(rows, "url string, score double")
    out = url_frontier_schedule(
        df, "url", priority_col="score", per_host_per_round=2, n_fetchers=4
    ).collect()

    # politeness: <= 2 URLs per (host, round); every URL scheduled exactly once
    from collections import Counter

    per = Counter((r["host"], r["round"]) for r in out)
    assert max(per.values()) <= 2 and len(out) == len(rows)
    # priority: a URL in a later round never outranks one in an earlier
    # round of the same host
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append((r["round"], r["score"], r["url"]))
    for h, items in by_host.items():
        items.sort()
        scores = [s for _, s, _ in items]
        # within a host, scores are non-increasing across rounds
        assert all(
            a[1] >= b[1] for a, b in zip(items, items[1:]) if a[0] < b[0]
        ), f"priority inversion in {h}"
    # stability: one fetcher per host, fetcher in [0, 4)
    fmap = {}
    for r in out:
        assert 0 <= r["fetcher"] < 4
        assert fmap.setdefault(r["host"], r["fetcher"]) == r["fetcher"]
    # host derived from the URL (full hostname: per-server politeness)
    assert {r["host"] for r in out} == {f"site{h}.example.com" for h in range(20)}

    with pytest.raises(ValueError):
        url_frontier_schedule(df, "url", per_host_per_round=0)


ROBOTS_A = """\
# comments are stripped
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2.5

User-agent: otherbot
Disallow: /
"""

ROBOTS_B = """\
User-agent: mybot
User-agent: friendbot
Disallow: /only-mybot/
User-agent: *
Disallow: /everyone/
"""


def test_robots_rules_parse_and_precedence(spark):
    """Robots exclusion (#136): RFC 9309 prefix subset — per-agent
    groups ('*' fallback, stacked agents share a group), Allow/Disallow
    prefixes, Crawl-delay as a separate NULL-prefix row, comments
    stripped, empty Disallow ignored."""
    from bitfilters_spark.operators.web import apply_robots, robots_rules

    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B), ("open.com", "")],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    got = {
        (r["host"], r["allow"], r["path_prefix"], r["crawl_delay"])
        for r in rules.collect()
    }
    assert ("a.com", False, "/private/", None) in got
    assert ("a.com", True, "/private/ok", None) in got
    assert ("a.com", True, None, 2.5) in got  # crawl-delay row
    assert ("b.com", False, "/everyone/", None) in got
    # otherbot's and mybot's groups don't leak into the '*' view
    assert not any(h == "b.com" and p == "/only-mybot/" for h, a, p, d in got)
    assert not any(h == "a.com" and p == "/" for h, a, p, d in got)
    assert not any(h == "open.com" for h, a, p, d in got)

    urls = spark.createDataFrame(
        [
            ("http://a.com/private/secret", "a.com"),      # disallowed
            ("http://a.com/private/ok/page", "a.com"),     # longer Allow wins
            ("http://a.com/public/page", "a.com"),         # no rule -> allowed
            ("http://b.com/everyone/x", "b.com"),          # disallowed
            ("http://open.com/anything", "open.com"),      # no rules at all
        ],
        "url string, host string",
    )
    verdicts = {
        r["url"]: (r["robots_allowed"], r["matched_rule"])
        for r in apply_robots(urls, rules).collect()
    }
    assert verdicts["http://a.com/private/secret"] == (False, "/private/")
    assert verdicts["http://a.com/private/ok/page"] == (True, "/private/ok")
    assert verdicts["http://a.com/public/page"] == (True, None)
    assert verdicts["http://b.com/everyone/x"] == (False, "/everyone/")
    assert verdicts["http://open.com/anything"] == (True, None)


def test_robots_agent_specific_group_replaces_star(spark):
    """Requesting a named agent uses ITS group when present (replacing
    '*', per spec), falling back to '*' on hosts without one."""
    from bitfilters_spark.operators.web import robots_rules

    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "host string, robots_txt string",
    )
    rules = {
        (r["host"], r["path_prefix"])
        for r in robots_rules(robots, agent="mybot").collect()
    }
    assert ("b.com", "/only-mybot/") in rules       # mybot's own group
    assert ("b.com", "/everyone/") not in rules     # '*' replaced
    assert ("a.com", "/private/") in rules          # fallback to '*'


def test_robots_composes_with_frontier(spark):
    """The crawl front door end-to-end: robots gate -> frontier
    scheduling over the survivors, crawl-delay joined host-wise."""
    from bitfilters_spark.operators.web import (
        apply_robots,
        robots_rules,
        url_frontier_schedule,
    )

    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A)], "host string, robots_txt string"
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [(f"http://a.com/public/{i}", "a.com", float(i)) for i in range(6)]
        + [("http://a.com/private/x", "a.com", 99.0)],
        "url string, host string, score double",
    )
    gated = apply_robots(urls, rules).where(F.col("robots_allowed"))
    sched = url_frontier_schedule(
        gated, "url", host_col="host", priority_col="score",
        per_host_per_round=2,
    )
    rows = sched.collect()
    assert len(rows) == 6  # the disallowed URL never reaches the frontier
    assert max(r["round"] for r in rows) == 2  # 6 urls / cap 2
    delay = rules.where(F.col("crawl_delay").isNotNull()).collect()
    assert [(r["host"], r["crawl_delay"]) for r in delay] == [("a.com", 2.5)]


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://a.com/page?x=1&amp;y=2</loc>
    <lastmod>2024-01-05</lastmod>
  </url>
  <url><loc> http://a.com/other </loc></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>http://a.com/sitemap-news.xml</loc>
    <lastmod>2024-02-01</lastmod></sitemap>
</sitemapindex>"""


def test_sitemap_urls_parse(spark):
    """Sitemap intake (#137): url blocks and nested sitemap-index blocks
    in one JVM-side pass — loc whitespace-trimmed and XML-unescaped,
    lastmod NULL when absent, is_sitemap marks index entries."""
    from bitfilters_spark.operators.web import sitemap_urls

    df = spark.createDataFrame(
        [("a.com", SITEMAP), ("a.com", SITEMAP_INDEX), ("b.com", "<urlset></urlset>")],
        "host string, sitemap_xml string",
    )
    rows = {
        (r["host"], r["url"], r["lastmod"], r["is_sitemap"])
        for r in sitemap_urls(df, carry_cols=("host",)).collect()
    }
    assert ("a.com", "http://a.com/page?x=1&y=2", "2024-01-05", False) in rows
    assert ("a.com", "http://a.com/other", None, False) in rows
    assert ("a.com", "http://a.com/sitemap-news.xml", "2024-02-01", True) in rows
    assert len(rows) == 3  # the empty urlset contributes nothing


def test_sitemap_feeds_robots_and_frontier(spark):
    """Full crawl front door: sitemap discovery -> robots gate ->
    frontier scheduling, all composed."""
    from bitfilters_spark.operators.web import (
        apply_robots,
        robots_rules,
        sitemap_urls,
        url_frontier_schedule,
    )

    sm = "<urlset>" + "".join(
        f"<url><loc>http://a.com/public/{i}</loc></url>" for i in range(4)
    ) + "<url><loc>http://a.com/private/x</loc></url></urlset>"
    df = spark.createDataFrame([("a.com", sm)], "host string, sitemap_xml string")
    urls = sitemap_urls(df, carry_cols=("host",)).where(~F.col("is_sitemap"))
    rules = robots_rules(
        spark.createDataFrame([("a.com", ROBOTS_A)], "host string, robots_txt string")
    )
    gated = apply_robots(urls, rules).where(F.col("robots_allowed"))
    sched = url_frontier_schedule(gated, "url", host_col="host", per_host_per_round=2)
    assert sched.count() == 4 and sched.agg(F.max("round")).collect()[0][0] == 1


ROBOTS_WILD = """\
User-agent: *
Disallow: /*.php$
Disallow: /*?sessionid=
Disallow: /fish*tank/
Allow: /files/*.php$
Disallow: /lit$
Disallow: /exact-literal
Allow: /exact*
"""


def test_robots_wildcard_patterns(spark):
    """RFC 9309 §2.2.3 '*'/'$' match patterns (r11 — upgrades #136 from
    the literal-prefix subset that silently ALLOWED wildcard-disallowed
    URLs): mid-pattern '*', terminal '$' anchor, and wildcard rules
    competing with literals under length-of-rule-text precedence."""
    from bitfilters_spark.operators.web import apply_robots, robots_rules

    robots = spark.createDataFrame(
        [("w.com", ROBOTS_WILD)], "host string, robots_txt string"
    )
    rules = robots_rules(robots)
    # every wildcard rule carries a compiled regex; plain prefixes don't
    rx = {r["path_prefix"]: r["path_regex"] for r in rules.collect()}
    assert rx["/exact-literal"] is None
    assert rx["/*.php$"] is not None and rx["/lit$"] is not None

    urls = spark.createDataFrame(
        [(f"http://w.com{p}", "w.com") for p in [
            "/index.php",            # /*.php$ -> disallowed
            "/index.php?x=1",        # .php not at END -> no $ match -> allowed
            "/files/x.php",          # Allow /files/*.php$ (longer) beats Disallow /*.php$
            "/page?sessionid=abc",   # mid-pattern wildcard-free suffix match
            "/fish/deep/tank/",      # '*' spans multiple segments
            "/fishtank/",            # '*' can match empty
            "/lit",                  # '$' anchors: exact path only
            "/literal",              # NOT /lit$ ... but /exact* doesn't match either -> allowed
            "/exact-literal",        # Allow /exact* (7 chars) vs Disallow /exact-literal (14) -> longer literal wins
            "/exact-thing",          # only /exact* matches -> allowed
        ]],
        "url string, host string",
    )
    verdicts = {
        r["url"].replace("http://w.com", ""): (r["robots_allowed"], r["matched_rule"])
        for r in apply_robots(urls, rules).collect()
    }
    assert verdicts["/index.php"] == (False, "/*.php$")
    assert verdicts["/index.php?x=1"][0] is True
    assert verdicts["/files/x.php"] == (True, "/files/*.php$")
    assert verdicts["/page?sessionid=abc"] == (False, "/*?sessionid=")
    assert verdicts["/fish/deep/tank/"] == (False, "/fish*tank/")
    assert verdicts["/fishtank/"] == (False, "/fish*tank/")
    assert verdicts["/lit"] == (False, "/lit$")
    assert verdicts["/literal"][0] is True
    assert verdicts["/exact-literal"] == (False, "/exact-literal")
    assert verdicts["/exact-thing"] == (True, "/exact*")


def test_robots_wildcard_regex_translation():
    """Pattern→regex unit cases incl. regex metacharacters in rule text
    and a non-terminal '$' staying literal."""
    from bitfilters_spark.operators.web import _robots_pattern_regex

    assert _robots_pattern_regex("/plain/prefix") is None
    assert _robots_pattern_regex("/a.b") is None  # '.' alone isn't a pattern
    assert _robots_pattern_regex("/*.php$") == r"^/.*\.php$"
    assert _robots_pattern_regex("/x*y") == "^/x.*y"
    assert _robots_pattern_regex("/end$") == "^/end$"
    # '$' mid-pattern is literal text per spec (only FINAL '$' anchors)
    assert _robots_pattern_regex("/a$b*") == r"^/a\$b.*"
    # regex metacharacters in the rule are matched literally
    assert _robots_pattern_regex("/p(1)+*") == r"^/p\(1\)\+.*"


def test_robots_sitemaps_discovery(spark):
    """Sitemap: lines in robots.txt (r11 — the discovery hop between
    the robots gate and sitemap intake): global per the protocol, case-
    insensitive key, commented lines ignored, composes into
    sitemap_urls."""
    from bitfilters_spark.operators.web import robots_sitemaps, sitemap_urls

    txt = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Sitemap: http://a.com/sitemap.xml\n"
        "sitemap: http://a.com/s2.xml\n"
        "# Sitemap: http://a.com/commented.xml\n"
        "  SITEMAP:   http://a.com/s3.xml   \n"
    )
    robots = spark.createDataFrame(
        [("a.com", txt), ("b.com", "User-agent: *\n")],
        "host string, robots_txt string",
    )
    got = {(r.host, r.sitemap_url) for r in robots_sitemaps(robots).collect()}
    assert got == {
        ("a.com", "http://a.com/sitemap.xml"),
        ("a.com", "http://a.com/s2.xml"),
        ("a.com", "http://a.com/s3.xml"),
    }
    # composition: discovered sitemap (fetched) -> url intake, host carried
    fetched = robots_sitemaps(robots).limit(1).select(
        "host",
        F.lit(
            "<urlset><url><loc>http://a.com/page1</loc></url></urlset>"
        ).alias("sitemap_xml"),
    )
    urls = sitemap_urls(fetched, carry_cols=("host",)).collect()
    assert [(r.host, r.url) for r in urls] == [("a.com", "http://a.com/page1")]


def test_extract_links_anchor_text(spark):
    """anchor column (r11): visible text run after the open tag, entity-
    decoded, truncated at nested markup; empty for image-only anchors."""
    from bitfilters_spark.operators.web import extract_links

    html = (
        '<a href="/x">Read <b>more</b></a>'
        '<a href="/y">Fish &amp; Chips</a>'
        '<a href="/z"><img src="i.png"></a>'
    )
    df = spark.createDataFrame(
        [("http://h.test/a/", html)], ["url", "html"]
    )
    got = {r.dst_url: r.anchor for r in extract_links(df, "html", "url").collect()}
    assert got == {
        "http://h.test/x": "Read",
        "http://h.test/y": "Fish & Chips",
        "http://h.test/z": "",
    }


def test_robots_meta_directives(spark):
    """robots_meta (r11): <meta name=robots> parsing — attribute order,
    quoting styles, token-wise matching, 'none' implies both, multi-tag
    union, absent tag means indexable."""
    from bitfilters_spark.operators.web import robots_meta

    cases = [
        (0, '<meta name="robots" content="noindex, nofollow">', True, True),
        (1, "<meta name='robots' content='NOINDEX'>", True, False),
        (2, '<meta content="nofollow" name="robots">', False, True),
        (3, "<meta name=robots content=none>", True, True),
        (4, '<meta name="robots" content="index, follow">', False, False),
        (5, "<p>no meta at all</p>", False, False),
        # token-wise: 'noindexing' is NOT a directive
        (6, '<meta name="robots" content="noindexing">', False, False),
        # union across tags
        (7, '<meta name="robots" content="noindex">'
            '<meta name="robots" content="nofollow">', True, True),
        # a description meta must not match
        (8, '<meta name="description" content="noindex nofollow">',
         False, False),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, *_ in cases], "i int, html string"
    )
    got = {
        r.i: (r.rm.noindex, r.rm.nofollow)
        for r in df.select("i", robots_meta("html").alias("rm")).collect()
    }
    for i, _, noindex, nofollow in cases:
        assert got[i] == (noindex, nofollow), f"case {i}"


def test_url_template_and_trap_detection(spark):
    """Crawler-trap defense (r11): calendar/session/pagination URLs all
    collapse to one template; templates past the population threshold
    flag as traps, legitimate small templates don't."""
    from bitfilters_spark.operators.web import detect_url_traps, url_template

    cases = spark.createDataFrame(
        [
            ("http://a.test/calendar/2024/01/03",),
            ("http://a.test/p?sessionid=ab12cd34ef56&x=1",),
            ("http://a.test/t/dGhpc2lzYXRva2VuX2xvbmc1/view",),
        ],
        ["u"],
    )
    got = [r.t for r in cases.select(url_template("u").alias("t")).collect()]
    assert got[0] == "http://a.test/calendar/{N}/{N}/{N}"
    assert got[1] == "http://a.test/p?sessionid={V}&x={V}"
    assert got[2] == "http://a.test/t/{T}/view"

    # a trap host emits 50 calendar URLs; a real host has 3 articles
    rows = [(f"http://trap.test/cal/2024/{m:02d}/{d:02d}", "trap.test")
            for m in range(1, 6) for d in range(1, 11)]
    rows += [(f"http://ok.test/article/{i}", "ok.test") for i in range(3)]
    df = spark.createDataFrame(rows, ["url", "host"])
    rep = {
        (r.template, r.host): (r.n_urls, r.is_trap)
        for r in detect_url_traps(
            df, "url", max_urls_per_template=10, host_col="host"
        ).collect()
    }
    assert rep[("http://trap.test/cal/{N}/{N}/{N}", "trap.test")] == (50, True)
    assert rep[("http://ok.test/article/{N}", "ok.test")] == (3, False)
    # anti-join semantics: gating the frontier drops exactly the trap
    traps = detect_url_traps(
        df, "url", max_urls_per_template=10, host_col="host"
    ).where("is_trap").select("template", "host")
    gated = df.withColumn("template", url_template("url")).join(
        traps, ["template", "host"], "left_anti"
    )
    assert gated.count() == 3


def test_schedule_fetch_times(spark):
    """Wave → wall-clock pacing: hosts with a robots Crawl-delay pace at
    round × delay, hosts without at the default; ordering per host is
    monotone in round."""
    from bitfilters_spark.operators.web import (
        robots_rules,
        schedule_fetch_times,
        url_frontier_schedule,
    )

    robots = spark.createDataFrame(
        [("slow.test", "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [(f"http://{h}/u{i}", h) for h in ("slow.test", "fast.test")
         for i in range(4)],
        "url string, host string",
    )
    sched = url_frontier_schedule(urls, "url", host_col="host",
                                  per_host_per_round=2)
    paced = schedule_fetch_times(sched, rules, default_delay_s=1.0)
    got = {(r.host, r.round): r.not_before_s for r in paced.collect()}
    assert got[("slow.test", 0)] == 0.0 and got[("slow.test", 1)] == 5.0
    assert got[("fast.test", 0)] == 0.0 and got[("fast.test", 1)] == 1.0


# ------------------------------------------------------ anchor-text corpus ---


def test_anchor_text_corpus_topk_counts_hosts(spark):
    from bitfilters_spark.operators.web import anchor_text_corpus

    rows = [
        # (dst_url, anchor, src_host, nofollow)
        ("http://t/a", "Download", "h1", False),
        ("http://t/a", "Download", "h2", False),
        ("http://t/a", "download page", "h1", False),
        ("http://t/a", "click", "h3", False),
        ("http://t/a", None, "h4", False),          # bare link: counted, no text
        ("http://t/a", "  ", "h4", False),          # whitespace anchor
        ("http://t/b", "spam", "h9", True),         # nofollow: excluded
        ("http://t/b", "real", "h1", False),
    ]
    df = spark.createDataFrame(
        rows, "dst_url string, anchor string, src_host string, nofollow boolean"
    )
    got = {
        r["dst_url"]: r
        for r in anchor_text_corpus(df, top_k=2).collect()
    }
    a = got["http://t/a"]
    assert a["n_links"] == 6 and a["n_ref_hosts"] == 4
    # top-2 by count: Download (2), then tie at 1 broken by anchor text
    assert [x["anchor"] for x in a["anchors"]] == ["Download", "click"]
    assert [x["n"] for x in a["anchors"]] == [2, 1]
    assert a["anchor_text"] == "Download click"
    b = got["http://t/b"]
    assert b["n_links"] == 1 and [x["anchor"] for x in b["anchors"]] == ["real"]


def test_anchor_text_corpus_keep_nofollow_and_empty(spark):
    from bitfilters_spark.operators.web import anchor_text_corpus

    df = spark.createDataFrame(
        [("http://t/b", "spam", "h9", True)],
        "dst_url string, anchor string, src_host string, nofollow boolean",
    )
    kept = anchor_text_corpus(df, nofollow_col=None).collect()[0]
    assert kept["anchor_text"] == "spam"
    empty = spark.createDataFrame(
        [], "dst_url string, anchor string, src_host string, nofollow boolean"
    )
    assert anchor_text_corpus(empty).count() == 0
    with pytest.raises(ValueError, match="top_k"):
        anchor_text_corpus(df, top_k=0)


def test_anchor_text_corpus_from_extract_links(spark):
    """Composition: fetched pages → extract_links → anchor corpus; the
    aggregated anchor text describes the TARGET page."""
    from bitfilters_spark.operators.web import anchor_text_corpus, extract_links

    pages = [
        ("http://a.com/", '<a href="http://t.com/x">Great Tool</a>'),
        ("http://b.com/", '<a href="http://t.com/x">great tool docs</a>'),
        ("http://c.com/", '<a rel="nofollow" href="http://t.com/x">ad</a>'),
    ]
    edges = extract_links(
        spark.createDataFrame(pages, "url string, html string")
    )
    got = anchor_text_corpus(edges).collect()
    row = {r["dst_url"]: r for r in got}["http://t.com/x"]
    assert row["n_links"] == 2 and row["n_ref_hosts"] == 2
    assert "Great Tool" in row["anchor_text"]
    assert "ad" not in row["anchor_text"]
