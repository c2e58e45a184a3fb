"""Crawl-side operators: HTML-to-text extraction and URL hygiene.

Upstream of every text metric in this engine sits a crawl: payloads are
HTML and identities are URLs. Both operators are pure
``pyspark.sql.functions`` expression chains (regexp/parse_url — JVM
codegen, no UDF), so they run map-side at scan speed on a 100 TB crawl
table and compose with the rest of the pipeline (`strip_html` →
`quality_metrics`/`gopher_rules`; `normalize_url`/`url_domain` →
`dedup_exact`/`cap_per_group`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_html(col) -> Column:
    """Visible text of an HTML payload: drops ``<script>``/``<style>``
    subtrees and comments, removes tags (block-level tags leave a space
    so words don't fuse), decodes the common entities, and collapses
    whitespace. A regex extractor by design — the deterministic,
    scan-speed cut that feeds the quality gates; a DOM parser belongs in
    a Pandas-UDF variant if fidelity ever beats throughput."""
    c = F.col(col) if isinstance(col, str) else col
    # kill script/style subtrees and comments first (their text is not
    # content); (?is) = dot-matches-newline + case-insensitive
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    # tags: any <...> run becomes a separator
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    # common entities (the long tail stays literal rather than wrong).
    # &amp; is decoded LAST: double-escaped text like "&amp;lt;" renders
    # as the literal "&lt;" and must NOT collapse further to "<".
    for ent, rep in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
    ]:
        c = F.regexp_replace(c, ent, rep)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


_TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref", "mc_cid", "mc_eid",
)


def normalize_url(col, strip_params: tuple = _TRACKING_PARAMS) -> Column:
    """Canonical URL for identity/dedup: lowercase scheme+host, default
    ports and fragments dropped, tracking query parameters removed
    (param order among survivors is preserved), trailing ``?``/``&``
    tidied, trailing slash on a bare path dropped. Built from
    ``parse_url`` + regexp expressions — two URLs that differ only in
    tracking noise normalize to the same string, which is exactly what
    `dedup_exact` on the result needs."""
    c = F.col(col) if isinstance(col, str) else col
    # try_parse_url, not parse_url: under ANSI mode parse_url THROWS on a
    # malformed URL — one bad row in a 100 TB crawl must yield NULL, not
    # kill the job
    scheme = F.lower(F.try_parse_url(c, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    path = F.try_parse_url(c, F.lit("PATH"))
    query = F.try_parse_url(c, F.lit("QUERY"))
    # drop tracking params from the query string
    for p in strip_params:
        query = F.regexp_replace(query, rf"(?i)(^|&){p}=[^&]*", "$1")
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"^&|&$", "")
    path_n = F.when(
        (path.isNull()) | (path == ""), F.lit("/")
    ).otherwise(F.regexp_replace(path, r"/+$", ""))
    path_n = F.when(path_n == "", F.lit("/")).otherwise(path_n)
    base = F.concat(scheme, F.lit("://"), host, path_n)
    return F.when(scheme.isNull() | host.isNull(), F.lit(None).cast("string")).otherwise(
        F.when((query.isNull()) | (query == ""), base).otherwise(
            F.concat(base, F.lit("?"), query)
        )
    )


def url_domain(col, registrable: bool = True) -> Column:
    """Domain of a URL for per-domain caps and grouping. With
    ``registrable`` the common multi-part public suffixes (co.uk etc.)
    keep three labels, everything else keeps the last two — a
    deterministic heuristic standing in for the public-suffix list
    (which is a data file, not an algorithm)."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    if not registrable:
        return host
    two_part = r"\.(co|com|org|net|gov|ac|edu)\.[a-z]{2}$"
    return F.when(
        host.rlike(two_part),
        F.regexp_extract(host, r"([^.]+\.(?:co|com|org|net|gov|ac|edu)\.[a-z]{2})$", 1),
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))
