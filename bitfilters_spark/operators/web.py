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

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)


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


def remove_boilerplate_lines(
    df,
    id_col: str,
    text_col: str,
    min_df: int,
    sep: str = "\n",
):
    """C4/RefinedWeb-style boilerplate removal: drop EVERY occurrence of
    any line appearing in at least ``min_df`` distinct documents
    ("subscribe to our newsletter", cookie banners, nav menus), keep
    everything else in order. Complementary to ``dedup_paragraphs``
    (which keeps a repeated block's FIRST occurrence — right for
    content, wrong for boilerplate, which no document should keep).

    Returns (id, text, n_removed, n_lines) — ``text`` is the rebuilt
    document (empty string when every line was boilerplate),
    ``n_removed``/``n_lines`` feed the quality gates (a page that was
    mostly chrome is itself a drop candidate).

    Plan: lines explode with position → per-line-hash distinct-doc
    count (Spark's two-phase distinct: an (lh, doc) pre-aggregation
    then the lh count — both shuffles carry 16-byte long pairs, both
    map-side partial) → the hot set is TINY by construction (at most
    total_lines / min_df entries) and broadcasts into the join → the
    corpus itself shuffles exactly ONCE (the per-doc regroup via
    ``array_sort(collect_list(struct(pos, line)))``); nothing ∝
    corpus² anywhere. The explode is evaluated in both branches, but
    the df branch prunes to hashed longs map-side — cheaper than
    materializing the exploded corpus to share it."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "__pos", "__line"
        ),
    ).withColumn("__lh", F.xxhash64("__line"))
    hot = (
        lines.groupBy("__lh")
        .agg(F.countDistinct(id_col).alias("__df"))
        .where(F.col("__df") >= min_df)
        .select("__lh")
    )
    marked = lines.join(F.broadcast(hot).withColumn("__hot", F.lit(1)), "__lh", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__hot").isNull(),
                        F.struct(F.col("__pos"), F.col("__line")),
                    )
                )
            ).alias("__kept"),
            F.count(F.lit(1)).alias("n_lines"),
            F.count("__hot").alias("n_removed"),
        )
        .select(
            id_col,
            F.array_join(
                F.transform("__kept", lambda s: s["__line"]), sep
            ).alias(text_col),
            "n_removed",
            "n_lines",
        )
    )


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


def url_domain(col, registrable: bool = True, suffixes=None) -> Column:
    """Domain of a URL for per-domain caps and grouping.

    With ``registrable`` and no ``suffixes``, the common multi-part
    public suffixes (co.uk etc.) keep three labels and everything else
    keeps the last two — a deterministic heuristic standing in for the
    public-suffix list (which is a data file, not an algorithm).

    ``suffixes`` — an iterable of public-suffix strings ("co.uk",
    "uk.com", "github.io", ...) — replaces the heuristic with an exact
    longest-suffix match compiled into ONE regex alternation (still a
    pure JVM expression, scan speed). Right-sized for a curated list of
    up to a few hundred suffixes; for the full ~9k-rule public-suffix
    list use :func:`resolve_url_domain`, which broadcast-joins a suffix
    table instead of inlining it into the plan."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    if not registrable:
        return host
    if suffixes is not None:
        # longest (most labels, then longest string) first so the regex
        # alternation prefers "uk.com" over "com" for a.b.uk.com
        ordered = sorted(
            {s.strip(".").lower() for s in suffixes},
            key=lambda s: (-s.count("."), -len(s)),
        )
        alt = "|".join(re.escape(s).replace("\\-", "-") for s in ordered)
        return F.when(
            host.rlike(rf"[^.]\.(?:{alt})$"),
            F.regexp_extract(host, rf"([^.]+\.(?:{alt}))$", 1),
        ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))
    two_part = r"\.(co|com|org|net|gov|ac|edu)\.[a-z]{2}$"
    return F.when(
        host.rlike(two_part),
        F.regexp_extract(host, r"([^.]+\.(?:co|com|org|net|gov|ac|edu)\.[a-z]{2})$", 1),
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def resolve_url_domain(
    df,
    url_col: str,
    suffixes_df,
    out_col: str = "domain",
    max_suffix_labels: int = 4,
):
    """Registrable domain via a real public-suffix TABLE — the
    production path for the full ~9k-rule list, which is too large to
    inline into an expression.

    ``suffixes_df`` is one string column (any name) of plain suffix
    rules ("com", "co.uk", "github.io"; wildcard/exception PSL rules
    are not interpreted — pre-expand them). For each host the candidate
    suffixes (its last 1..``max_suffix_labels`` labels, never the whole
    host) are matched with one broadcast LEFT join per candidate length
    — all map-side, ZERO shuffle of ``df`` — and the longest match
    wins: registrable = one label + matched suffix. Hosts matching no
    rule fall back to their last two labels (the PSL convention of
    treating an unknown TLD as a plain suffix)."""
    sfx_col = suffixes_df.columns[0]
    sfx = (
        suffixes_df.select(
            F.lower(F.trim(F.col(sfx_col))).alias("_bf_sfx")
        )
        .where(F.col("_bf_sfx") != "")
        .distinct()
    )
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    out = df.withColumn("_bf_labels", F.split(host, r"\.")).withColumn(
        "_bf_n", F.size("_bf_labels")
    )
    for i in range(1, max_suffix_labels + 1):
        out = out.withColumn(
            f"_bf_cand{i}",
            F.when(
                F.col("_bf_n") > i,  # suffix must leave >=1 label over
                F.array_join(
                    F.slice(F.col("_bf_labels"), F.col("_bf_n") - i + 1, i), "."
                ),
            ),
        )
        out = out.join(
            F.broadcast(sfx.select(F.col("_bf_sfx").alias(f"_bf_hit{i}"))),
            out[f"_bf_cand{i}"] == F.col(f"_bf_hit{i}"),
            "left",
        )
    match_len = F.greatest(
        *[
            F.when(F.col(f"_bf_hit{i}").isNotNull(), F.lit(i)).otherwise(F.lit(0))
            for i in range(1, max_suffix_labels + 1)
        ]
    )
    domain = F.when(
        match_len > 0,
        F.array_join(
            F.slice(F.col("_bf_labels"), F.col("_bf_n") - match_len, match_len + 1),
            ".",
        ),
    ).otherwise(
        F.when(
            F.col("_bf_n") >= 2,
            F.array_join(F.slice(F.col("_bf_labels"), F.col("_bf_n") - 1, 2), "."),
        ).otherwise(F.array_join(F.col("_bf_labels"), "."))
    )
    drop = ["_bf_labels", "_bf_n"] + [
        c for i in range(1, max_suffix_labels + 1) for c in (f"_bf_cand{i}", f"_bf_hit{i}")
    ]
    return out.withColumn(out_col, domain).drop(*drop)


# --------------------------------------------------------------------------
# encoding repair (mojibake)
# --------------------------------------------------------------------------

def _sloppy_cp1252_decode(bs: bytes) -> str:
    """cp1252 decode with ftfy's 'sloppy' extension: the five bytes cp1252
    leaves undefined (0x81 0x8D 0x8F 0x90 0x9D) decode to their C1
    controls — which is what real-world decoders (and browsers) do, and
    why mojibake for chars like the right double quote (UTF-8 ...0x9D)
    contains an invisible control character."""
    return "".join(
        bytes([b]).decode("cp1252", errors="ignore") or chr(b) for b in bs
    )


def _sloppy_cp1252_encode(t: str) -> bytes:
    out = bytearray()
    for ch in t:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            if ord(ch) < 0x100:
                out.append(ord(ch))
            else:
                raise
    return bytes(out)


# The characters that dominate crawl-text mojibake (curly quotes, dashes,
# ellipsis, bullet, NBSP, guillemets, degree, common Latin-1 letters).
# Each maps to the string its UTF-8 bytes display as when mis-decoded as
# cp1252 — derived from the real codec round-trip at import time, so the
# table cannot drift from the encoding model that repairs it.
_MOJI_TARGETS = (
    "’‘“”–—…•€™"
    "\xab\xbb\xb0\xa0\xe9\xe8\xe0\xe7\xf4\xfb\xee\xef\xe4\xf6\xfc"
    "\xdf\xf1\xed\xf3\xfa\xe1\xc9"
)
# Two broken images per target: UTF-8 bytes mis-decoded as cp1252 (the
# browser default, continuation bytes render as €™“ etc.) and as
# latin-1 (continuation bytes survive as invisible C1 controls). Both
# occur in real crawls; where the images coincide (pure Latin-1 range
# continuations) the dict dedupes them.
_MOJIBAKE = sorted(
    {
        _sloppy_cp1252_decode(t.encode("utf-8")): t for t in _MOJI_TARGETS
    }.items()
    | {
        t.encode("utf-8").decode("latin-1"): t for t in _MOJI_TARGETS
    }.items(),
    key=lambda p: (-len(p[0]), p[0]),
)


# First characters of every broken sequence. No replacement target is
# itself a lead character (asserted at import), so text containing none
# of these is a fixpoint of the entire chain — the basis for `gated`.
_MOJI_LEADS = "".join(sorted({b[0] for b, _ in _MOJIBAKE}))
assert not set(_MOJI_LEADS) & {t for _, t in _MOJIBAKE}


def fix_mojibake(col, gated: bool = False) -> Column:
    """Repair the dominant UTF-8-read-as-cp1252 mojibake ("â€™" → "’",
    "Ã©" → "é") with a fixed replace chain — pure JVM string ops at scan
    speed, zero false repairs on clean text because every broken
    sequence starts with â/Ã/Â/€-class lead bytes followed by specific
    continuation characters, digraphs that don't occur in intentional
    text. Longer sequences replace before their prefixes. For arbitrary
    sequences use :func:`fix_mojibake_exact` (Arrow UDF, true codec
    round-trip).

    ``gated=True`` adds one cheap lead-char scan per row and skips the
    whole chain when no lead char is present — byte-identical output
    (every broken sequence starts with a lead char and no replacement
    emits one, so gate-false rows are provably fixpoints), but on a
    mostly-clean corpus the dominant per-row cost drops from
    len(_MOJIBAKE) string scans to one."""
    c = F.col(col) if isinstance(col, str) else col
    fixed = c
    for broken, repaired in _MOJIBAKE:
        fixed = F.replace(fixed, F.lit(broken), F.lit(repaired))
    if gated:
        return F.when(c.rlike("[" + _MOJI_LEADS + "]"), fixed).otherwise(c)
    return fixed


def fix_mojibake_exact(col) -> Column:
    """Exact repair via the real byte round-trip (sloppy-cp1252 encode →
    UTF-8 decode), applied ONLY where the round-trip fully succeeds AND
    actually changes the text — already-clean or mixed text passes
    through untouched, which also makes the repair idempotent (repaired
    text contains no cp1252-encodable UTF-8 multibyte images). Arrow-
    batched pandas UDF: the slow path, for corpora where the fixed-table
    chain isn't enough."""

    @F.pandas_udf("string")
    def fix(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            try:
                return _sloppy_cp1252_encode(t).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return t

        return s.map(one)

    return fix(F.col(col) if isinstance(col, str) else col)


def moji_prefix() -> str:
    """Every broken sequence in the repair table, space-separated — the
    shared fixture the driver query and its DuckDB oracle both prepend
    so the whole table is exercised cross-engine."""
    return " ".join(b for b, _ in _MOJIBAKE) + " | "


def moji_repair_sql(expr: str) -> str:
    """The DuckDB/ANSI replay of :func:`fix_mojibake`: the identical
    replace chain, same table, same order, nested around ``expr``."""
    out = expr
    for broken, fixed in _MOJIBAKE:
        b = broken.replace("'", "''")
        f = fixed.replace("'", "''")
        out = f"replace({out}, '{b}', '{f}')"
    return out


def url_template(col) -> Column:
    """Structural template of a URL — variable parts collapse to typed
    placeholders (digit runs → ``{N}``, ≥8-char hex runs → ``{H}``,
    ≥16-char base64-ish runs → ``{T}``, every query VALUE → ``{V}``) so
    the infinitely-many URLs a crawler trap generates
    (``/calendar/2024/01/03``, ``?sessionid=ab12…``, ``/page/1..10^9``)
    all map to ONE template string. Pure JVM regexp chain, scan speed."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(c, r"#.*$", "")
    # query values first (before digit/hex collapse eats the delimiters)
    t = F.regexp_replace(t, r"(?<=[?&])([^=&#]+)=[^&#]*", "$1={V}")
    t = F.regexp_replace(t, r"[0-9a-fA-F]{8,}", "{H}")
    # one path segment's worth of token characters (URL-safe base64) —
    # '/' deliberately excluded or the rule would swallow whole paths
    t = F.regexp_replace(t, r"[A-Za-z0-9_-]{16,}", "{T}")
    return F.regexp_replace(t, r"[0-9]+", "{N}")


def detect_url_traps(
    df: DataFrame,
    url_col: str,
    max_urls_per_template: int = 1000,
    host_col: str | None = None,
) -> DataFrame:
    """Crawler-trap detection over a frontier or link table: collapse
    every URL to its :func:`url_template` and flag templates whose
    DISTINCT-URL population explodes past ``max_urls_per_template`` —
    calendars, session-id mirrors, faceted-search grids, infinite
    pagination. Real frontiers die on these (the trap emits unbounded
    novel URLs, so per-URL dedup never saves you; the TEMPLATE is the
    stable identity).

    Returns (template [, host], n_urls, example_url, is_trap) — one row
    per template, host-scoped when ``host_col`` is given (the same
    template on two hosts is two decisions). Anti-join the frontier
    against ``is_trap`` templates before scheduling.

    Plan: one map-side template projection + one groupBy on (template
    [, host]) with map-side-combined count + min(url) as the example —
    a single shuffle of template-keyed rows, output ∝ distinct
    templates (tiny next to the URL count)."""
    keys = ([F.col(host_col)] if host_col else []) + [
        url_template(url_col).alias("template")
    ]
    grouped = (
        df.select(*keys, F.col(url_col).alias("__u"))
        .groupBy(*[k if isinstance(k, str) else k for k in
                   (["template"] + ([host_col] if host_col else []))])
        .agg(
            F.countDistinct("__u").alias("n_urls"),
            F.min("__u").alias("example_url"),
        )
    )
    return grouped.select(
        "template",
        *([host_col] if host_col else []),
        "n_urls",
        "example_url",
        (F.col("n_urls") > max_urls_per_template).alias("is_trap"),
    )


def url_frontier_schedule(
    df,
    url_col: str,
    host_col=None,
    priority_col=None,
    per_host_per_round: int = 1,
    n_fetchers: int | None = None,
):
    """Politeness-partitioned crawl scheduling: assign every URL a fetch
    ``round`` such that at most ``per_host_per_round`` URLs of the same
    host land in one round (per-host rate limiting as a PLAN property,
    not a runtime limiter), highest ``priority_col`` first within each
    host; optionally a stable ``fetcher`` assignment
    (hash(host) % n_fetchers) so a host is always fetched by the same
    worker — connection reuse, and the rate limit is enforceable locally
    with no coordination.

    round = (rank_within_host - 1) // per_host_per_round with rank over
    ONE host-partitioned window ordered by (priority DESC, url) — a
    single shuffle on the host key, scan-speed expressions elsewhere,
    and the whole schedule is deterministic and SQL-replayable (exact
    oracle: the identical QUALIFY-free window in ANSI SQL). At 100 TB
    the frontier shuffles once on host — the same key a real fetcher
    fleet partitions by — and hot hosts cost rank-sort only within
    their own partition group (use `skew_report` on the host column
    before scheduling a pathological frontier).

    ``host_col`` defaults to the URL's full lowercase HOSTNAME
    (``url_domain(url, registrable=False)``) — politeness is a
    per-server property, so site3.example.com and site4.example.com
    rate-limit independently (group by the registrable domain instead
    by passing ``host_col=url_domain(col, registrable=True)`` when one
    operator runs the whole domain). Pass an existing column name to
    skip the parse. Returns the input columns plus (host, round,
    fetcher?).
    """
    from pyspark.sql import Window

    if per_host_per_round <= 0:
        raise ValueError("per_host_per_round must be positive")
    host = (
        (F.col(host_col) if isinstance(host_col, str) else host_col)
        if host_col is not None
        else url_domain(url_col, registrable=False)
    )
    out = df.withColumn("host", host)
    order = (
        [F.col(priority_col).desc()] if priority_col is not None else []
    ) + [F.col(url_col)]
    w = Window.partitionBy("host").orderBy(*order)
    out = out.withColumn(
        "round",
        ((F.row_number().over(w) - 1) / per_host_per_round).cast("long"),
    )
    if n_fetchers is not None:
        out = out.withColumn(
            "fetcher", F.pmod(F.xxhash64("host"), F.lit(n_fetchers)).cast("long")
        )
    return out


ROBOTS_RULE_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("allow", BooleanType()),
        StructField("path_prefix", StringType()),
        StructField("path_regex", StringType()),
        StructField("crawl_delay", DoubleType()),
    ]
)


def _robots_pattern_regex(pattern: str):
    """RFC 9309 §2.2.3 match-pattern → anchored Java regex, or None for
    a plain prefix (no ``*``, no terminal ``$``) — prefix rules keep the
    cheaper ``startswith`` path in :func:`apply_robots`. ``*`` matches
    any run of characters; a ``$`` in FINAL position anchors the end of
    the URL path; everywhere else ``$`` is literal (the spec gives it
    meaning only as the last character)."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(seg) for seg in body.split("*"))
    return rx + "$" if anchored else rx


def robots_rules(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse per-host robots.txt payloads into a RULE TABLE
    (host, allow, path_prefix, crawl_delay) — the missing front piece of
    the crawl family (#136): frontier scheduling (#127/#129) decides WHEN
    a host may be fetched; this decides WHAT may be fetched at all, and
    its Crawl-delay feeds the frontier's politeness knobs.

    The PREFIX-RULE subset of the Google/REP spec (RFC 9309) is
    implemented: ``User-agent`` sections (rules for the requested agent
    plus ``*`` fallback — the agent-specific group REPLACES ``*`` when
    present, per spec), ``Allow``/``Disallow`` path rules, and
    ``Crawl-delay``; comments and blank lines stripped; an empty
    Disallow value (allow-everything idiom) is ignored. ``*``/``$``
    match patterns (RFC 9309 §2.2.3 — ``Disallow: /*.php$``,
    ``Disallow: /*?sessionid=``) are compiled to anchored Java regexes
    at parse time (``path_regex``, NULL for plain prefixes, which keep
    the cheaper startswith path); precedence in :func:`apply_robots`
    stays length-of-rule-text per spec, wildcards counted as written.
    Parsing runs in one mapInPandas over (host, payload) rows
    — robots files are small by protocol, so per-host Python is
    metadata-scale; the OUTPUT rule table is host-scale and broadcasts
    into the URL join."""

    def parse(batches):
        for pdf in batches:
            hosts, allows, prefixes, regexes, delays = [], [], [], [], []
            for host, txt in zip(pdf[host_col], pdf[robots_col]):
                if txt is None:
                    continue
                groups: dict = {}
                current: list = []
                last_was_agent = False
                for raw in str(txt).splitlines():
                    line = raw.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    key, _, val = line.partition(":")
                    key = key.strip().lower()
                    val = val.strip()
                    if key == "user-agent":
                        ag = val.lower()
                        if last_was_agent:
                            current.append(ag)
                        else:
                            current = [ag]
                        for a in current:
                            groups.setdefault(a, [])
                        last_was_agent = True
                        continue
                    last_was_agent = False
                    if key in ("allow", "disallow", "crawl-delay") and current:
                        for a in current:
                            groups[a].append((key, val))
                rules = groups.get(agent.lower())
                if rules is None:
                    rules = groups.get("*", [])
                delay = None
                for key, val in rules:
                    if key == "crawl-delay":
                        try:
                            delay = float(val)
                        except ValueError:
                            pass
                        continue
                    if key == "disallow" and val == "":
                        continue  # explicit allow-everything idiom
                    if not val:
                        continue
                    hosts.append(host)
                    allows.append(key == "allow")
                    prefixes.append(val)
                    regexes.append(_robots_pattern_regex(val))
                    delays.append(None)
                if delay is not None:
                    # one delay row per host (path_prefix NULL) so the
                    # frontier can join it without scanning rule rows
                    hosts.append(host)
                    allows.append(True)
                    prefixes.append(None)
                    regexes.append(None)
                    delays.append(delay)
                # a host with no agent rules emits nothing: fully open
                # (apply_robots defaults unmatched URLs to allowed)
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "allow": allows,
                    "path_prefix": prefixes,
                    "path_regex": regexes,
                    "crawl_delay": delays,
                }
            )

    return df.select(host_col, robots_col).mapInPandas(
        parse, schema=ROBOTS_RULE_SCHEMA
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """``urls`` plus ``robots_allowed`` (boolean) and ``matched_rule``
    (the winning rule's text, NULL when no rule matched) — RFC 9309
    precedence: the LONGEST matching rule wins (rule text as written,
    wildcards counted), Allow beats Disallow on equal length, and a URL
    matching no rule is allowed. ``*``/``$`` match patterns evaluate
    via their parse-time-compiled ``path_regex`` (JVM ``RLIKE`` with a
    column-side pattern — the regex engine caches per distinct pattern,
    and the pattern side is the tiny broadcast rule table); plain
    prefixes keep the cheaper ``startswith``.

    Plan: the rule table is host-scale → BROADCAST left join on host
    (URLs never shuffle), rule match + longest-match election in pure
    JVM expressions via one (url)-keyed window over the matched rules —
    candidate multiplicity is rules-per-host, single digits in practice.
    The URL's PATH is everything from the first ``/`` after the scheme
    and authority (query string included, per spec)."""
    from pyspark.sql import Window

    c = F.col(url_col)
    path = F.concat(
        F.lit("/"),
        F.coalesce(
            F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://[^/]+/(.*)$", 1),
            F.lit(""),
        ),
    )
    u = urls.withColumn("__path", path).withColumn(
        "__uid", F.monotonically_increasing_id()
    )
    rule_rows = rules.where(F.col("path_prefix").isNotNull()).select(
        F.col("host").alias("__rhost"), "allow", "path_prefix", "path_regex"
    )
    hit = F.when(
        F.col("path_regex").isNotNull(),
        F.regexp_like(F.col("__path"), F.col("path_regex")),
    ).otherwise(F.col("__path").startswith(F.col("path_prefix")))
    joined = u.join(
        F.broadcast(rule_rows),
        (F.col(host_col) == F.col("__rhost")) & hit,
        "left",
    )
    w = Window.partitionBy("__uid").orderBy(
        F.length("path_prefix").desc_nulls_last(),
        F.col("allow").desc_nulls_last(),  # Allow wins length ties
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            *urls.columns,
            F.coalesce(F.col("allow"), F.lit(True)).alias("robots_allowed"),
            F.col("path_prefix").alias("matched_rule"),
        )
    )


def schedule_fetch_times(
    sched: DataFrame,
    rules: DataFrame,
    default_delay_s: float = 1.0,
    host_col: str = "host",
) -> DataFrame:
    """Turn the frontier's WAVE contract into wall-clock guidance:
    ``not_before_s = round × crawl_delay(host)`` — the earliest offset
    (seconds from crawl start) at which a URL's wave may fetch without
    violating the host's robots ``Crawl-delay`` (#136 parses it into
    NULL-prefix rule rows; hosts without one get ``default_delay_s``).
    Input is `url_frontier_schedule`'s output (or anything with a round
    column); the delay table is host-scale and broadcasts — URLs never
    shuffle. Fetchers sort their partition by ``not_before_s`` and
    sleep the gaps; the wave ordering is preserved because
    ``not_before_s`` is monotone in ``round`` per host."""
    delays = (
        rules.where(F.col("crawl_delay").isNotNull())
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("__delay"))
        .withColumnRenamed("host", "__dhost")
    )
    out = sched.join(
        F.broadcast(delays), F.col(host_col) == F.col("__dhost"), "left"
    )
    return out.select(
        *sched.columns,
        (
            F.col("round")
            * F.coalesce(F.col("__delay"), F.lit(float(default_delay_s)))
        ).alias("not_before_s"),
    )


def robots_meta(col) -> Column:
    """Per-page robots DIRECTIVES from ``<meta name="robots">`` tags —
    the in-page complement of the site-wide robots.txt gate (#136):
    robots.txt says what may be FETCHED, the meta tag says what a
    fetched page may be used for. Returns a struct
    ``(noindex boolean, nofollow boolean)``; a training-data pipeline
    drops ``noindex`` pages before indexing/retention and a crawler
    skips link extraction on ``nofollow`` pages.

    Pure JVM expressions: all robots meta tags are collected
    (``regexp_extract_all``) and a directive holds if ANY tag asserts it
    (the conservative union — the standard engine behavior for
    conflicting tags); ``none`` implies both per the de-facto spec.
    Attribute order and quoting are free (name before or after content,
    single/double/no quotes); matching is token-wise, so a content value
    of "noindexing" does NOT trigger."""
    c = F.col(col) if isinstance(col, str) else col
    tags = F.regexp_extract_all(
        c,
        F.lit(r"""(?is)<meta\b[^>]*\bname\s*=\s*["']?robots\b[^>]*>"""),
        F.lit(0),
    )

    def _content(t):
        cd = F.regexp_extract(t, r"""(?i)\bcontent\s*=\s*"([^"]*)\"""", 1)
        cs = F.regexp_extract(t, r"""(?i)\bcontent\s*=\s*'([^']*)'""", 1)
        cu = F.regexp_extract(t, r"""(?i)\bcontent\s*=\s*([^\s"'<>][^\s>]*)""", 1)
        return F.when(cd != "", cd).when(cs != "", cs).otherwise(cu)

    def _has(word):
        return F.exists(
            tags,
            lambda t: _content(t).rlike(
                rf"(?i)(^|[\s,])({word}|none)([\s,]|$)"
            ),
        )

    return F.struct(
        _has("noindex").alias("noindex"), _has("nofollow").alias("nofollow")
    )


def robots_sitemaps(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Sitemap discovery from robots.txt — the sitemaps.org ``Sitemap:``
    extension every major engine honors, and the missing hop between the
    robots gate (#136) and sitemap intake (#137): robots.txt → sitemap
    URL list → (fetch) → :func:`sitemap_urls` → frontier.

    ``Sitemap:`` lines are GLOBAL (they sit outside user-agent groups,
    per the protocol), so unlike :func:`robots_rules` no group state is
    needed and this is one pure-JVM ``regexp_extract_all`` explode —
    scan speed, no Python in the row path. Case-insensitive key,
    whole-line comments ignored (a ``#`` line never matches the
    line-start anchor), value read to the first whitespace. Output:
    (host, sitemap_url)."""
    return df.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(robots_col),
                F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"),
                F.lit(1),
            )
        ).alias("sitemap_url"),
    )


def sitemap_urls(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    carry_cols: tuple = (),
) -> DataFrame:
    """URL discovery from sitemap payloads (#137) — the crawl family's
    intake complement to the robots gate (#136): one sitemap XML blob →
    (url, lastmod, is_sitemap) rows, where ``is_sitemap`` marks nested
    sitemap-index entries (``<sitemap>`` blocks referencing further
    sitemap files — feed those back through a fetch for recursive
    expansion) and ``lastmod`` (string, NULL when absent) is the
    recrawl-scheduling signal `snapshot diff`-style consumers use.

    Entirely JVM-side: ``regexp_extract_all`` pulls the ``<url>``/
    ``<sitemap>`` blocks, one explode per payload, and per-block
    ``regexp_extract`` reads loc/lastmod — no XML library, no Python in
    the row path (sitemaps are machine-generated; the loc/lastmod
    pattern subset covers the protocol's required + common fields, and
    entity-unescaping of the four XML escapes rides as expressions).
    ``carry_cols`` pass through (e.g. the source host for a later
    robots/frontier join)."""
    c = F.col(xml_col)
    out = (
        df.select(*carry_cols, c.alias("__xml"))
        .withColumn(
            "__block",
            F.explode(
                F.expr(
                    "regexp_extract_all(regexp_replace(__xml, '[\\n\\r\\t]', ''), "
                    "'<(?:url|sitemap)>.*?</(?:url|sitemap)>', 0)"
                )
            ),
        )
        .select(
            *carry_cols,
            F.regexp_extract("__block", r"<loc>\s*(.*?)\s*</loc>", 1).alias("__loc"),
            F.regexp_extract("__block", r"<lastmod>\s*(.*?)\s*</lastmod>", 1).alias(
                "__lm"
            ),
            F.col("__block").startswith("<sitemap>").alias("is_sitemap"),
        )
        .where(F.col("__loc") != "")
    )
    unescape = F.col("__loc")
    # &amp; decoded LAST (the strip_html convention): double-escaped
    # text like "&amp;lt;" must render "&lt;", not double-decode to "<"
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")):
        unescape = F.replace(unescape, F.lit(ent), F.lit(ch))
    return out.select(
        *carry_cols,
        unescape.alias("url"),
        F.when(F.col("__lm") != "", F.col("__lm")).alias("lastmod"),
        "is_sitemap",
    )


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    carry_cols: tuple = (),
    normalize: bool = True,
) -> DataFrame:
    """HTML outlink extraction — the crawl loop's link-graph step
    (VERDICT r10 missing #1): one fetched page → (src_url, dst_url,
    src_host, dst_host, anchor, nofollow) edge rows, the input
    `graph.pagerank` (#135) ranks and `url_frontier_schedule` (#127)
    prioritizes; ``anchor`` is the link's visible text run (entity-
    decoded, truncated at the first nested tag — the strip_html trade),
    the classic relevance/quality signal anchor-text corpora are built
    from. With
    this, sitemap → robots → frontier → fetch → **links → pagerank →
    priority** is closed end-to-end (composition pytest in
    tests/test_extract_links.py).

    Entirely JVM-side (the `sitemap_urls` recipe): ``<script>``/
    ``<style>`` subtrees and comments are dropped first (their hrefs are
    dead text), ``regexp_extract_all`` pulls the ``<a ...>`` open tags,
    one explode per page, and per-tag expressions read the href
    (double-quoted, single-quoted, or unquoted — first match wins) and
    the ``rel=nofollow`` marker. The four XML/HTML entity escapes in
    hrefs are decoded (``&amp;`` in query strings is ubiquitous).

    Resolution follows RFC 3986's cases against the page URL — or the
    document's ``<base href>`` when present and absolute (a relative
    base falls back to the page URL):

    - absolute ``http(s)://...`` → kept as-is; any OTHER scheme
      (mailto:, javascript:, tel:, data:) is dropped — not crawl edges;
    - protocol-relative ``//host/path`` → base scheme attached;
    - root-relative ``/path`` → base origin attached;
    - query-only ``?q=..`` → base path kept, query replaced;
    - fragment-only ``#sec`` / empty href → dropped (self-edges by
      definition); fragments are stripped from every kept link;
    - relative ``path`` → resolved against the base directory with
      exact RFC 3986 §5.2.4 dot-segment removal (one higher-order
      ``aggregate`` running the segment-stack algorithm — any depth).

    ``normalize`` pipes both endpoints through :func:`normalize_url`
    (tracking params stripped, host lowercased) so the edge list keys
    match the dedup/frontier identity space; hosts come from
    :func:`url_domain` (registrable=False — frontier politeness is
    per-HOST, not per-registrable-domain). Duplicate edges are NOT
    collapsed here (pagerank dedups; anchor multiplicity is itself a
    signal) — `.distinct()` is one call away.

    100 TB posture: pure map-side expression work — no shuffle, no UDF,
    no Python in the row path; the explode's fan-out is links-per-page
    (tens), so output ∝ corpus links, the irreducible size of an edge
    list."""
    c = F.col(html_col)
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    cleaned = F.regexp_replace(c, r"[\n\r\t]", " ")

    def _href_of(tag):
        hd = F.regexp_extract(tag, r'(?i)\bhref\s*=\s*"([^"]*)"', 1)
        hs = F.regexp_extract(tag, r"(?i)\bhref\s*=\s*'([^']*)'", 1)
        hu = F.regexp_extract(tag, r"""(?i)\bhref\s*=\s*([^\s"'<>][^\s<>]*)""", 1)
        return F.when(hd != "", hd).when(hs != "", hs).otherwise(hu)

    base_tag = _href_of(F.regexp_extract(cleaned, r"(?i)(<base\b[^>]*>)", 1))
    # a <base href> governs resolution only when itself absolute —
    # resolving a relative base against the page URL is a spec corner
    # real pages don't exercise; fall back to the page URL instead
    base = F.when(
        base_tag.rlike(r"(?i)^https?://"), base_tag
    ).otherwise(F.col(url_col))

    tagged = (
        df.select(
            *carry_cols,
            F.col(url_col).alias("__src"),
            base.alias("__base"),
            F.explode(
                F.expr(
                    f"regexp_extract_all(regexp_replace(regexp_replace("
                    f"regexp_replace({html_col}, "
                    "'(?is)<(script|style)\\\\b[^>]*>.*?</\\\\1\\\\s*>', ' '), "
                    "'(?s)<!--.*?-->', ' '), '[\\\\n\\\\r\\\\t]', ' '), "
                    "'(?i)<a\\\\s[^>]*>[^<]*', 0)"
                )
            ).alias("__tag"),
        )
    )
    # Each step below is its own select with NAMED intermediate columns:
    # inlining the whole chain into one expression tree makes codegen
    # size multiplicative (the resolver CASE would be re-expanded inside
    # every dot-removal round and again inside normalize_url — a single
    # flat select OOMed the codegen StringBuilder); staged projections
    # with non-cheap expressions used >1x stay un-collapsed, keeping
    # codegen linear. Still one map-side stage at runtime.
    # attribute scans read ONLY the open tag (the run before the first
    # '>'): the captured __tag carries the anchor's trailing text, and
    # visible text like "set rel=nofollow on links" must not flip the
    # nofollow flag, nor may an href-less anchor whose TEXT contains
    # "href=..." fabricate an edge
    open_tag = F.regexp_extract(F.col("__tag"), r"^([^>]*)", 1)
    href = _href_of(open_tag)
    # &amp; decoded LAST (the strip_html convention, web.py:43): a
    # double-escaped href piece "&amp;lt;" means the literal "&lt;"
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                    ("&amp;", "&")):
        href = F.replace(href, F.lit(ent), F.lit(ch))
    # strip the fragment everywhere (never part of the fetch identity)
    href = F.trim(F.regexp_replace(href, r"#.*$", ""))

    # anchor text: the text run between the open tag and the next tag
    # (nested markup inside the anchor truncates at its first '<' — the
    # deterministic scan-speed subset, same trade as strip_html)
    anchor = F.trim(F.regexp_extract(F.col("__tag"), r">([^<]*)$", 1))
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                    ("&amp;", "&")):
        anchor = F.replace(anchor, F.lit(ent), F.lit(ch))

    carry = list(carry_cols)
    step = tagged.select(
        *carry,
        "__src",
        "__base",
        href.alias("__href"),
        anchor.alias("anchor"),
        open_tag
        .rlike(r"""(?i)\brel\s*=\s*["']?[^"'>]*\bnofollow\b""")
        .alias("nofollow"),
    )
    # drop empty/fragment-only hrefs and non-http(s) schemes HERE, on the
    # named column — filtering on a computed result further down would be
    # pushed back through the projects with the whole expression tree
    # substituted into the condition, doubling the stage's generated code
    # (which already brushes janino's 64KB method limit under the
    # explode, where whole-stage codegen cannot split expressions out)
    step = step.where(
        (F.col("__href") != "")
        & ~F.col("__href").rlike(r"(?i)^(?!https?://)[A-Za-z][A-Za-z0-9+.-]*:")
    )

    b = F.col("__base")
    base_nofrag = F.regexp_extract(b, r"^([^?#]*)", 1)
    step = step.select(
        *carry,
        "__src",
        "__href",
        "anchor",
        "nofollow",
        F.lower(F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)).alias(
            "__scheme"
        ),
        F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1).alias(
            "__origin"
        ),
        base_nofrag.alias("__bnf"),
    )
    # base directory: everything through the last '/' of the base path;
    # a bare-origin base (no path slash) directs relatives to '/'
    base_dir = F.when(
        F.col("__bnf").rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*$"),
        F.concat(F.col("__bnf"), F.lit("/")),
    ).otherwise(F.regexp_replace(F.col("__bnf"), r"[^/]*$", ""))

    h = F.col("__href")
    resolved = (
        F.when(h.rlike(r"(?i)^https?://"), h)
        .when(h.startswith("//"), F.concat(F.col("__scheme"), F.lit(":"), h))
        .when(h.startswith("/"), F.concat(F.col("__origin"), h))
        .when(h.startswith("?"), F.concat(F.col("__bnf"), h))
        .otherwise(F.concat(base_dir, h))
    )
    step = step.select(
        *carry, "__src", "anchor", "nofollow", resolved.alias("__res")
    )
    # dot-segment removal (RFC 3986 §5.2.4) on the path: ONE
    # higher-order `aggregate` runs the spec's segment-stack algorithm
    # ('.' skipped, '..' pops, anything else — empty segments included —
    # pushes; a trailing '.'/'..' keeps the trailing slash; '..' past
    # the root clamps to '/'). Exact at any nesting depth, and a single
    # compact expression — an earlier unrolled-regexp-rounds version
    # blew past janino's 64KB method limit and fell back interpreted.
    step = step.select(
        *carry,
        "__src",
        "anchor",
        "nofollow",
        F.regexp_extract(
            "__res", r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
        ).alias("__head"),
        F.regexp_extract("__res", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ).alias("__path"),
        F.regexp_extract("__res", r"(\?.*)$", 1).alias("__query"),
    )
    path_t = F.when(
        F.col("__path").rlike(r"/\.\.?$"), F.concat(F.col("__path"), F.lit("/"))
    ).otherwise(F.col("__path"))
    segs = F.split(path_t, "/")
    stack = F.aggregate(
        F.slice(segs, F.lit(2), F.size(segs) - 1),  # drop the pre-'/' ''
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(
                s == "..",
                F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
            )
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    clean_path = F.when(F.col("__path") == "", F.lit("")).otherwise(
        F.concat(F.lit("/"), F.array_join(stack, "/"))
    )
    out = step.select(
        *carry,
        F.col("__src").alias("src_url"),
        F.concat("__head", clean_path, "__query").alias("dst_url"),
        "anchor",
        "nofollow",
    )
    if normalize:
        # NULL endpoints (href like "http://" with an empty authority)
        # survive rather than be dropped: a trailing isNotNull filter
        # would push back through the projects with the normalize tree
        # substituted into it (see the 64KB note above). Downstream
        # consumers key on the URL and drop NULL keys anyway
        # (pagerank filters NULL endpoints; joins never match NULL).
        out = out.select(
            *carry,
            normalize_url(F.col("src_url")).alias("src_url"),
            normalize_url(F.col("dst_url")).alias("dst_url"),
            "anchor",
            "nofollow",
        )
    return out.select(
        *carry,
        "src_url",
        "dst_url",
        url_domain(F.col("src_url"), registrable=False).alias("src_host"),
        url_domain(F.col("dst_url"), registrable=False).alias("dst_host"),
        "anchor",
        "nofollow",
    )


def anchor_text_corpus(
    edges: DataFrame,
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
    src_host_col: str = "src_host",
    nofollow_col: str | None = "nofollow",
    top_k: int = 20,
) -> DataFrame:
    """Per-target anchor-text aggregation over `extract_links` edges —
    the classic retrieval/quality signal (anchor text describes the
    TARGET better than the target describes itself; search engines have
    indexed it since McBryan 1994): one row per dst URL with
    ``(dst_url, n_links, n_ref_hosts, anchors, anchor_text)`` where
    ``anchors`` is the top-``top_k`` distinct anchor strings by link
    count (ties by anchor, deterministic) as (anchor, n) structs and
    ``anchor_text`` their space-joined concatenation — feed it to
    `build_bm25_index` as a document surrogate, or to the quality
    classifier as off-page evidence.

    ``nofollow`` edges are excluded when the column is present (the
    publisher explicitly withheld the endorsement); pass
    ``nofollow_col=None`` to keep them. Empty/NULL anchors (image
    links, bare URLs) count toward ``n_links``/``n_ref_hosts`` but
    contribute no anchor text.

    Scale shape: the edge list first collapses to distinct
    (dst, anchor) counts in ONE map-side-combined aggregation (the
    per-dst host count rides the same shuffle as a distinct-count), so
    the window that ranks anchors runs over the REDUCED pair table,
    never raw edges, and `collect_list` only ever sees <= top_k
    pre-filtered rows per dst — a mega-popular URL with millions of
    in-links costs one combiner-friendly shuffle, not an unbounded
    per-key buffer."""
    from pyspark.sql import Window

    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    e = edges
    if nofollow_col is not None and nofollow_col in edges.columns:
        e = e.where(~F.coalesce(F.col(nofollow_col), F.lit(False)))
    base = e.groupBy(F.col(dst_col).alias("dst_url")).agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct(F.col(src_host_col)).alias("n_ref_hosts"),
    )
    pairs = (
        e.where(
            F.col(anchor_col).isNotNull() & (F.trim(F.col(anchor_col)) != "")
        )
        .groupBy(
            F.col(dst_col).alias("dst_url"),
            F.trim(F.col(anchor_col)).alias("anchor"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dst_url").orderBy(F.col("n").desc(), "anchor")
    top = (
        pairs.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= top_k)
        .groupBy("dst_url")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__rk", "anchor", "n"))
            ).alias("__a")
        )
        .select(
            "dst_url",
            F.transform(
                F.col("__a"), lambda s: s.dropFields("__rk")
            ).alias("anchors"),
            F.array_join(
                F.transform(F.col("__a"), lambda s: s["anchor"]), " "
            ).alias("anchor_text"),
        )
    )
    return base.join(top, "dst_url", "left")


def resolve_reference(base, ref) -> Column:
    """RFC 3986 §5 reference resolution as ONE column expression:
    ``ref`` (absolute, protocol-relative ``//h/p``, root-relative
    ``/p``, query-only ``?q``, empty, or relative ``p``) resolved
    against ``base``, with exact §5.2.4 dot-segment removal (the
    `extract_links` segment-stack ``aggregate``) and the fragment
    stripped. The standalone form of the resolver `extract_links`
    inlines — use it where references arrive OUTSIDE an href explode
    (HTTP ``Location`` headers, sitemap cross-references); pure JVM,
    no UDF."""
    base = base if isinstance(base, Column) else F.col(base)
    ref = ref if isinstance(ref, Column) else F.col(ref)
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    origin = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1)
    bnf = F.regexp_extract(base, r"^([^?#]*)", 1)
    base_dir = F.when(
        bnf.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*$"),
        F.concat(bnf, F.lit("/")),
    ).otherwise(F.regexp_replace(bnf, r"[^/]*$", ""))
    h = F.trim(F.regexp_replace(ref, r"#.*$", ""))
    resolved = (
        F.when(h.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(h.startswith("?"), F.concat(bnf, h))
        # empty / fragment-only reference: RFC 3986 §5.2.2 keeps the
        # base's QUERY too (only the fragment is replaced) — returning
        # bnf here dropped '?q=1' and split one URL identity into two
        .when(h == "", F.regexp_extract(base, r"^([^#]*)", 1))
        .otherwise(F.concat(base_dir, h))
    )
    head = F.regexp_extract(resolved, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    path = F.regexp_extract(
        resolved, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(resolved, r"(\?.*)$", 1)
    path_t = F.when(
        path.rlike(r"/\.\.?$"), F.concat(path, F.lit("/"))
    ).otherwise(path)
    segs = F.split(path_t, "/")
    stack = F.aggregate(
        F.slice(segs, F.lit(2), F.size(segs) - 1),
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(
                s == "..",
                F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
            )
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    clean_path = F.when(path == "", F.lit("")).otherwise(
        F.concat(F.lit("/"), F.array_join(stack, "/"))
    )
    return F.concat(head, clean_path, query)


def resolve_redirect_chains(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_hops: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Collapse redirect chains to their final target: (src_url,
    final_url, hops, unresolved) with ``a -> b -> c`` yielding
    ``(a, c, 2, false)``. The canonicalization step between
    `sources.warc.warc_redirects` and everything keyed on URL identity
    — dedup, the CDX index, frontier seen-sets — so ``http://m.ex/p``
    and its 301 target count as ONE document.

    ``hops`` counts edges followed; resolution stops at ``max_hops``
    (redirect chains past ~4 hops are crawler traps by convention —
    browsers give up at 20, crawlers much earlier) and rows whose final
    URL STILL has an outgoing redirect are flagged ``unresolved=true``
    (loops land here too: a -> b -> a bounces until the hop budget and
    stays flagged). Duplicate sources (recrawled redirects) collapse
    deterministically to the lexicographically-least target.

    Scale: the mapping is redirect-scale (≪ corpus); each hop is one
    URL-keyed equi-join, ``max_hops`` constant, lineage cut per hop
    (``materialize=False`` skips the per-hop localCheckpoint — right
    for small mappings consumed once, where the materialization jobs
    cost more than the re-derived lineage)."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    m = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .where(
            F.col("s").isNotNull()
            & F.col("d").isNotNull()
            & (F.col("s") != F.col("d"))
        )
        .groupBy("s")
        .agg(F.min("d").alias("d"))
    )
    if materialize:
        m = m.localCheckpoint()
    res = m.select(
        F.col("s").alias("src_url"),
        F.col("d").alias("final_url"),
        F.lit(1).alias("hops"),
    )
    step = m.select(F.col("s").alias("final_url"), F.col("d").alias("__next"))
    for _ in range(max_hops - 1):
        res = (
            res.join(step, "final_url", "left")
            .select(
                "src_url",
                F.coalesce("__next", F.col("final_url")).alias("final_url"),
                (
                    F.col("hops")
                    + F.when(F.col("__next").isNotNull(), 1).otherwise(0)
                ).alias("hops"),
            )
        )
        if materialize:
            res = res.localCheckpoint()
    return res.join(
        step.select("final_url", F.lit(True).alias("__more")),
        "final_url",
        "left",
    ).select(
        "src_url",
        "final_url",
        "hops",
        F.coalesce("__more", F.lit(False)).alias("unresolved"),
    )
