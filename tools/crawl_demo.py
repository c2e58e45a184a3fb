"""End-to-end CRAWL-LOOP demo from the wire format up: every stage is a
verified operator from this engine, chained the way a crawl pipeline
actually runs. Synthesizes `.warc.gz` archives from the documents table
(HTML-wrapped pages with cross-host outlinks, a re-crawl of 10% of
pages at a later date, one trap host emitting calendar URLs, a robots
file disallowing a subtree with a wildcard rule), then runs:

  read_warc (binaryFile → record split) → write_cdx + latest_captures
  (recrawl dedup) → warc_pages → robots_meta page gate → extract_links
  (anchor text + nofollow) → host pagerank → redirect canonicalization
  (warc_redirects → resolve_redirect_chains: discovered legacy URLs
  collapse onto their 301 targets) → robots.txt gate (RFC 9309
  wildcards) → url_template trap filter → url_frontier_schedule with
  pagerank priority — the NEXT crawl round's fetch list.

Prints one JSON line of per-stage rows/times.
Usage: ``python tools/crawl_demo.py [sf_dir]``.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _record(rtype: str, uri, body: bytes, ctype: str, date: str) -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"WARC-Date: {date}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _page(uri: str, html: str, date: str) -> bytes:
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html.encode()
    )
    return _record("response", uri, body, "application/http; msgtype=response", date)


def _redirect(uri: str, location: str, date: str) -> bytes:
    body = (
        b"HTTP/1.1 301 Moved Permanently\r\nLocation: "
        + location.encode()
        + b"\r\nContent-Type: text/html\r\n\r\n<html>moved</html>"
    )
    return _record("response", uri, body, "application/http; msgtype=response", date)


def main(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.graph import (
        label_propagation,
        pagerank,
        triangle_counts,
        trustrank,
    )
    from bitfilters_spark.operators.web import (
        apply_robots,
        detect_url_traps,
        extract_links,
        resolve_redirect_chains,
        robots_meta,
        robots_rules,
        url_domain,
        url_frontier_schedule,
        url_template,
    )
    from bitfilters_spark.session import make_session
    from bitfilters_spark.sources.warc import (
        latest_captures,
        parse_warc_records,
        read_warc,
        warc_cdx,
        warc_pages,
        warc_redirects,
        write_cdx,
    )

    spark = make_session(app="crawl-demo", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="crawl_demo_")
    stages: dict = {}
    t_all = time.time()

    def stage(name, df):
        t0 = time.time()
        n = df.count()
        stages[name] = {"rows": n, "s": round(time.time() - t0, 2)}
        return df

    try:
        docs = [
            (int(r["doc_id"]), r["text"][:400])
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .limit(2000)
            .collect()
        ]
        # ---- synthesize archives (driver-side: the demo's input fixture)
        arc_dir = os.path.join(tmp, "archives")
        os.makedirs(arc_dir)
        n_hosts = 23
        per_arc = 250
        buf, arc_i = [], 0
        for doc_id, text in docs:
            host = f"h{doc_id % n_hosts}.test"
            uri = f"http://{host}/p/{doc_id}"
            nxt = f"http://h{(doc_id + 1) % n_hosts}.test/p/{doc_id + 1}"
            meta = (
                '<meta name="robots" content="noindex">'
                if doc_id % 40 == 7
                else ""
            )
            legacy = (
                f'<a href="http://{host}/old/{doc_id}">legacy</a>'
                if doc_id % 25 == 3
                else ""
            )
            html = (
                f"<html><head>{meta}</head><body>"
                f'<a href="{nxt}">next</a><a href="/local/{doc_id}">me</a>'
                f"{legacy}<p>{text}</p></body></html>"
            )
            buf.append(_page(uri, html, "2024-01-01T00:00:00Z"))
            if doc_id % 25 == 3:
                # the legacy URL 301s (relative Location) to the page,
                # and a second hop chains through it
                buf.append(_redirect(
                    f"http://{host}/old/{doc_id}", f"/p/{doc_id}",
                    "2024-01-01T00:00:00Z",
                ))
                buf.append(_redirect(
                    f"http://{host}/old2/{doc_id}",
                    f"http://{host}/old/{doc_id}",
                    "2024-01-01T00:00:00Z",
                ))
            if doc_id % 10 == 0:  # later re-crawl of 10% of pages
                buf.append(_page(uri, html, "2024-02-01T00:00:00Z"))
            if len(buf) >= per_arc:
                with open(f"{arc_dir}/arc{arc_i}.warc.gz", "wb") as f:
                    f.write(b"".join(gzip.compress(r) for r in buf))
                buf, arc_i = [], arc_i + 1
        # one trap host: 400 calendar URLs in its pages
        trap_links = "".join(
            f'<a href="http://trap.test/cal/2024/{m:02d}/{d:02d}">x</a>'
            for m in range(1, 11) for d in range(1, 41)
        )
        buf.append(_page("http://trap.test/", f"<html><body>{trap_links}</body></html>",
                         "2024-01-01T00:00:00Z"))
        with open(f"{arc_dir}/arc{arc_i}.warc.gz", "wb") as f:
            f.write(b"".join(gzip.compress(r) for r in buf))

        # ---- the pipeline
        records = stage("warc_records", read_warc(spark, arc_dir).localCheckpoint())
        write_cdx(records, os.path.join(tmp, "cdx"), num_files=8)
        stages["cdx_files"] = {
            "rows": spark.read.parquet(os.path.join(tmp, "cdx")).count()
        }
        latest = stage("latest_captures", latest_captures(warc_cdx(records)))
        # newest capture per URL joins back to its RECORD for the body —
        # keyed on (source_file, record_offset), the capture identity;
        # a url-only join would keep every older duplicate too
        pages = stage(
            "pages",
            warc_pages(
                records.join(
                    latest.select("source_file", "record_offset"),
                    ["source_file", "record_offset"],
                    "left_semi",
                )
            ).localCheckpoint(),
        )
        indexable = stage(
            "meta_robots_gate",
            pages.withColumn("rm", robots_meta("html"))
            .where(~F.col("rm.noindex"))
            .drop("rm"),
        )
        links = stage(
            "extract_links",
            extract_links(indexable, "html", "url")
            .where(~F.col("nofollow"))
            .localCheckpoint(),
        )
        host_edges = links.where(
            F.col("src_host") != F.col("dst_host")
        ).select(
            F.xxhash64("src_host").alias("s"), F.xxhash64("dst_host").alias("d")
        ).localCheckpoint()
        ranks = stage(
            "host_pagerank",
            pagerank(
                host_edges, "s", "d", iters=3, dangling="redistribute"
            ).localCheckpoint(),
        )
        # r14 spam signals over the SAME host graph: triangle/clustering
        # coefficient (farm detection), LPA communities, and trust from
        # a seed at the highest-pagerank host
        tric = stage("triangles", triangle_counts(host_edges, "s", "d"))
        stages["triangles"]["closed"] = int(
            tric.agg(F.sum("triangles")).first()[0] or 0
        )
        comm = stage("communities", label_propagation(host_edges, "s", "d", iters=3))
        stages["communities"]["n_communities"] = comm.select(
            "label"
        ).distinct().count()
        seed = ranks.orderBy(F.col("rank").desc(), "node").limit(1).select("node")
        tr = stage("trustrank", trustrank(host_edges, "s", "d", seed, iters=3))
        stages["trustrank"]["n_trusted"] = tr.where(F.col("trust") > 0).count()

        # robots.txt: trap.test disallows nothing, every hN.test host
        # wildcard-disallows its /local/ mirror subtree
        robots = spark.createDataFrame(
            [(f"h{i}.test", "User-agent: *\nDisallow: /local/*\n")
             for i in range(n_hosts)],
            "host string, robots_txt string",
        )
        rules = robots_rules(robots)
        frontier = links.select(
            F.col("dst_url").alias("url"),
            F.col("dst_host").alias("host"),
        ).distinct()
        # redirect canonicalization: discovered legacy URLs collapse
        # onto their 301 chains' final targets before any gating, so a
        # moved page is one frontier row, not two
        chains = resolve_redirect_chains(warc_redirects(records))
        stages["redirect_chains"] = {"rows": chains.count()}
        frontier = stage(
            "redirect_canonical",
            frontier.join(
                chains.select(F.col("src_url").alias("url"), "final_url"),
                "url",
                "left",
            )
            .select(F.coalesce("final_url", "url").alias("url"))
            .distinct()
            .withColumn("host", url_domain(F.col("url"), registrable=False)),
        )
        allowed = stage(
            "robots_gate",
            apply_robots(frontier, rules).where(F.col("robots_allowed")),
        )
        traps = detect_url_traps(
            allowed, "url", max_urls_per_template=100, host_col="host"
        ).where("is_trap").select("template", "host")
        clean = stage(
            "trap_gate",
            allowed.withColumn("template", url_template("url")).join(
                traps, ["template", "host"], "left_anti"
            ),
        )
        pr = ranks.select(F.col("node").alias("hn"), F.col("rank").alias("prio"))
        sched = stage(
            "frontier",
            url_frontier_schedule(
                clean.withColumn("hn", F.xxhash64("host"))
                .join(pr, "hn", "left")
                .fillna(0.0, subset=["prio"]),
                "url",
                host_col="host",
                priority_col="prio",
                per_host_per_round=10,
                n_fetchers=8,
            ),
        )
        stages["round0"] = {
            "rows": sched.where(F.col("round") == 0).count()
        }
        stages["total_s"] = round(time.time() - t_all, 2)
        print(json.dumps({"sf_dir": sf_dir, "stages": stages},
                         separators=(",", ":")))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
