"""End-to-end crawl -> training-shards demo: every stage is a verified
operator from this engine, chained the way a production pipeline would.

Synthesizes a "crawl" from the documents table (HTML wrapping + URLs with
tracking noise + injected duplicates), then runs:

  extract_links -> host PageRank -> frontier priority for the next
  crawl round (the closed crawl loop, r11) ->
  strip_html + fix_mojibake -> normalize_url dedup -> blocklist +
  Gopher rule gates -> C4 page gates (brace/lorem — catches the
  injected code/boilerplate pages) -> TRAINED quality classifier gate
  (GPT-3 recipe:
  reference-corpus positives vs noisy crawl negatives; catches the
  injected word-shaped junk no rule names) -> normalize_text exact
  dedup -> LSH near-dup dedup vs a persisted index -> n-gram
  decontamination -> DSIR selection (keep the 60% most
  reference-like, importance resampling) -> vocabulary + token
  encoding (packing budgets use
  the ENCODER's token counts, not the whitespace heuristic) -> BPE
  tokenizer TRAINED in-engine on the surviving corpus (merge count /
  subword-vocab / token-inflation reported) -> sequence packing ->
  MATERIALIZED packed sequences (EOS-separated, fixed shape) -> shard
  packing -> on-disk sequence shards + manifest (what a trainer
  actually reads; token counts conserved end to end)

Prints one JSON line of per-stage row counts and wall times.
Usage: ``python tools/pipeline_demo.py [sf_dir]``.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.dedup import dedup_exact
    from bitfilters_spark.operators.neardup_index import (
        build_lsh_index,
        dedup_against_index,
    )
    from bitfilters_spark.operators.packing import (
        materialize_sequences,
        pack_shards,
        pack_sequences,
        write_training_shards,
    )
    from bitfilters_spark.operators.text import (
        blocklist_filter,
        build_vocabulary,
        encode_documents,
        gopher_rules,
        ngram_contamination,
        normalize_text,
        token_count,
    )
    from bitfilters_spark.operators.bpe import bpe_token_counts, train_bpe
    from bitfilters_spark.operators.classifier import (
        classifier_filter,
        train_text_classifier,
    )
    from bitfilters_spark.operators.web import (
        fix_mojibake,
        normalize_url,
        strip_html,
    )
    from bitfilters_spark.session import make_session

    spark = make_session(app="pipeline-demo", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="pipeline_demo_")
    stages: dict = {}
    t_all = time.time()

    def stage(name, df):
        t0 = time.time()
        n = df.count()
        stages[name] = {"rows": n, "s": round(time.time() - t0, 2)}
        return df

    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        # synthetic crawl: html wrapping, noisy urls, 10% exact re-crawls
        crawl = docs.select(
            "doc_id",
            F.concat(
                F.lit("<html><head><script>x=1</script></head><body><p>"),
                F.col("text"),
                F.lit('</p><a href="https://site'),
                ((F.col("doc_id") + 1) % 37).cast("string"),
                F.lit('.example.com/p/'),
                (F.col("doc_id") + 1).cast("string"),
                F.lit('">next</a></body></html>'),
            ).alias("html"),
            F.concat(
                F.lit("https://Site"),
                (F.col("doc_id") % 37).cast("string"),
                F.lit(".example.com/p/"),
                F.col("doc_id").cast("string"),
                F.lit("?utm_source=crawl"),
            ).alias("url"),
        )
        recrawl = crawl.where(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        ).withColumn("url", F.regexp_replace("url", r"\?utm_source=crawl", ""))
        # r7: 5% junk pages (token-reversed text — word-shaped gibberish
        # no blocklist can name) for the TRAINED gate to catch
        junk = docs.where(F.col("doc_id") % 20 == 3).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(
                F.lit("<html><body><p>"),
                F.reverse(F.col("text")),
                F.lit("</p></body></html>"),
            ).alias("html"),
            F.concat(
                F.lit("https://junkfarm.example.com/j/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
        )
        # r8: code/boilerplate pages (curly-brace JS fragments + lorem
        # ipsum filler) for the C4 page gates to catch
        codejunk = docs.where(F.col("doc_id") % 25 == 7).select(
            (F.col("doc_id") + 3_000_000).alias("doc_id"),
            F.concat(
                F.lit("<html><body><p>Lorem ipsum dolor sit amet. "),
                F.lit("function f() { return 1; } "),
                F.col("text"),
                F.lit("</p></body></html>"),
            ).alias("html"),
            F.concat(
                F.lit("https://template.example.com/t/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
        )
        crawl = stage(
            "crawl",
            crawl.unionByName(recrawl).unionByName(junk)
            .unionByName(codejunk).localCheckpoint(),
        )

        # r11: the crawl loop's link-graph step — outlinks mined from
        # the fetched HTML itself feed host PageRank, which feeds the
        # frontier's priority for the NEXT crawl round (sitemap/robots
        # intake -> fetch -> extract_links -> pagerank -> frontier)
        from bitfilters_spark.operators.graph import pagerank
        from bitfilters_spark.operators.web import (
            extract_links,
            url_frontier_schedule,
        )

        links = stage(
            "extract_links",
            extract_links(crawl.select("url", "html"), "html", "url")
            .select("src_host", "dst_host")
            .localCheckpoint(),
        )
        hostrank = stage(
            "host_pagerank",
            pagerank(
                links.where(F.col("src_host") != F.col("dst_host")).select(
                    F.xxhash64("src_host").alias("s"),
                    F.xxhash64("dst_host").alias("d"),
                ),
                "s",
                "d",
                iters=2,
            ).localCheckpoint(),
        )
        next_round = stage(
            "frontier_by_rank",
            url_frontier_schedule(
                crawl.select("url")
                .withColumn("hnode", F.xxhash64(F.lower(F.regexp_extract("url", r"://([^/]+)/", 1))))
                .join(
                    hostrank.select(F.col("node").alias("hnode"), F.col("rank").alias("prio")),
                    "hnode",
                    "left",
                )
                .fillna(0.0, subset=["prio"]),
                "url",
                host_col="hnode",
                priority_col="prio",
                per_host_per_round=50,
            ),
        )

        extracted = crawl.select(
            "doc_id",
            # r7: mojibake repair rides the same scan as HTML stripping —
            # a no-op on clean text, a fix on mis-decoded crawls
            fix_mojibake(strip_html(F.col("html"))).alias("text"),
            normalize_url(F.col("url")).alias("url"),
        )
        by_url = stage("url_dedup", dedup_exact(extracted, "url", "doc_id"))

        # the synthetic corpus has no English stopwords, so the full
        # Gopher verdict is false everywhere by design — gate on the
        # applicable rules (a real English crawl would use gopher_pass)
        gated = gopher_rules(by_url, min_words=30).where(
            "rule_word_count AND rule_mean_len AND rule_symbol_ratio "
            "AND rule_alpha_words"
        ).select("doc_id", "text", "url")
        gated = stage(
            "quality_gate",
            blocklist_filter(gated, "text", ["spam", "casino"]).localCheckpoint(),
        )

        # r8: C4 page gates — the corpus is single-line so the line-
        # retention rule is not applicable; the brace/lorem page gates
        # catch exactly the injected code/boilerplate pages
        from bitfilters_spark.operators.text import c4_rules

        gated = stage(
            "c4_gate",
            c4_rules(gated, "text")
            .where("NOT c4_has_brace AND NOT c4_has_lorem")
            .select("doc_id", "text", "url")
            .localCheckpoint(),
        )

        # r7: TRAINED quality gate, the GPT-3/LLaMA recipe — positives =
        # a curated reference corpus (here the clean documents table),
        # negatives = a deterministic hash-sample of the raw crawl
        # (noisy: mostly fine pages plus the junk). The linear model
        # learns reference-likeness; the injected junk pages (word-
        # shaped gibberish no blocklist names, which the heuristic
        # rules can't catch either) fall well below the real pages.
        pos = docs.select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"),
            "text",
            F.lit(1).alias("label"),
        )
        neg = by_url.where(
            F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0
        ).select("doc_id", "text", F.lit(0).alias("label"))
        clf = train_text_classifier(
            pos.unionByName(neg), "doc_id", "text", "label",
            n_buckets=1 << 14, iters=40, lr=3.0,
        )
        gated = stage(
            "classifier_gate",
            classifier_filter(gated, "doc_id", "text", clf, 0.45).localCheckpoint(),
        )

        # r11: CCNet perplexity gate — Kneser-Ney LM trained on the
        # clean reference corpus scores every surviving crawl page;
        # the high-perplexity tail bucket (least reference-like third)
        # is dropped, the head/middle kept
        from bitfilters_spark.operators.lm import (
            kn_score,
            perplexity_buckets,
            train_kn_lm,
        )

        knlm = train_kn_lm(docs, "text", vocab_size=1 << 16)
        buckets = perplexity_buckets(
            kn_score(gated, "doc_id", "text", knlm), "ppl"
        ).select("doc_id", "bucket")
        # LEFT join: docs with < 2 tokens have no bigrams, hence no
        # score row — length is not a perplexity verdict, so they pass
        # (code-review finding: an inner join silently dropped them)
        gated = stage(
            "perplexity_gate",
            gated.join(buckets, "doc_id", "left")
            .where(F.col("bucket").isNull() | (F.col("bucket") != "tail"))
            .drop("bucket")
            .localCheckpoint(),
        )

        exact = stage(
            "exact_dedup",
            dedup_exact(
                gated.withColumn("norm", normalize_text(F.col("text"))),
                "norm",
                "doc_id",
            ).drop("norm").localCheckpoint(),
        )

        spark.sql("DROP TABLE IF EXISTS demo_ix_bands")
        spark.sql("DROP TABLE IF EXISTS demo_ix_shingles")
        half = exact.where(F.col("doc_id") % 2 == 0)
        build_lsh_index(half, "doc_id", "text", "demo_ix", path=f"{tmp}/ix")
        incoming = exact.where(F.col("doc_id") % 2 == 1)
        clean = stage(
            "near_dedup_vs_index",
            half.unionByName(
                dedup_against_index(spark, incoming, "doc_id", "text", "demo_ix")
            ).localCheckpoint(),
        )

        bench_grams = docs.where(F.col("doc_id") % 17 == 0)
        scored = ngram_contamination(clean, bench_grams, "doc_id", "text", n=13)
        contaminated = scored.where(2 * F.col("n_hit") >= F.col("n_grams"))
        decon = stage(
            "decontaminate",
            clean.join(
                contaminated.select("doc_id"), "doc_id", "left_anti"
            ).localCheckpoint(),
        )

        # r8: DSIR data selection — keep the 60% of surviving docs most
        # like the curated reference corpus (importance resampling over
        # hashed n-gram buckets; deterministic Gumbel-top-k)
        from bitfilters_spark.operators.dsir import dsir_select, fit_dsir

        n_decon = decon.count()
        dsir_model = fit_dsir(decon, docs, n_buckets=8192)
        decon = stage(
            "dsir_select",
            dsir_select(
                decon, dsir_model, max(1, int(n_decon * 0.6)), n_buckets=8192
            ).drop("log_weight").localCheckpoint(),
        )

        # TOKENIZER-DRIVEN packing: shard/sequence budgets use the REAL
        # encoder's token counts (vocabulary -> encode_documents), not the
        # whitespace heuristic — the same pluggable-weight contract a
        # production run would use with its trained tokenizer. The
        # whitespace count stays alongside to show the drift between the
        # two (a real BPE tokenizer inflates counts further).
        vocab = build_vocabulary(decon, "text", top_k=20_000)
        encoded = encode_documents(decon, "doc_id", "text", vocab)
        weighted = encoded.select("doc_id", "n_tokens", "n_oov")
        drift = (
            weighted.join(
                decon.select(
                    "doc_id", token_count(F.col("text")).alias("ws_tokens")
                ),
                "doc_id",
            )
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n_tokens").alias("enc"),
                F.sum("ws_tokens").alias("ws"),
                F.sum("n_oov").alias("oov"),
            )
            .collect()[0]
        )
        stages["encode"] = {
            "rows": drift["rows"],
            "vocab": vocab.count(),
            "encoder_tokens": int(drift["enc"]),
            "whitespace_tokens": int(drift["ws"]),
            "oov_tokens": int(drift["oov"]),
        }

        # r7: the tokenizer itself is now TRAINED in-engine — BPE merges
        # learned from the surviving corpus's word-frequency table; the
        # subword counts land between characters and words and show the
        # real budget inflation a production tokenizer produces.
        t0 = time.time()
        bpe = train_bpe(decon, "text", num_merges=500, top_words=50_000)
        bpe_counts = bpe_token_counts(decon, "doc_id", "text", bpe)
        bpe_total = bpe_counts.agg(F.sum("n_bpe_tokens")).collect()[0][0]
        stages["bpe"] = {
            "merges": len(bpe["merges"]),
            "vocab": len(bpe["vocab"]),
            "bpe_tokens": int(bpe_total),
            "s": round(time.time() - t0, 2),
        }
        seqs = pack_sequences(
            weighted.where(F.col("n_tokens") <= 512), "doc_id", "n_tokens", 512
        )
        stages["pack_sequences"] = {
            "rows": seqs.count(),
            "n_seqs": seqs.select("seq").distinct().count(),
        }
        packed = materialize_sequences(seqs, encoded, "doc_id", pad_to=512)
        pk = packed.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("tok"),
            F.avg(F.col("n_tokens") / 512).alias("fill"),
        ).collect()[0]
        stages["materialize"] = {
            "n_seqs": pk["n"],
            "tokens": int(pk["tok"]),
            "fill_frac": round(float(pk["fill"]), 3),
        }
        # shards hold PACKED SEQUENCES (what a trainer actually reads),
        # assigned by the two-phase distributed prefix sum over seq ids
        packed = packed.localCheckpoint()
        assigned = pack_shards(
            packed.select("seq", "n_tokens"), "seq", "n_tokens",
            shard_weight=20_000,
        )
        manifest = write_training_shards(
            assigned, packed, "seq", f"{tmp}/shards"
        )
        stages["shards"] = {
            "n_shards": len(manifest),
            "rows": sum(m["n_rows"] for m in manifest.values()),
            "tokens": sum(m["weight"] for m in manifest.values()),
        }
        out = {
            "sf_dir": sf_dir,
            "total_s": round(time.time() - t_all, 2),
            "stages": stages,
        }
        print(json.dumps(out, separators=(",", ":")))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
