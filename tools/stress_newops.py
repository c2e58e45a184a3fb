"""Stress the round-5 heavy operators past the test SFs: a 10x corpus
(50k docs — every sf0.1 document replicated 10x with per-copy token
remapping, so shingle structure is preserved but copies don't
cross-match; same methodology as the SURVEY dedup-family stress) drives
the persisted LSH index (build + incremental probe), sequence packing,
and a Z-order rewrite of lineitem. Prints one JSON line.

Usage: ``python tools/stress_newops.py [sf_dir]``.
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

    from bitfilters_spark.operators.neardup_index import (
        build_lsh_index,
        probe_lsh_index,
    )
    from bitfilters_spark.operators.packing import pack_sequences
    from bitfilters_spark.operators.text import token_count
    from bitfilters_spark.session import make_session
    from bitfilters_spark.sources.io import zorder_layout
    from bitfilters_spark.sources.skipping import build_zone_index, prune_files_range

    spark = make_session(app="stress-newops", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stress_newops_")
    out: dict = {"sf_dir": sf_dir, "copies": 10}
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n_base = docs.count()
        copies = spark.range(10).select(F.col("id").alias("copy"))
        stress = (
            docs.crossJoin(copies)
            .select(
                (F.col("doc_id") * 10 + F.col("copy")).alias("doc_id"),
                # suffix every token with the copy id: shingle structure
                # per copy is isomorphic to the original, but shingles
                # never match across copies
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit(r"$1_c"), F.col("copy").cast("string")),
                ).alias("text"),
            )
            .localCheckpoint()
        )
        out["n_docs"] = stress.count()

        spark.sql("DROP TABLE IF EXISTS stressix_bands")
        spark.sql("DROP TABLE IF EXISTS stressix_shingles")
        t0 = time.time()
        build_lsh_index(stress, "doc_id", "text", "stressix", path=f"{tmp}/ix")
        out["lsh_index_build_s"] = round(time.time() - t0, 2)

        probe = stress.where(F.col("doc_id") % 10 == 3)  # 10% "new crawl"
        t0 = time.time()
        out["probe_pairs"] = probe_lsh_index(
            spark, probe, "doc_id", "text", "stressix"
        ).count()
        out["lsh_probe_s"] = round(time.time() - t0, 2)

        toks = stress.select("doc_id", token_count(F.col("text")).alias("n"))
        toks = toks.where(F.col("n") <= 512)
        t0 = time.time()
        out["n_sequences"] = (
            pack_sequences(toks, "doc_id", "n", capacity=512)
            .select("seq")
            .distinct()
            .count()
        )
        out["pack_sequences_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        zorder_layout(
            spark,
            f"{sf_dir}/lineitem.parquet",
            f"{tmp}/zli",
            ["l_orderkey", "l_partkey"],
            target_file_bytes=4 * 1024 * 1024,
        )
        out["zorder_lineitem_s"] = round(time.time() - t0, 2)
        zi = build_zone_index(spark, f"{tmp}/zli", ["l_orderkey", "l_partkey"])
        nf = zi.count()
        kept = len(prune_files_range(zi, "l_partkey", 100, 300))
        out["zorder_files"] = nf
        out["zorder_partkey_range_keeps"] = kept

        # r7 heavy ops at the same 10x scale -----------------------------
        from bitfilters_spark.operators.bpe import bpe_token_counts, train_bpe
        from bitfilters_spark.operators.classifier import (
            classifier_score,
            train_text_classifier,
        )
        from bitfilters_spark.operators.fuzzy import fuzzy_join

        t0 = time.time()
        bpe = train_bpe(stress, "text", num_merges=500, top_words=100_000)
        out["bpe_train_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["bpe_tokens"] = int(
            bpe_token_counts(stress, "doc_id", "text", bpe)
            .agg(F.sum("n_bpe_tokens"))
            .collect()[0][0]
        )
        out["bpe_encode_s"] = round(time.time() - t0, 2)

        labeled = stress.withColumn(
            "label", (F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0).cast("int")
        )
        t0 = time.time()
        clf = train_text_classifier(
            labeled, "doc_id", "text", "label",
            n_buckets=1 << 16, iters=5, lr=3.0,
        )
        out["classifier_train5_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["classifier_scored"] = classifier_score(
            stress, "doc_id", "text", clf
        ).count()
        out["classifier_score_s"] = round(time.time() - t0, 2)

        # fuzzy join: 50k x 5k name-like keys at d=1
        names = stress.select(
            "doc_id",
            F.substring(F.col("text"), 1, 24).alias("name"),
        )
        probe_names = names.where(F.col("doc_id") % 10 == 3).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.substring("name", 1, 23), F.lit("x")).alias("name"),
        )
        t0 = time.time()
        out["fuzzy_pairs"] = fuzzy_join(
            probe_names, names, "name", "name", 1, "doc_id", "doc_id"
        ).count()
        out["fuzzy_join_s"] = round(time.time() - t0, 2)

        # r8: DSIR fit + Gumbel-top-k selection over the 10x corpus
        from bitfilters_spark.operators.dsir import dsir_select, fit_dsir

        target = stress.where(F.col("doc_id") % 23 == 0)
        t0 = time.time()
        model = fit_dsir(stress, target, n_buckets=8192)
        model.count()
        out["dsir_fit_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["dsir_selected"] = dsir_select(
            stress, model, 5000, n_buckets=8192
        ).count()
        out["dsir_select_s"] = round(time.time() - t0, 2)

        # r8: PQ over a 10x embedding store (per-copy noise so codes
        # differ), encode + ADC top-k for 50 queries
        from bitfilters_spark.operators.similarity import (
            pq_encode, pq_topk, train_pq,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        emb10 = (
            emb.crossJoin(copies)
            .select(
                (F.col("vec_id") * 10 + F.col("copy")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (F.col("copy") * (i + 1) % 7) / 100.0,
                ).alias("embedding"),
            )
            .localCheckpoint()
        )
        n_emb = emb10.count()
        t0 = time.time()
        pq = train_pq(emb10, m=8, n_codes=256)
        out["pq_train_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        codes = pq_encode(emb10, model=pq).localCheckpoint()
        out["pq_codes"] = codes.count()
        out["pq_encode_s"] = round(time.time() - t0, 2)
        queries = emb10.where(F.col("vec_id") % (n_emb // 50) == 1).limit(50)
        t0 = time.time()
        out["pq_topk_rows"] = pq_topk(codes, queries, pq, k=10).count()
        out["pq_topk_s"] = round(time.time() - t0, 2)

        # r8: exact per-key reservoir via the verified threshold
        # pre-filter on a low-cardinality key over the 10x corpus
        from bitfilters_spark.operators.sampling import (
            reservoir_sample_prefiltered,
        )

        keyed = stress.withColumn("key", F.pmod("doc_id", F.lit(5)))
        sc = (F.col("doc_id") * F.lit(2654435761)) % F.lit(1 << 32)
        t0 = time.time()
        out["reservoir_rows"] = reservoir_sample_prefiltered(
            keyed, "key", 100, "doc_id", order_by=sc, order_max=1 << 32
        ).count()
        out["reservoir_s"] = round(time.time() - t0, 2)

        # r9: ribbon filter at the 10x orders table (~1.5M keys) — the
        # SHARDED build path (the documented route past ~1M keys; r10's
        # round-vectorized elimination + plane-window backsolve cut the
        # per-shard kernel ~2.5x, so 32 hash-prefix shards build in
        # parallel at ~0.3s each)
        from bitfilters_spark.functions import build_filter, probe_filter
        from bitfilters_spark.functions.hashing import spark_hash64

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        okeys = (
            orders.crossJoin(copies)
            .select(
                (F.col("o_orderkey") * 10 + F.col("copy")).alias("k")
            )
            .select(spark_hash64("k").alias("h"))
            .localCheckpoint()
        )
        t0 = time.time()
        rib = build_filter(okeys, [], "h", "ribbon8", num_shards=32)
        rib_blob = bytes(rib.collect()[0]["filter"])
        out["ribbon_build_s"] = round(time.time() - t0, 2)
        out["ribbon_bytes_per_key"] = round(
            len(rib_blob) / okeys.distinct().count(), 3
        )
        t0 = time.time()
        hits = (
            probe_filter(okeys, rib, "h").where(F.col("__contains")).count()
        )
        out["ribbon_probe_s"] = round(time.time() - t0, 2)
        assert hits == okeys.count(), "ribbon false negative at stress"

        # r11: extract_links over a 10x synthetic crawl (every stress doc
        # wrapped in HTML with 3 outlinks: absolute cross-host, relative
        # self, and a dead comment link) + host pagerank over the edges —
        # the closed crawl loop at 50k pages / 100k live links
        from bitfilters_spark.operators.graph import pagerank
        from bitfilters_spark.operators.web import extract_links

        pages = stress.select(
            F.concat(
                F.lit("http://h"), (F.col("doc_id") % 199).cast("string"),
                F.lit(".test/p/"), F.col("doc_id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit('<html><body><!-- <a href="http://dead.test/x">d</a> -->'),
                F.lit('<a href="http://h'),
                ((F.col("doc_id") + 7) % 199).cast("string"),
                F.lit('.test/p.html">x</a><a href="rel/'),
                F.col("doc_id").cast("string"),
                F.lit('.html">r</a><p>'),
                F.substring("text", 1, 200),
                F.lit("</p></body></html>"),
            ).alias("html"),
        ).repartition(32)
        t0 = time.time()
        links = extract_links(pages, "html", "url").select(
            "src_host", "dst_host"
        ).localCheckpoint()
        out["extract_links_rows"] = links.count()
        out["extract_links_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        pr = pagerank(
            links.where(F.col("src_host") != F.col("dst_host")).select(
                F.xxhash64("src_host").alias("s"), F.xxhash64("dst_host").alias("d")
            ),
            "s", "d", iters=3,
        )
        out["host_pagerank_nodes"] = pr.count()
        out["host_pagerank_s"] = round(time.time() - t0, 2)

        # r11: BM25 index lifecycle at stress — build on 80%, append 20%
        # in two folds, compact; file count must collapse and the probe
        # stays live throughout
        from bitfilters_spark.operators.bm25_index import (
            BM25Probe,
            append_to_bm25_index,
            build_bm25_index,
            compact_bm25_index,
        )

        base80 = stress.where(F.col("doc_id") % 5 != 0)
        t0 = time.time()
        build_bm25_index(
            base80, "doc_id", "text", "stress_bm25", num_buckets=16,
            path=f"{tmp}/bm25",
        )
        out["bm25_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        for m in (0, 5):
            append_to_bm25_index(
                stress.where(F.col("doc_id") % 10 == m), "doc_id", "text",
                "stress_bm25", num_buckets=16,
            )
        out["bm25_append_s"] = round(time.time() - t0, 2)
        qset = stress.limit(3).select(
            F.col("doc_id").alias("query_id"),
            F.substring_index("text", " ", 6).alias("query"),
        ).localCheckpoint()
        probe_h = BM25Probe(spark, "stress_bm25")
        pre = probe_h.query(qset).count()
        t0 = time.time()
        comp = compact_bm25_index(spark, "stress_bm25", path=f"{tmp}/bm25")
        out["bm25_compact_s"] = round(time.time() - t0, 2)
        out["bm25_files_before"] = comp["files_before"]
        out["bm25_files_after"] = comp["files_after"]
        post = BM25Probe(spark, "stress_bm25").query(qset).count()
        assert pre == post, "compaction changed probe results"
        out["bm25_probe_rows"] = post

        # r11 tail: KN LM train+score+bucket over the full 50k stress
        # corpus, HITS + anchor corpus + weighted fetch budgets over the
        # stress link graph — the quality/authority signals at 10x
        from bitfilters_spark.operators.graph import hits
        from bitfilters_spark.operators.lm import (
            kn_score,
            perplexity_buckets,
            train_kn_lm,
        )
        from bitfilters_spark.operators.sampling import allocate_weighted_budget
        from bitfilters_spark.operators.web import anchor_text_corpus

        t0 = time.time()
        knlm = train_kn_lm(stress, "text", vocab_size=1 << 16)
        out["kn_train_s"] = round(time.time() - t0, 2)
        out["kn_bigram_types"] = knlm["n_bigram_types"]
        t0 = time.time()
        scored = kn_score(stress, "doc_id", "text", knlm).localCheckpoint()
        out["kn_scored"] = scored.count()
        out["kn_score_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["kn_head_docs"] = (
            perplexity_buckets(scored, "ppl")
            .where(F.col("bucket") == "head")
            .count()
        )
        out["kn_bucket_s"] = round(time.time() - t0, 2)

        edges_h = links.select(
            F.xxhash64("src_host").alias("s"), F.xxhash64("dst_host").alias("d")
        ).where(F.col("s") != F.col("d"))
        t0 = time.time()
        hubs = hits(edges_h, "s", "d", iters=4).localCheckpoint()
        out["hits_nodes"] = hubs.count()
        out["hits_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        full_links = extract_links(pages, "html", "url").localCheckpoint()
        corpus = anchor_text_corpus(full_links).localCheckpoint()
        out["anchor_corpus_rows"] = corpus.count()
        out["anchor_corpus_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        host_queues = full_links.groupBy(
            F.xxhash64("dst_host").alias("node")
        ).agg(F.countDistinct("dst_url").alias("n_urls"))
        alloc = allocate_weighted_budget(
            host_queues.join(
                hubs.select("node", F.col("authority").alias("w")), "node"
            ),
            "node", "n_urls", "w", budget=10000.0,
        )
        out["budget_hosts"] = alloc.count()
        out["budget_alloc_s"] = round(time.time() - t0, 2)

        # r11 tail 2: trigram KN at 10x, phrase-index lifecycle at 10x,
        # chat render/spans over conversations fabricated from the
        # stress corpus
        from bitfilters_spark.operators.chat import (
            assistant_token_spans,
            render_chat,
        )
        from bitfilters_spark.operators.lm import kn3_score, train_kn3_lm
        from bitfilters_spark.operators.phrase_index import (
            build_phrase_index,
            phrase_search,
        )

        t0 = time.time()
        kn3 = train_kn3_lm(stress, "text", vocab_size=1 << 16)
        out["kn3_train_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["kn3_scored"] = kn3_score(stress, "doc_id", "text", kn3).count()
        out["kn3_score_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        build_phrase_index(
            stress, "doc_id", "text", "stress_phrase", num_buckets=16,
            path=f"{tmp}/phrase",
        )
        out["phrase_build_s"] = round(time.time() - t0, 2)
        ph = stress.limit(50).select(
            F.col("doc_id").alias("phrase_id"),
            F.substring_index("text", " ", 5).alias("phrase"),
        ).localCheckpoint()
        t0 = time.time()
        out["phrase_hits"] = phrase_search(spark, "stress_phrase", ph).count()
        out["phrase_probe_s"] = round(time.time() - t0, 2)

        convs = stress.select(
            F.col("doc_id").alias("conv_id"),
            F.array(
                F.struct(
                    F.lit("user").alias("role"),
                    F.substring_index("text", " ", 10).alias("content"),
                ),
                F.struct(
                    F.lit("assistant").alias("role"),
                    F.substring_index("text", " ", 40).alias("content"),
                ),
            ).alias("messages"),
        )
        t0 = time.time()
        out["chat_spans"] = (
            assistant_token_spans(render_chat(convs))
            .select(F.explode("spans"))
            .count()
        )
        out["chat_render_s"] = round(time.time() - t0, 2)

        from bitfilters_spark.operators.unigram import (
            train_unigram,
            unigram_token_counts,
        )

        t0 = time.time()
        uni_m = train_unigram(
            stress, "text", vocab_size=4000, seed_size=40000,
            max_piece_len=8, em_rounds=2,
        )
        out["unigram_vocab"] = len(uni_m["pieces"])
        out["unigram_train_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["unigram_encoded"] = unigram_token_counts(
            stress, "doc_id", "text", uni_m
        ).count()
        out["unigram_encode_s"] = round(time.time() - t0, 2)

        # r12: filter-prefiltered decontamination at stress — benchmark =
        # the copy-0 slice (5k docs), corpus = all 50k; xor16 blob probes
        # map-side; verify path re-checks only flagged grams
        from bitfilters_spark.operators.text import filter_contamination

        bench = docs.limit(500)
        t0 = time.time()
        fc = filter_contamination(
            stress, bench, n=5, kind="xor16"
        ).localCheckpoint(eager=False)
        out["fcontam_docs"] = fc.count()
        out["fcontam_flagged_docs"] = fc.where(F.col("n_flagged") > 0).count()
        out["fcontam_s"] = round(time.time() - t0, 2)

        # r12: hits_exact on the 10x crawl's host graph (integer power
        # iteration + one division — the gate leg's operator at stress)
        from bitfilters_spark.operators.graph import hits_exact

        t0 = time.time()
        he = hits_exact(
            links.where(F.col("src_host") != F.col("dst_host")).select(
                F.xxhash64("src_host").alias("s"),
                F.xxhash64("dst_host").alias("d"),
            ),
            "s", "d", iters=3,
        )
        out["hits_exact_nodes"] = he.count()
        out["hits_exact_s"] = round(time.time() - t0, 2)

        # r12: KN impact pruning — same corpus, bi table cut 10x by
        # weighted impact; scoring still runs (quality trade measured)
        from bitfilters_spark.operators.lm import kn_score as _kns

        t0 = time.time()
        pruned = train_kn_lm(
            stress, "text", prune_to=max(knlm["n_bigram_types"] // 10, 1)
        )
        out["kn_pruned_bi_rows"] = pruned["bi"].count()
        out["kn_prune_train_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["kn_pruned_scored"] = _kns(
            stress, "doc_id", "text", pruned
        ).count()
        out["kn_pruned_score_s"] = round(time.time() - t0, 2)

        # r12: span corruption over the full 10x corpus (stateless JVM
        # expressions — scan-speed is the claim being measured)
        from bitfilters_spark.operators.text import span_corruption

        t0 = time.time()
        sc = span_corruption(stress, "doc_id", "text")
        out["span_corruption_masked"] = int(
            sc.agg(F.sum("n_masked")).collect()[0][0] or 0
        )
        out["span_corruption_s"] = round(time.time() - t0, 2)

        # r12: preference prep at 10x — every stress doc becomes a pair
        from bitfilters_spark.operators.preference import (
            dedup_preference_pairs,
            length_bias_report,
        )

        t0 = time.time()
        prefs = stress.select(
            F.col("doc_id").alias("pair_id"),
            F.substring("text", 1, 80).alias("prompt"),
            F.substring("text", 81, 400).alias("chosen"),
            F.reverse(F.substring("text", 81, 300)).alias("rejected"),
        )
        out["pref_report"] = length_bias_report(prefs).collect()[0]["n_ok"]
        out["pref_deduped"] = dedup_preference_pairs(prefs, "pair_id").count()
        out["pref_s"] = round(time.time() - t0, 2)

        # r13: LCS decontamination at 10x — diagonal islands over the
        # gram-position join; bench = 500 base docs (grams match only
        # the copy-suffix-matched slice, the designed sparsity)
        from bitfilters_spark.operators.text import lcs_contamination

        t0 = time.time()
        out["lcs_pairs"] = lcs_contamination(
            stress, stress.limit(500), min_lcs=8
        ).count()
        out["lcs_s"] = round(time.time() - t0, 2)

        # r13: CDC chunking + dup report at 10x (row-local chunking,
        # one hash-keyed election; the 10 copies share no chunks by
        # construction — the suffixing breaks byte identity — so this
        # measures the full-corpus chunk+aggregate cost)
        from bitfilters_spark.operators.cdc import cdc_dup_report

        t0 = time.time()
        rep = cdc_dup_report(stress, "doc_id", "text").agg(
            F.sum("n_chunks"), F.sum("n_dup_chunks")
        ).collect()[0]
        out["cdc_chunks"] = int(rep[0] or 0)
        out["cdc_dup_chunks"] = int(rep[1] or 0)
        out["cdc_s"] = round(time.time() - t0, 2)

        # r13: binary-signature Hamming ANN over the 10x-replicated
        # embedding store (popcount scan is the claim being measured)
        from bitfilters_spark.operators.similarity import hamming_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        emb10 = (
            emb.crossJoin(copies)
            .select(
                (F.col("vec_id") * 10 + F.col("copy")).alias("vec_id"),
                "embedding",
            )
            .localCheckpoint()
        )
        out["n_vecs"] = emb10.count()
        t0 = time.time()
        out["hamming_rows"] = hamming_topk(
            emb10, emb10.where(F.col("vec_id") < 20), k=10
        ).count()
        out["hamming_s"] = round(time.time() - t0, 2)

        # r13: IVFPQ build + probe at 10x (codes table holds m bytes
        # per vector; probe = exact cell term + ADC)
        from bitfilters_spark.operators.ann_index import (
            build_ivfpq_index,
            ivfpq_query_index,
        )

        for s in ("cells", "centroids", "codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS stress_ivfpq_{s}")
        t0 = time.time()
        build_ivfpq_index(
            emb10, "vec_id", "embedding", "stress_ivfpq",
            n_centroids=64, m=8, n_codes=256, num_buckets=16,
            path=f"{tmp}/ivfpq",
        )
        out["ivfpq_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["ivfpq_probe_rows"] = ivfpq_query_index(
            spark, "stress_ivfpq", emb10.where(F.col("vec_id") < 20),
            "vec_id", "embedding", k=10, nprobe=8,
        ).count()
        out["ivfpq_probe_s"] = round(time.time() - t0, 2)

        # r14: two-stage Hamming -> cosine re-rank at 10x (coarse
        # popcount scan + bounded float re-fetch)
        from bitfilters_spark.operators.similarity import (
            hamming_rerank_topk,
        )

        t0 = time.time()
        out["rerank_rows"] = hamming_rerank_topk(
            emb10, emb10.where(F.col("vec_id") < 20), k=10, overfetch=4
        ).count()
        out["rerank_s"] = round(time.time() - t0, 2)

        # r14: persisted CDC chunk-hash index — build on 90% of the
        # stress corpus, probe the remaining 10% "re-crawl" against it
        from bitfilters_spark.operators.cdc import (
            build_cdc_index,
            probe_cdc_index,
        )

        spark.sql("DROP TABLE IF EXISTS stress_cdcix_chunks")
        ref = stress.where(F.col("doc_id") % 10 != 3)
        newc = stress.where(F.col("doc_id") % 10 == 3)
        t0 = time.time()
        build_cdc_index(
            ref, "doc_id", "text", "stress_cdcix", num_buckets=16,
            path=f"{tmp}/cdcix",
        )
        out["cdc_index_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        rep = probe_cdc_index(
            spark, newc, "doc_id", "text", "stress_cdcix"
        ).agg(F.sum("n_chunks"), F.sum("ref_dup_chunks")).collect()[0]
        out["cdc_probe_chunks"] = int(rep[0] or 0)
        out["cdc_probe_dups"] = int(rep[1] or 0)
        out["cdc_probe_s"] = round(time.time() - t0, 2)

        # r14: persisted signature index probe (coarse + re-ranked)
        from bitfilters_spark.operators.ann_index import (
            build_sig_index,
            sig_query_index,
        )

        spark.sql("DROP TABLE IF EXISTS stress_sig_sigs")
        t0 = time.time()
        build_sig_index(
            emb10, "vec_id", "embedding", "stress_sig", num_buckets=16,
            path=f"{tmp}/sig",
        )
        out["sig_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["sig_probe_rows"] = sig_query_index(
            spark, "stress_sig", emb10.where(F.col("vec_id") < 20),
            k=10, rerank_overfetch=4,
        ).count()
        out["sig_probe_s"] = round(time.time() - t0, 2)

        # r14: b-bit minhash signatures + estimator over LSH candidates
        from bitfilters_spark.operators.dedup import (
            bbit_jaccard_estimate,
            bbit_minhash_signatures,
        )

        t0 = time.time()
        bsigs = bbit_minhash_signatures(
            stress, "doc_id", "text", k=128, b=1
        ).select(F.col("doc_id").alias("id"), "bsig").localCheckpoint()
        out["bbit_sig_rows"] = bsigs.count()
        out["bbit_sig_s"] = round(time.time() - t0, 2)
        cand = stress.select((F.col("doc_id")).alias("id_a")).where(
            F.col("id_a") % 10 == 0
        ).withColumn("id_b", F.col("id_a") + 1)
        t0 = time.time()
        out["bbit_est_rows"] = bbit_jaccard_estimate(
            cand, bsigs, k=128, b=1
        ).count()
        out["bbit_est_s"] = round(time.time() - t0, 2)
        # r14: NN-Descent kNN graph + mutual-kNN sweep over the 10x
        # embedding store (the all-pairs-k claim being measured)
        from bitfilters_spark.operators.clustering import mutual_knn_clusters
        from bitfilters_spark.operators.similarity import nn_descent_graph

        t0 = time.time()
        g = nn_descent_graph(
            emb10, "vec_id", "embedding", k=8, iters=2, seed=7
        ).localCheckpoint()
        out["nnd_edges"] = g.count()
        out["nnd_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["mutual_clusters"] = (
            mutual_knn_clusters(g, threshold=0.5)
            .select("component")
            .distinct()
            .count()
        )
        out["mutual_s"] = round(time.time() - t0, 2)

        # r14: triangle/LPA/trustrank over a ~200k-edge host-style graph
        from bitfilters_spark.operators.graph import (
            label_propagation,
            triangle_counts,
            trustrank,
        )

        gedges = (
            spark.range(200_000)
            .select(
                F.pmod(F.xxhash64("id"), F.lit(20_000)).alias("src"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(20_000)).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .localCheckpoint()
        )
        t0 = time.time()
        tric = triangle_counts(gedges, "src", "dst")
        out["tri_closed"] = int(tric.agg(F.sum("triangles")).first()[0] or 0)
        out["tri_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["lpa_comms"] = (
            label_propagation(gedges, "src", "dst", iters=3)
            .select("label")
            .distinct()
            .count()
        )
        out["lpa_s"] = round(time.time() - t0, 2)
        seeds = spark.createDataFrame([(0,)], "node long")
        t0 = time.time()
        out["trust_pos"] = (
            trustrank(gedges, "src", "dst", seeds, iters=3)
            .where(F.col("trust") > 0)
            .count()
        )
        out["trust_s"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
