"""Weighted sampling, compression signal, corpus checksum."""

import zlib

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.dedup import corpus_checksum
from bitfilters_spark.operators.sampling import weighted_hash_sample
from bitfilters_spark.operators.text import compression_signal


def test_weighted_sample_rates_and_monotonicity(spark):
    df = spark.range(20_000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 0.8).otherwise(0.2).alias("w"),
    )
    kept = weighted_hash_sample(df, "id", "w")
    rates = {
        r["k"]: r["n"] / 10_000
        for r in kept.groupBy((F.col("id") % 2).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert abs(rates[0] - 0.8) < 0.03 and abs(rates[1] - 0.2) < 0.03
    # monotone in the weight: everything kept at w stays kept at w' > w
    ids_low = {r["id"] for r in weighted_hash_sample(
        df.withColumn("w", F.lit(0.2)), "id", "w").collect()}
    ids_high = {r["id"] for r in weighted_hash_sample(
        df.withColumn("w", F.lit(0.5)), "id", "w").collect()}
    assert ids_low <= ids_high
    # deterministic under repartitioning
    again = {r["id"] for r in weighted_hash_sample(
        df.repartition(13), "id", "w").collect()}
    assert again == {r["id"] for r in kept.collect()}


def test_weighted_sample_clamps_and_drops_null(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, -1.0), (3, None)], "id long, w double"
    )
    got = {r["id"] for r in weighted_hash_sample(df, "id", "w").collect()}
    assert 1 in got and 2 not in got and 3 not in got  # clamp / drop


def test_compression_signal_matches_local_zlib(spark):
    docs = [
        (1, "abc " * 200),            # highly compressible
        (2, "k9!x Qz7# mN2$ vB5%"),   # short, little structure
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"])
        for r in compression_signal(df, "doc_id", "text").collect()
    }
    for doc_id, text in docs:
        if text is None:
            assert got[doc_id] == (None, None)
        else:
            assert got[doc_id] == (
                len(text),
                len(zlib.compress(text.encode(), 6)),
            )
    # the boilerplate doc compresses far better
    assert got[1][1] / got[1][0] < 0.1 < got[2][1] / got[2][0]


def test_corpus_checksum_is_order_and_partitioning_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = corpus_checksum(docs, ["source"], ["doc_id", "text"]).collect()
    b = corpus_checksum(
        docs.repartition(17).sortWithinPartitions("n_chars"),
        ["source"],
        ["doc_id", "text"],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a single changed row flips the group checksum and only that group
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.lit("TAMPERED")).otherwise(F.col("text")),
    )
    c = {r["source"]: r["checksum"] for r in corpus_checksum(
        mutated, ["source"], ["doc_id", "text"]).collect()}
    orig = {r["source"]: r["checksum"] for r in a}
    src3 = docs.where("doc_id = 3").collect()[0]["source"]
    diff = {s for s in orig if orig[s] != c[s]}
    assert diff == {src3}
    # global (ungrouped) checksum: one row
    g = corpus_checksum(docs, [], ["doc_id", "text"]).collect()
    assert len(g) == 1 and g[0]["n_rows"] == docs.count()


def test_corpus_checksum_duckdb_parity(spark):
    """bit_xor over the same hash is engine-reproducible given hash
    parity; use DuckDB-parity hashes so the oracle agrees bit-for-bit."""
    import duckdb

    from bitfilters_spark.functions.hashing import duckdb_hash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    keyed = docs.select(
        "source", duckdb_hash("v1.0.0", "doc_id").alias("__h")
    )
    got = {
        (r["source"],): (r["checksum"], r["n_rows"])
        for r in keyed.groupBy("source")
        .agg(
            F.expr("bit_xor(__h)").alias("checksum"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    con = duckdb.connect()
    want = {
        (s,): (chk, n)
        for s, chk, n in con.sql(
            "SELECT source, (bit_xor(hash(doc_id))::HUGEINT - CASE WHEN "
            "bit_xor(hash(doc_id)) >= 9223372036854775808 THEN "
            "18446744073709551616::HUGEINT ELSE 0::HUGEINT END)::BIGINT, count(*) "
            "FROM '/root/testdata/sf0.001/documents.parquet' GROUP BY source"
        ).fetchall()
    }
    assert got == want


# ----------------------------------------------------------- lm score ---


def test_lm_score_hand_computed_probability(spark):
    """Tiny corpus with hand-derivable counts: the interpolated bigram
    probability must match exactly."""
    import math

    from bitfilters_spark.operators.text import lm_score, train_ngram_lm

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm = train_ngram_lm(train, "text")
    assert lm["n_tokens"] == 7  # a:3 b:3 c:1
    probe = spark.createDataFrame([(10, "a b")], "doc_id long, text string")
    row = lm_score(probe, "doc_id", "text", lm).collect()[0]
    assert row["n_scored"] == 1
    # P = 0.7 * c(ab)/c(a) + 0.3 * c(b)/N = 0.7 * 3/3 + 0.3 * 3/7
    want = math.log(0.7 * 3 / 3 + 0.3 * 3 / 7)
    assert abs(row["avg_logp"] - want) < 1e-12


def test_lm_score_separates_in_domain_from_noise(spark):
    from bitfilters_spark.operators.text import lm_score, train_ngram_lm

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    train = spark.createDataFrame(
        [(i, base) for i in range(20)], "doc_id long, text string"
    )
    lm = train_ngram_lm(train, "text")
    probe = spark.createDataFrame(
        [
            (1, base),  # in-domain
            (2, "dog the bank fox river quick near lazy the brown"),  # shuffled
            (3, "zq wv xk pj qqq unseen gibberish tokens entirely zz"),  # OOV
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["avg_logp"] for r in lm_score(probe, "doc_id", "text", lm).collect()}
    assert got[1] > got[2] > got[3]
    # OOV text bottoms out at the floor probability
    import math

    assert abs(got[3] - math.log(1.0 / (10.0 * lm["n_tokens"]))) < 1e-9


def test_lm_score_repartition_invariant(spark):
    from bitfilters_spark.operators.text import lm_score, train_ngram_lm

    docs = spark.createDataFrame(
        [(i, f"token{i % 7} token{(i + 1) % 7} token{(i + 2) % 7}") for i in range(200)],
        "doc_id long, text string",
    )
    lm = train_ngram_lm(docs, "text")
    a = {r["doc_id"]: r["avg_logp"] for r in lm_score(docs, "doc_id", "text", lm).collect()}
    b = {
        r["doc_id"]: r["avg_logp"]
        for r in lm_score(docs.repartition(13), "doc_id", "text", lm).collect()
    }
    assert a == b


# -------------------------------------------------------------- drift ---


def test_drift_report_detects_shift_and_stability(spark):
    import pytest as _pytest

    from bitfilters_spark.operators.text import drift_report

    a = spark.range(10_000).select(
        (F.col("id") % 100).alias("len"), (F.col("id") % 7).alias("q")
    )
    same = drift_report(a, a, ["len", "q"])
    assert same["len"]["psi"] == 0.0 and same["q"]["psi"] == 0.0
    assert same["len"]["n_a"] == same["len"]["n_b"] == 10_000

    shifted = spark.range(10_000).select(
        ((F.col("id") % 100) + 80).alias("len"), (F.col("id") % 7).alias("q")
    )
    rep = drift_report(a, shifted, ["len", "q"])
    assert rep["len"]["psi"] > 0.25  # major shift on len...
    assert rep["q"]["psi"] < 0.01  # ...none on q
    # out-of-range B mass clamps into the top bucket rather than vanishing
    assert rep["len"]["n_b"] == 10_000


def test_drift_report_constant_and_null_columns(spark):
    from bitfilters_spark.operators.text import drift_report

    a = spark.createDataFrame([(1, 5), (2, 5)], "id long, c long")
    b_same = spark.createDataFrame([(3, 5)], "id long, c long")
    b_diff = spark.createDataFrame([(4, 9)], "id long, c long")
    assert drift_report(a, b_same, ["c"])["c"]["psi"] == 0.0
    assert drift_report(a, b_diff, ["c"])["c"]["psi"] == float("inf")


def test_bm25_scores_match_python_reference(spark):
    """BM25 (#128) equals a transparent pure-python computation to 1e-9:
    idf = ln(1 + (N - df + .5)/(df + .5)) rounded to the 6-decimal oracle contract, query terms deduplicated,
    zero-overlap (query, doc) rows not materialized."""
    import math

    from bitfilters_spark.operators.text import bm25_scores

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "cherry durian elderberry fig"),
        (4, "grape melon kiwi"),
    ]
    queries = [(100, "apple banana banana"), (200, "fig")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, query string")
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(ddf, qdf, "doc_id").collect()
    }

    k1, b = 1.2, 0.75
    toks = {d: t.split() for d, t in docs}
    N = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / N
    want = {}
    for qid, qtext in queries:
        for d, t in toks.items():
            s = 0.0
            for term in sorted(set(qtext.split())):
                tf = t.count(term)
                if tf == 0:
                    continue
                df = sum(term in set(tt) for tt in toks.values())
                idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
                s += idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl)))
            if s > 0:
                want[(qid, d)] = s
    assert set(got) == set(want), "zero-overlap rows must not appear"
    for key, v in want.items():
        # the operator rounds to 6 decimals (oracle-parity contract)
        assert got[key] == round(v, 6), (key, got[key], v)


def test_bm25_index_probe_equals_direct_scores(spark, tmp_path):
    """Persisted BM25 index (#130): bm25_query_index over a built index
    returns EXACTLY bm25_scores on the same corpus (shared contribution
    expression => bit-identical floats), and the query-term In-filter is
    pushed into the postings scan."""
    import contextlib
    import io as _io

    from bitfilters_spark.operators.bm25_index import (
        bm25_query_index,
        build_bm25_index,
    )
    from bitfilters_spark.operators.text import bm25_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = docs.where(F.col("doc_id").isin(0, 5, 10)).select(
        F.col("doc_id").alias("query_id"),
        F.substring_index("text", " ", 8).alias("query"),
    )
    for s in ("postings", "vocab", "stats"):
        spark.sql(f"DROP TABLE IF EXISTS bm25ix_{s}")
    stats = build_bm25_index(
        docs, "doc_id", "text", "bm25ix", num_buckets=8, path=str(tmp_path)
    )
    assert stats["n_docs"] == docs.count()

    via_index = bm25_query_index(spark, "bm25ix", queries)
    direct = bm25_scores(docs, queries, "doc_id")
    a = {(r["query_id"], r["id"]): r["score"] for r in via_index.collect()}
    d = {(r["query_id"], r["doc_id"]): r["score"] for r in direct.collect()}
    assert a == d and len(a) > 0

    # the scan must carry the pushed In filter on token
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        via_index.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "In(token" in plan


def test_bm25_index_append_equals_rebuild(spark, tmp_path):
    """Incremental maintenance (#130): building on half the corpus then
    appending the other half probes EXACTLY like a from-scratch rebuild
    over the union — postings/vocab/stats are all additive, so the
    scores are bit-identical, not approximate."""
    from bitfilters_spark.operators.bm25_index import (
        append_to_bm25_index,
        bm25_index_stats,
        bm25_query_index,
        build_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    queries = docs.where(F.col("doc_id").isin(0, 5, 10)).select(
        F.col("doc_id").alias("query_id"),
        F.substring_index("text", " ", 8).alias("query"),
    )
    build_bm25_index(
        old, "doc_id", "text", "bm25app", num_buckets=8,
        path=str(tmp_path / "app"),
    )
    append_to_bm25_index(new, "doc_id", "text", "bm25app", num_buckets=8)
    build_bm25_index(
        docs, "doc_id", "text", "bm25full", num_buckets=8,
        path=str(tmp_path / "full"),
    )
    a = {
        (r["query_id"], r["id"]): r["score"]
        for r in bm25_query_index(spark, "bm25app", queries).collect()
    }
    b = {
        (r["query_id"], r["id"]): r["score"]
        for r in bm25_query_index(spark, "bm25full", queries).collect()
    }
    assert a == b and len(a) > 0
    sa = bm25_index_stats(spark, "bm25app")
    sb = bm25_index_stats(spark, "bm25full")
    assert sa == sb and sa["n_docs"] == docs.count()


def test_bm25_index_guards(spark, tmp_path):
    """Name validation (SQL-injection guard) and geometry stamping: an
    append with a mismatched bucket count must fail loudly instead of
    silently landing rows in the wrong buckets."""
    from bitfilters_spark.operators.bm25_index import (
        append_to_bm25_index,
        build_bm25_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    with pytest.raises(ValueError, match="identifier"):
        build_bm25_index(docs, "doc_id", "text", "bad name; DROP TABLE x")
    build_bm25_index(
        docs, "doc_id", "text", "bm25geo", num_buckets=4,
        path=str(tmp_path / "geo"),
    )
    with pytest.raises(ValueError, match="num_buckets"):
        append_to_bm25_index(docs, "doc_id", "text", "bm25geo", num_buckets=8)
