"""Vocabulary building + token encoding: the dataloader-side bridge
from cleaned text to packed training sequences."""



def test_build_vocabulary_feeds_encoder(spark):
    """build_vocabulary -> encode_documents round trip: ranks are dense,
    ordered by count (ties on token), and the encoder's n_tokens equals
    the document token count with zero OOV when the vocab covers all."""
    from bitfilters_spark.operators.text import build_vocabulary, encode_documents

    df = spark.createDataFrame(
        [(1, "b a a c"), (2, "a b b")], "doc_id long, text string"
    )
    vocab = build_vocabulary(df, "text", top_k=10, id_col="doc_id")
    rows = {r["token"]: (r["n"], r["df"], r["rank"]) for r in vocab.collect()}
    # a and b tie at n=3 — the token tie-break makes ranks deterministic
    assert rows == {"a": (3, 2, 1), "b": (3, 2, 2), "c": (1, 1, 3)}
    enc = {r["doc_id"]: r for r in encode_documents(df, "doc_id", "text", vocab).collect()}
    assert enc[1]["token_ids"] == [2, 1, 1, 3] and enc[1]["n_oov"] == 0
    assert enc[2]["token_ids"] == [1, 2, 2] and enc[2]["n_tokens"] == 3
    # top_k cut: vocabulary bounded, cut tokens encode as OOV
    small = build_vocabulary(df, "text", top_k=2)
    assert small.count() == 2
    enc1 = encode_documents(df, "doc_id", "text", small).where("doc_id = 1").collect()[0]
    assert enc1["token_ids"] == [2, 1, 1, 0] and enc1["n_oov"] == 1


def test_langid_table_matches_expression_form(spark):
    """The codegen scale path must produce IDENTICAL labels and stopword
    counts to the langid()/stopword_hits() expression form — including
    ties, the CJK rule, and empty documents."""
    from bitfilters_spark.operators.text import (
        STOPWORDS,
        langid,
        langid_table,
        stopword_hits,
    )

    rows = [
        (1, "the cat and the dog of the house"),          # en
        (2, "der hund und die katze und das haus"),       # de
        (3, "le chat et le chien dans la maison"),        # fr
        (4, "el gato y el perro en la casa"),             # es
        (5, "中文文本内容很多"),  # zh via non-ascii
        (6, "no stopwords whatsoever here"),              # en fallback
        (7, ""),                                          # empty doc
        (8, "und the und the"),                           # exact tie -> en order
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr_form = {
        r["doc_id"]: (r["lang"], r["sw_en"], r["sw_de"])
        for r in df.select(
            "doc_id",
            langid("text").alias("lang"),
            stopword_hits("text", "en").alias("sw_en"),
            stopword_hits("text", "de").alias("sw_de"),
        ).collect()
    }
    table_form = {
        r["doc_id"]: (r["lang"], r["sw_en"], r["sw_de"])
        for r in langid_table(df, "doc_id", "text").collect()
    }
    assert table_form == expr_form
    assert expr_form[2][0] == "de" and expr_form[5][0] == "zh"
    assert expr_form[8][0] == "en"  # tie keeps the deterministic order
    # output keeps every input row and column
    out = langid_table(df, "doc_id", "text")
    assert out.count() == len(rows)
    assert set(df.columns) <= set(out.columns)
    assert {f"sw_{lg}" for lg in STOPWORDS} <= set(out.columns)


def test_split_sentences_boundaries_and_abbreviations(spark):
    from bitfilters_spark.operators.text import split_sentences

    df = spark.createDataFrame(
        [
            (0, "First sentence. Second one! Third? (Fourth.)"),
            (1, "Dr. Smith met Mr. Jones. They talked."),
            (2, "Version 2.0 shipped today. It works."),
            (3, "single sentence no terminal"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["s"] for r in df.select("id", split_sentences("text").alias("s")).collect()}
    assert got[0] == ["First sentence.", "Second one!", "Third?", "(Fourth.)"]
    assert got[1] == ["Dr. Smith met Mr. Jones.", "They talked."]
    assert got[2] == ["Version 2.0 shipped today.", "It works."]
    assert got[3] == ["single sentence no terminal"]


def test_dedup_sentences_keeps_first_occurrence(spark):
    from bitfilters_spark.operators.text import dedup_sentences

    rows = [
        (0, "Shared opener here. Unique body zero."),
        (1, "Shared opener here. Unique body one."),
        (2, "Totally different. Shared opener here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in dedup_sentences(df, "doc_id", "text").collect()}
    assert got[0] == "Shared opener here. Unique body zero."
    assert got[1] == "Unique body one."
    assert got[2] == "Totally different."


def test_dedup_sentences_min_chars_bypass(spark):
    from bitfilters_spark.operators.text import dedup_sentences

    rows = [(0, "Yes. Long enough sentence here."), (1, "Yes. Another long sentence body.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in
           dedup_sentences(df, "doc_id", "text", min_chars=10).collect()}
    # "Yes." is under min_chars: survives in BOTH docs
    assert got[0].startswith("Yes.") and got[1].startswith("Yes.")


def test_nfkc_normalize_folds_compatibility_forms(spark):
    from bitfilters_spark.operators.text import nfkc_normalize

    rows = [
        (0, "\uff28\uff45\uff4c\uff4c\uff4f"),  # fullwidth "Hello"
        (1, "\ufb01le"),                             # fi-ligature "file"
        (2, "caf\u00e9"),                            # already NFC: unchanged
        (3, "\u2460"),                               # circled one -> "1"
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["t"] for r in df.select(
        "id", nfkc_normalize("text").alias("t")).collect()}
    assert got[0] == "Hello"
    assert got[1] == "file"
    assert got[2] == "caf\u00e9"
    assert got[3] == "1"
    assert got[4] is None
    folded = {r["id"]: r["t"] for r in df.select(
        "id", nfkc_normalize("text", casefold=True).alias("t")).collect()}
    assert folded[0] == "hello"


def test_span_corruption_reconstruction_law(spark):
    """T5 span corruption (r12): for every doc, substituting each
    <extra_id_j>'s target span back into the inputs reconstructs the
    original token sequence exactly; n_masked matches; deterministic
    across runs; seed changes the masks."""
    import re

    from bitfilters_spark.operators.text import span_corruption

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(10 + (i * 7) % 40)))
        for i in range(30)
    ] + [(100, "tiny doc"), (101, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["inputs"], r["targets"], r["n_masked"])
        for r in span_corruption(df, "doc_id", "text").collect()
    }
    texts = dict(rows)
    n_corrupted = 0
    for did, (inp, tgt, nm) in out.items():
        orig = texts[did].split(" ")
        if tgt == "":
            assert inp == texts[did] and nm == 0
            continue
        n_corrupted += 1
        # parse targets into {sentinel: span tokens}
        parts = re.split(r"(<extra_id_\d+>)", tgt)
        parts = [p.strip() for p in parts if p.strip()]
        spans, cur = {}, None
        for p in parts:
            if p.startswith("<extra_id_"):
                cur = p
                spans[cur] = []
            else:
                spans[cur] = p.split(" ")
        closing = max(spans, key=lambda s: int(s[10:-1]))
        assert spans.pop(closing) == []  # the closing sentinel is empty
        rebuilt = []
        for tok in inp.split(" "):
            rebuilt.extend(spans[tok] if tok in spans else [tok])
        assert rebuilt == orig, did
        assert nm == sum(len(v) for v in spans.values())
        # masked fraction in a sane band around the density
        assert 0 < nm <= max(1, int(len(orig) * 0.6))
    assert n_corrupted >= 25
    # determinism
    again = {
        r["doc_id"]: (r["inputs"], r["targets"], r["n_masked"])
        for r in span_corruption(df.repartition(7), "doc_id", "text").collect()
    }
    assert again == out
    # a different seed moves the masks somewhere
    other = {
        r["doc_id"]: r["inputs"]
        for r in span_corruption(df, "doc_id", "text", seed=9).collect()
    }
    assert any(other[d] != out[d][0] for d in other)
    import pytest as _p
    with _p.raises(ValueError, match="noise_density"):
        span_corruption(df, "doc_id", "text", noise_density=1.5)


def test_span_corruption_duckdb_hash_variant(spark):
    """r13: hash='duckdb' derives spans from the md5-based cross-engine
    hash — the reconstruction law still holds, span positions generally
    differ from native, and a python replay of the md5 derivation
    matches the engine bit-for-bit (what the driver oracle does)."""
    import hashlib
    import re

    from bitfilters_spark.operators.text import span_corruption

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(12 + (i * 5) % 35)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["inputs"], r["targets"], r["n_masked"])
        for r in span_corruption(df, "doc_id", "text", hash="duckdb").collect()
    }
    texts = dict(rows)

    def h60(did, j, seed, k):
        s = f"{did}:{j}:{seed}:{k}".encode()
        return int(hashlib.md5(s).hexdigest()[:15], 16)

    for did, (inp, tgt, nm) in out.items():
        orig = texts[did].split(" ")
        n = len(orig)
        ns = min(int(n * 0.15 / 3.0 + 0.5), n)
        if ns < 1:
            assert inp == texts[did] and tgt == "" and nm == 0
            continue
        # python replay of the whole derivation
        pieces_in, pieces_tgt, masked = [], [], 0
        for j in range(ns):
            bs, be = j * n // ns, (j + 1) * n // ns
            blen = be - bs
            sl = min(1 + h60(did, j, 0, 1) % 5, blen)
            off = h60(did, j, 0, 2) % (blen - sl + 1)
            ss = bs + off
            pieces_in += orig[bs:ss] + [f"<extra_id_{j}>"] + orig[ss + sl:be]
            pieces_tgt += [f"<extra_id_{j}>"] + orig[ss:ss + sl]
            masked += sl
        assert inp == " ".join(pieces_in), did
        assert tgt == " ".join(pieces_tgt + [f"<extra_id_{ns}>"]), did
        assert nm == masked
    # different hash families place spans differently somewhere
    native = {
        r["doc_id"]: r["inputs"]
        for r in span_corruption(df, "doc_id", "text").collect()
    }
    assert any(native[d] != out[d][0] for d in native)
    import pytest as _p
    with _p.raises(ValueError, match="hash"):
        span_corruption(df, "doc_id", "text", hash="bogus")


def test_script_profile_counts(spark):
    from bitfilters_spark.operators.text import script_profile

    rows = [
        (1, "hello мир 世界 مرحبا γειά שלום 한글 नमस्ते 123!"),
        (2, "pure ascii text"),
        (3, ""),
        (4, "日本語のテキスト です"),      # kana-heavy Japanese + Han
        (5, "ภาษาไทยสวัสดี"),              # Thai (incl. combining marks)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["p"].asDict()
        for r in df.select("doc_id", script_profile("text").alias("p")).collect()
    }
    p = got[1]
    assert p["n_latin"] == 5          # hello
    assert p["n_cyrillic"] == 3       # мир
    assert p["n_cjk"] == 2            # 世界
    assert p["n_arabic"] == 5         # مرحبا
    assert p["n_greek"] == 4          # γειά
    assert p["n_hebrew"] == 4         # שלום
    assert p["n_hangul"] == 2         # 한글
    assert p["n_devanagari"] == 6     # नमस्ते (incl. combining marks)
    # script classes count combining marks (Mn) that \p{L} does not:
    # the 2 Devanagari matras put the script sum 2 over n_letters
    assert p["n_letters"] == 29
    assert sum(p[k] for k in p if k != "n_letters") == 31
    assert got[2]["n_latin"] == 13 and got[2]["n_cyrillic"] == 0
    assert all(v == 0 for v in got[3].values())
    # the r12-verdict routing case: a kana-heavy Japanese page must NOT
    # profile as script-less — Hiragana/Katakana counted apart from Han
    jp = got[4]
    assert jp["n_cjk"] == 3           # 日本語
    assert jp["n_hiragana"] == 3      # の + です
    assert jp["n_katakana"] == 4      # テキスト
    assert jp["n_cjk"] + jp["n_hiragana"] + jp["n_katakana"] == jp["n_letters"]
    th = got[5]
    assert th["n_thai"] >= 10 and th["n_latin"] == 0
    assert th["n_thai"] >= th["n_letters"]  # combining vowels/tones counted


def test_dedup_lines_within_doc(spark):
    from bitfilters_spark.operators.text import dedup_lines_within_doc

    rows = [
        (1, "a\nb\na\nc\nb\na"),
        (2, "unique\nlines\nonly"),
        (3, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean"], r["n_dup_lines"])
        for r in dedup_lines_within_doc(df, "text", "clean").collect()
    }
    assert got[1] == ("a\nb\nc", 3)
    assert got[2] == ("unique\nlines\nonly", 0)
    assert got[3] == ("x", 0)
    # default: rewrite text_col in place
    inplace = {
        r["doc_id"]: r["text"]
        for r in dedup_lines_within_doc(df, "text").collect()
    }
    assert inplace[1] == "a\nb\nc"


def test_dedup_lines_large_doc_bounded(spark):
    """r12 verdict #157: a pathological 50k-line document must complete
    in bounded time (the sort-based path is O(n log n), not the old
    seen-array O(n²) fold) and still match a python replay exactly."""
    import time

    from bitfilters_spark.operators.text import dedup_lines_within_doc

    n = 50_000
    py_lines = [f"line-{i % 7919}-{i % 13}" for i in range(n)]
    doc = "\n".join(py_lines)
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    t0 = time.monotonic()
    row = dedup_lines_within_doc(df, "text", "clean").collect()[0]
    elapsed = time.monotonic() - t0
    seen, kept = set(), []
    for l in py_lines:
        if l not in seen:
            seen.add(l)
            kept.append(l)
    assert row["clean"] == "\n".join(kept)
    assert row["n_dup_lines"] == n - len(kept)
    # generous bound: the quadratic fold took minutes here, the sorted
    # path is sub-second plus session overhead
    assert elapsed < 60, f"50k-line doc took {elapsed:.1f}s"


def test_dedup_lines_max_lines_bypass(spark):
    """max_lines= passes oversized docs through unchanged with a counted
    flag (the max_right_rows fail-safe convention); small docs dedup."""
    from bitfilters_spark.operators.text import dedup_lines_within_doc

    rows = [(1, "a\na\nb"), (2, "x\nx\nx\nx\nx")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dedup_lines_within_doc(df, "text", max_lines=4).collect()
    }
    assert got[1]["text"] == "a\nb"
    assert got[1]["n_dup_lines"] == 1
    assert got[1]["line_dedup_skipped"] is False
    assert got[2]["text"] == "x\nx\nx\nx\nx"  # unchanged
    assert got[2]["n_dup_lines"] is None
    assert got[2]["line_dedup_skipped"] is True


def test_ngram_diversity(spark):
    """distinct-n per group: exact integers against a python replay; a
    degenerate 'synthetic' group scores far below the varied one."""
    from bitfilters_spark.operators.text import ngram_diversity

    rows = [
        (1, "human", "the quick brown fox jumps over the lazy dog"),
        (2, "human", "pack my box with five dozen liquor jugs"),
        (3, "synth", "yes and yes and yes and yes and yes and yes"),
        (4, "synth", "yes and yes and yes and yes and yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {
        r["src"]: (r["n_grams_total"], r["n_grams_distinct"], r["distinct_ratio"])
        for r in ngram_diversity(df, "src", "text", n=3).collect()
    }

    def replay(texts):
        grams = []
        for t in texts:
            ts = t.split(" ")
            grams += [tuple(ts[i:i+3]) for i in range(len(ts) - 2)]
        return len(grams), len(set(grams))

    ht, hd = replay([r[2] for r in rows if r[1] == "human"])
    st, sd = replay([r[2] for r in rows if r[1] == "synth"])
    assert got["human"][:2] == (ht, hd)
    assert got["synth"][:2] == (st, sd)
    assert got["synth"][2] < 0.3 < got["human"][2]
