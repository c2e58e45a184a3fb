"""BPE tokenizer training + encoding (#98).

The incremental trainer is verified merge-for-merge against a naive
reference that recounts every pair from scratch after each merge — the
textbook Sennrich algorithm with no bookkeeping to get wrong.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators import bpe as B


# ---------------------------------------------------------------------------
# naive reference trainer (recount from scratch each merge)
# ---------------------------------------------------------------------------

def naive_bpe(word_counts, num_merges, min_pair_count=2):
    words = {B._symbols(w): int(n) for w, n in word_counts if w}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best_pair, best_n = None, -1
        for p, n in pairs.items():
            if n > best_n or (n == best_n and p < best_pair):
                best_pair, best_n = p, n
        if best_n < min_pair_count:
            break
        merges.append(best_pair)
        new_words = {}
        for syms, n in words.items():
            ns = B._merge_word(syms, best_pair)
            new_words[ns] = new_words.get(ns, 0) + n
        words = new_words
    return merges


CORPUS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("lowest", 4), ("new", 7), ("wide", 2), ("spark", 3), ("sparks", 1),
]


def test_incremental_matches_naive():
    got = B.learn_bpe_merges(CORPUS, num_merges=40, min_pair_count=1)
    want = naive_bpe(CORPUS, num_merges=40, min_pair_count=1)
    assert got == want
    assert len(got) > 10  # actually learned something


def test_incremental_matches_naive_min_count():
    got = B.learn_bpe_merges(CORPUS, num_merges=40, min_pair_count=3)
    want = naive_bpe(CORPUS, num_merges=40, min_pair_count=3)
    assert got == want


def test_merge_word_nonoverlapping():
    assert B._merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert B._merge_word(("a", "b", "a", "b"), ("a", "b")) == ("ab", "ab")
    assert B._merge_word(("x",), ("a", "b")) == ("x",)


def test_encode_word_roundtrips_training_segmentation():
    merges = B.learn_bpe_merges(CORPUS, num_merges=100, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    # fully-merged training words collapse to a single piece
    assert B.encode_word("newest", ranks) == ["newest</w>"]
    # unseen word still segments using learned pieces; concatenation
    # always reconstructs the word
    for w in ["lowest", "newer", "wides", "sparkly"]:
        pieces = B.encode_word(w, ranks)
        assert "".join(pieces).replace(B.END, "") == w


def test_train_bpe_spark_end_to_end(spark):
    rows = []
    for i, (w, n) in enumerate(CORPUS):
        rows.append((i, " ".join([w] * n)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    model = B.train_bpe(df, "text", num_merges=50, min_pair_count=1)
    # the Spark word-frequency path must reproduce the driver trainer
    assert model["merges"] == naive_bpe(CORPUS, 50, 1)
    # vocab: dense ids, merge products present
    assert sorted(model["vocab"].values()) == list(range(len(model["vocab"])))
    for a, b in model["merges"]:
        assert a + b in model["vocab"]

    enc = B.bpe_encode(df, "doc_id", "text", model).orderBy("doc_id").collect()
    assert len(enc) == len(CORPUS)
    for r, (w, n) in zip(enc, CORPUS):
        # n copies of a fully-merged training word -> n single pieces
        assert r["pieces"] == [w + B.END] * n
        assert r["n_bpe_tokens"] == n
        assert all(i >= 0 for i in r["piece_ids"])  # no OOV on train corpus
        assert r["piece_ids"] == [model["vocab"][w + B.END]] * n


def test_bpe_encode_oov_chars(spark):
    df = spark.createDataFrame([(0, "low low"), (1, "zzz")], ["doc_id", "text"])
    model = B.train_bpe(
        df.where("doc_id = 0"), "text", num_merges=10, min_pair_count=1
    )
    out = B.bpe_encode(df, "doc_id", "text", model, oov_id=-1).orderBy(
        "doc_id"
    ).collect()
    assert out[0]["piece_ids"] and all(i >= 0 for i in out[0]["piece_ids"])
    # 'z' never seen at training time -> pieces survive, ids are oov
    assert out[1]["pieces"] == ["z", "z", "z" + B.END]
    assert out[1]["piece_ids"] == [-1, -1, -1]


def test_bpe_counts_drive_packing(spark):
    """The advertised integration: real BPE counts feeding token budgets."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    model = B.train_bpe(docs, "text", num_merges=200, top_words=5000)
    counts = B.bpe_token_counts(docs, "doc_id", "text", model)
    joined = docs.join(counts, "doc_id")
    # BPE merges subword units: counts land between characters and words
    row = joined.select(
        F.sum("n_bpe_tokens").alias("bpe"),
        F.sum(F.size(F.split("text", " "))).alias("ws"),
    ).collect()[0]
    assert row["bpe"] >= row["ws"]  # at least one piece per word
    from bitfilters_spark.operators.packing import pack_shards

    packed = pack_shards(
        joined.select("doc_id", F.col("n_bpe_tokens").alias("n_tokens")),
        "doc_id",
        "n_tokens",
        shard_weight=4096,
    )
    assert packed.count() == 200


def test_bpe_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, " ".join([w] * n)) for i, (w, n) in enumerate(CORPUS)],
        ["doc_id", "text"],
    )
    model = B.train_bpe(df, "text", num_merges=50, min_pair_count=1)
    B.save_bpe(spark, model, str(tmp_path / "bpe"))
    loaded = B.load_bpe(spark, str(tmp_path / "bpe"))
    assert loaded["merges"] == model["merges"]
    assert loaded["vocab"] == model["vocab"]
    a = B.bpe_encode(df, "doc_id", "text", model).collect()
    b = B.bpe_encode(df, "doc_id", "text", loaded).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_bpe_public_format_roundtrip_and_packing(spark, tmp_path):
    """r8 (#114): vocab.json + merges.txt interchange. A model saved in
    the public layout loads back identical, encodes identically, and its
    counts drive pack_shards; a merges-only file (subword-nmt style,
    no vocab.json) reconstructs the train_bpe vocab ordering exactly."""
    df = spark.createDataFrame(
        [(i, " ".join([w] * n)) for i, (w, n) in enumerate(CORPUS)],
        ["doc_id", "text"],
    )
    model = B.train_bpe(df, "text", num_merges=50, min_pair_count=1)
    path = str(tmp_path / "pub_bpe")
    B.save_bpe_text(model, path, spark)

    # the on-disk layout IS the public one
    merges_txt = (tmp_path / "pub_bpe" / "merges.txt").read_text()
    assert merges_txt.startswith("#version: 0.2\n")
    assert all(
        len(line.split(" ")) == 2
        for line in merges_txt.splitlines()[1:]
    )
    import json

    vocab = json.loads((tmp_path / "pub_bpe" / "vocab.json").read_text())
    assert vocab == {p: i for p, i in model["vocab"].items()}

    loaded = B.load_bpe_text(path, spark)
    assert loaded["merges"] == model["merges"]
    assert loaded["vocab"] == model["vocab"]
    a = B.bpe_encode(df, "doc_id", "text", model).collect()
    b = B.bpe_encode(df, "doc_id", "text", loaded).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))

    # production-tokenizer counts -> pack_shards budgets, directly
    from bitfilters_spark.operators.packing import pack_shards

    counts = B.bpe_token_counts(df, "doc_id", "text", loaded)
    packed = pack_shards(
        counts.select("doc_id", F.col("n_bpe_tokens").alias("n_tokens")),
        "doc_id", "n_tokens", shard_weight=64,
    )
    assert packed.count() == df.count()

    # merges-only (no vocab.json): vocab rebuilt in train_bpe order
    (tmp_path / "pub_bpe" / "vocab.json").unlink()
    novocab = B.load_bpe_text(path, spark)
    assert novocab["merges"] == model["merges"]
    ranks = {p: i for i, p in enumerate(novocab["vocab"])}
    for x, y in model["merges"]:
        assert ranks[x + y] > ranks[x] and ranks[x + y] > ranks[y]


def test_tokenizer_fertility_report(spark):
    """Per-group fertility: hand-checkable totals on a two-group corpus
    where one group's vocabulary matches training (low fertility) and
    the other is out-of-domain (fertility near characters-per-word)."""
    from bitfilters_spark.operators.bpe import (
        tokenizer_fertility_report, train_bpe,
    )

    indomain = [(i, "src_a", "alpha beta gamma alpha beta") for i in range(20)]
    ood = [(100 + i, "src_b", "zzyzx qwfp zzyzx") for i in range(10)]
    df = spark.createDataFrame(
        indomain + ood, "doc_id long, source string, text string"
    )
    model = train_bpe(
        df.where(df.source == "src_a"), "text",
        num_merges=200, min_pair_count=1,
    )
    rep = {
        r["source"]: r.asDict()
        for r in tokenizer_fertility_report(df, model, "source").collect()
    }
    a, b = rep["src_a"], rep["src_b"]
    assert a["n_docs"] == 20 and b["n_docs"] == 10
    assert a["n_words"] == 100 and b["n_words"] == 30
    assert a["n_bytes"] == 20 * len("alpha beta gamma alpha beta")
    # trained words merge into one piece each -> fertility exactly 1.0
    assert a["fertility"] == 1.0
    assert a["n_tokens"] == 100
    # out-of-domain text fragments into many pieces per word
    assert b["fertility"] > 2.0
    assert b["bytes_per_token"] < a["bytes_per_token"]


def test_hf_tokenizer_json_import_drives_encode_and_packing(spark, tmp_path):
    """r9 (#6): HuggingFace tokenizer.json import — the single-file format
    the `tokenizers` library serializes. A model exported through that
    layout (both public merge encodings: "a b" strings and ["a","b"]
    pairs) loads into the same dict save_bpe_text round-trips, encodes
    identically, and its counts drive pack_shards."""
    import json

    df = spark.createDataFrame(
        [(i, " ".join([w] * n)) for i, (w, n) in enumerate(CORPUS)],
        ["doc_id", "text"],
    )
    model = B.train_bpe(df, "text", num_merges=50, min_pair_count=1)

    # write the model AS a tokenizer.json (what `tokenizers` would save),
    # with one added token to exercise the added_tokens fold-in
    def write_tok(path, merges_as_pairs: bool):
        doc = {
            "version": "1.0",
            "added_tokens": [{"id": len(model["vocab"]), "content": "<unk>"}],
            "model": {
                "type": "BPE",
                "vocab": {p: i for p, i in model["vocab"].items()},
                "merges": (
                    [[a, b] for a, b in model["merges"]]
                    if merges_as_pairs
                    else [f"{a} {b}" for a, b in model["merges"]]
                ),
            },
        }
        path.write_text(json.dumps(doc))

    for pairs in (False, True):
        p = tmp_path / f"tokenizer_{pairs}.json"
        write_tok(p, merges_as_pairs=pairs)
        loaded = B.load_hf_tokenizer_json(str(p), spark)
        assert loaded["merges"] == model["merges"]
        assert loaded["vocab"]["<unk>"] == len(model["vocab"])
        assert {k: v for k, v in loaded["vocab"].items() if k != "<unk>"} == model["vocab"]

    # the imported model drives the downstream budget path unchanged
    from bitfilters_spark.operators.packing import pack_shards

    counts = B.bpe_token_counts(df, "doc_id", "text", loaded)
    shards = pack_shards(counts, "doc_id", "n_bpe_tokens", 64).collect()
    ref = {r["doc_id"]: r["n_bpe_tokens"]
           for r in B.bpe_token_counts(df, "doc_id", "text", model).collect()}
    assert {r["doc_id"]: r["n_bpe_tokens"] for r in shards} == ref

    # non-BPE models must refuse loudly, not miscount silently
    bad = tmp_path / "wp.json"
    bad.write_text(json.dumps({"model": {"type": "WordPiece", "vocab": {}}}))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="WordPiece"):
        B.load_hf_tokenizer_json(str(bad), spark)


def test_chunk_by_pieces_budget_law(spark):
    """chunk_by_pieces: word i lands in floor(pieces_before/budget);
    chunks reassemble to the document; per-chunk piece sums match a
    sequential replay; unigram variant agrees with its own encoder."""
    from bitfilters_spark.operators.bpe import (
        chunk_by_pieces,
        encode_word,
        train_bpe,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "internationalization " * 10),
        (3, "tiny"),
    ]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in texts], "doc_id long, text string"
    )
    model = train_bpe(df, "text", num_merges=50)
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    out = {}
    for r in chunk_by_pieces(df, "doc_id", "text", model, 20).collect():
        out.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            r["chunk_text"], r["n_pieces"], r["n_words"]
        )
    for did, text in [(i, t.strip()) for i, t in texts]:
        words = text.split(" ")
        np_seq = [len(encode_word(w, ranks)) for w in words]
        # sequential replay of the boundary rule
        want: dict = {}
        run = 0
        for w, npieces in zip(words, np_seq):
            cid = run // 20
            want.setdefault(cid, [[], 0, 0])
            want[cid][0].append(w)
            want[cid][1] += npieces
            want[cid][2] += 1
            run += npieces
        got = out[did]
        assert set(got) == set(want)
        for cid in want:
            assert got[cid] == (" ".join(want[cid][0]), want[cid][1], want[cid][2])
        # chunks reassemble to the original document in chunk order
        assert " ".join(got[c][0] for c in sorted(got)) == text

    # unigram variant: piece sums equal the unigram token counts
    from bitfilters_spark.operators.unigram import (
        train_unigram,
        unigram_token_counts,
    )

    um = train_unigram(df, "text", vocab_size=40, seed_size=300, em_rounds=1)
    uc = chunk_by_pieces(df, "doc_id", "text", um, 20, tokenizer="unigram")
    totals = {
        r["doc_id"]: r["s"]
        for r in uc.groupBy("doc_id").agg(F.sum("n_pieces").alias("s")).collect()
    }
    want_tot = {
        r["doc_id"]: r["n_pieces"]
        for r in unigram_token_counts(df, "doc_id", "text", um).collect()
    }
    assert totals == want_tot
    import pytest as _p
    with _p.raises(ValueError, match="chunk_pieces"):
        chunk_by_pieces(df, "doc_id", "text", model, 0)
