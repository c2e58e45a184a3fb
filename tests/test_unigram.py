"""Unigram-LM tokenizer (operators/unigram.py): distributed ≡ sequential
trainer, Viterbi optimality vs brute force, coverage/round-trip laws,
encode/count/persistence."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.unigram import (
    load_unigram,
    save_unigram,
    train_unigram,
    train_unigram_local,
    unigram_encode,
    unigram_token_counts,
    viterbi_segment,
)

TEXTS = [
    "internationalization is the internal nation of the national",
    "nationalization internal international nation nations",
    "the cat sat on the national mat",
    "internationalization internationalization nation",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_distributed_trainer_equals_local(spark):
    """The whole training pipeline — seed selection, EM counts, M-step,
    shrink rounds — produces the SAME vocabulary and the same log-probs
    as the sequential reference over the same word table."""
    from bitfilters_spark.operators.bpe import word_frequencies

    wc = [
        (r["word"], int(r["n"]))
        for r in word_frequencies(_df(spark), "text", None).collect()
    ]
    local = train_unigram_local(
        wc, vocab_size=30, seed_size=200, max_piece_len=6, em_rounds=2
    )
    dist = train_unigram(
        _df(spark), "text", vocab_size=30, seed_size=200,
        max_piece_len=6, em_rounds=2,
    )
    assert set(dist["pieces"]) == set(local["pieces"])
    for p, lp in local["pieces"].items():
        assert dist["pieces"][p] == pytest.approx(lp, abs=1e-9), p


def test_viterbi_optimal_vs_bruteforce():
    """On short words, the DP's segmentation log-prob equals the max
    over ALL enumerated segmentations — an independent check of the
    kernel both trainers share."""
    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.05), "aba": math.log(0.15), "bab": math.log(0.05),
    }

    def brute(word):
        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            idx = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            segs = [word[idx[k] : idx[k + 1]] for k in range(len(idx) - 1)]
            if all(s in logp for s in segs):
                score = sum(logp[s] for s in segs)
                if best is None or score > best:
                    best = score
        return best

    for word in ("ab", "aba", "abab", "ababa", "bababa", "aabb", "a"):
        segs = viterbi_segment(word, logp, 3)
        if brute(word) is None:
            assert segs == []
        else:
            assert segs, word
            assert sum(logp[s] for s in segs) == pytest.approx(
                brute(word), abs=1e-12
            ), word
            assert "".join(segs) == word


def test_roundtrip_and_frequent_words_become_pieces(spark):
    model = train_unigram(
        _df(spark), "text", vocab_size=40, seed_size=400, max_piece_len=8
    )
    enc = unigram_encode(_df(spark), "doc_id", "text", model).collect()
    texts = {i: t for i, t in enumerate(TEXTS)}
    for r in enc:
        # round-trip law: pieces concatenate back to the document's words
        assert "".join(r["pieces"]) == texts[r["doc_id"]].replace(" ", "")
    # 'nation' recurs inside many words: it must survive as a piece
    assert any(p == "nation" for p in model["pieces"])
    # token counts = encode sizes
    counts = {
        r["doc_id"]: r["n_pieces"]
        for r in unigram_token_counts(_df(spark), "doc_id", "text", model).collect()
    }
    for r in enc:
        assert counts[r["doc_id"]] == len(r["pieces"])


def test_unseen_characters_fall_back_to_unk(spark):
    model = train_unigram(_df(spark), "text", vocab_size=40, seed_size=200)
    probe = spark.createDataFrame(
        [(1, "nation 象形字 cat")], "doc_id long, text string"
    )
    [row] = unigram_encode(probe, "doc_id", "text", model).collect()
    assert "<unk>" in row["pieces"]
    joined = "".join(row["pieces"])
    assert joined.startswith("nation") and joined.endswith("cat")


def test_unigram_save_load_roundtrip(spark, tmp_path):
    model = train_unigram(_df(spark), "text", vocab_size=40, seed_size=200)
    save_unigram(spark, model, str(tmp_path / "uni"))
    back = load_unigram(spark, str(tmp_path / "uni"))
    assert back["pieces"] == pytest.approx(model["pieces"])
    assert back["max_piece_len"] == model["max_piece_len"]
    a = unigram_encode(_df(spark), "doc_id", "text", model).collect()
    b = unigram_encode(_df(spark), "doc_id", "text", back).collect()
    assert sorted(map(tuple, ((r["doc_id"], tuple(r["pieces"])) for r in a))) == \
        sorted(map(tuple, ((r["doc_id"], tuple(r["pieces"])) for r in b)))


def test_unigram_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    model = train_unigram(empty, "text", vocab_size=10, seed_size=10)
    assert model["pieces"] == {}
    assert unigram_encode(empty, "doc_id", "text", model).count() == 0


def test_expected_counts_match_bruteforce_posterior():
    """Soft-EM kernel: forward-backward expected piece counts equal the
    brute-force posterior average over ALL segmentations, to 1e-12."""
    from bitfilters_spark.operators.unigram import expected_piece_counts

    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.05), "aba": math.log(0.15),
    }

    def brute(word):
        from collections import Counter

        segs = []
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=max(n - 1, 0)):
            idx = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            pieces = [word[idx[k] : idx[k + 1]] for k in range(len(idx) - 1)]
            if all(p in logp for p in pieces):
                segs.append((math.exp(sum(logp[p] for p in pieces)), pieces))
        z = sum(p for p, _ in segs)
        want: dict = Counter()
        for p, pieces in segs:
            for piece in pieces:
                want[piece] += p / z
        return dict(want)

    for word in ("ab", "aba", "abab", "ababa", "aabba"):
        got = expected_piece_counts(word, logp, 3)
        want = brute(word)
        assert set(got) == set(want), word
        for piece in want:
            assert got[piece] == pytest.approx(want[piece], abs=1e-12), (
                word, piece,
            )


def test_soft_em_distributed_equals_local(spark):
    from bitfilters_spark.operators.bpe import word_frequencies

    wc = [
        (r["word"], int(r["n"]))
        for r in word_frequencies(_df(spark), "text", None).collect()
    ]
    local = train_unigram_local(
        wc, vocab_size=30, seed_size=200, max_piece_len=6, em_rounds=2,
        em="soft",
    )
    dist = train_unigram(
        _df(spark), "text", vocab_size=30, seed_size=200,
        max_piece_len=6, em_rounds=2, em="soft",
    )
    assert set(dist["pieces"]) == set(local["pieces"])
    for p, lp in local["pieces"].items():
        assert dist["pieces"][p] == pytest.approx(lp, abs=1e-9), p
    with pytest.raises(ValueError, match="em"):
        train_unigram(_df(spark), "text", em="bogus")


def test_vocab_below_char_floor_terminates(spark):
    """vocab_size below the distinct-character count must stop at the
    char floor, not loop forever (code-review finding #1)."""
    model = train_unigram(
        _df(spark), "text", vocab_size=3, seed_size=50, em_rounds=1,
    )
    chars = {c for t in TEXTS for c in t.replace(" ", "")}
    assert set(model["pieces"]) == chars  # exactly the floor


def test_train_encode_tokenization_parity_on_whitespace(spark):
    """Trainer and encoder must share ONE tokenization (r11 verdict
    finding 4): the corpus convention is the single-space split
    (text.tokens), so a tab/newline inside a document yields the SAME
    word types on both sides — encode is exactly viterbi_segment over
    the trainer's word types, and the round-trip law holds under the
    single-space split."""
    texts = [
        "alpha\nbeta gamma",          # newline INSIDE a word type
        "alpha\nbeta alpha\nbeta",
        "tab\tsep tab\tsep gamma",
        "plain words plain",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    model = train_unigram(df, "text", vocab_size=60, seed_size=400,
                          max_piece_len=8, em_rounds=1)
    mpl = int(model["max_piece_len"])
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in unigram_encode(df, "doc_id", "text", model).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]  # single-space split
        expect = []
        for w in words:
            segs = viterbi_segment(w, model["pieces"], mpl)
            assert segs, f"in-corpus word type {w!r} must be covered"
            assert "".join(segs) == w
            expect.extend(segs)
        assert enc[i] == expect
    # and the count twin agrees
    counts = {
        r["doc_id"]: r["n_pieces"]
        for r in unigram_token_counts(df, "doc_id", "text", model).collect()
    }
    assert counts == {i: len(enc[i]) for i in enc}


def test_hf_unigram_import_drives_encode_and_packing(spark, tmp_path):
    """Interchange (r11 verdict directive 2): a HuggingFace
    tokenizer.json with model.type == "Unigram" imports into the #149
    model dict and drives unigram_encode -> unigram_token_counts ->
    pack_shards unchanged."""
    import json

    from bitfilters_spark.operators.bpe import load_hf_tokenizer_json
    from bitfilters_spark.operators.packing import pack_shards

    doc = {
        "version": "1.0",
        "model": {
            "type": "Unigram",
            "unk_id": 0,
            "vocab": [
                ["<unk>", -10.0],
                ["hello", -1.0], ["world", -1.2], ["hell", -3.0],
                ["o", -4.0], ["h", -5.0], ["e", -5.0], ["l", -5.0],
                ["w", -5.0], ["r", -5.0], ["d", -5.0],
            ],
        },
    }
    p = str(tmp_path / "tokenizer.json")
    with open(p, "w") as f:
        json.dump(doc, f)
    model = load_hf_tokenizer_json(p, spark)
    assert model["type"] == "unigram"
    assert model["max_piece_len"] == 5
    assert model["pieces"]["hello"] == -1.0

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello hello"), (3, "held")],
        "doc_id long, text string",
    )
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in unigram_encode(df, "doc_id", "text", model).collect()
    }
    assert enc[1] == ["hello", "world"]
    assert enc[2] == ["hello", "hello"]
    assert enc[3] == ["h", "e", "l", "d"]  # char fallback, no <unk>
    counts = unigram_token_counts(df, "doc_id", "text", model)
    packed = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(counts, "doc_id", "n_pieces", 4).collect()
    }
    # weights 2,2,4 in id order -> prefix 0,2,4 -> shards 0,0,1
    assert packed == {1: 0, 2: 0, 3: 1}


def test_unigram_text_export_reimports_identically(spark, tmp_path):
    """A trained model exported via save_unigram_text re-imports
    bit-identically through BOTH public paths: the SentencePiece-style
    unigram.vocab (load_unigram_text) and the HF tokenizer.json
    (load_hf_tokenizer_json)."""
    from bitfilters_spark.operators.bpe import load_hf_tokenizer_json
    from bitfilters_spark.operators.unigram import (
        load_unigram_text,
        save_unigram_text,
    )

    model = train_unigram(_df(spark), "text", vocab_size=40, seed_size=200)
    out = str(tmp_path / "export")
    save_unigram_text(model, out, spark)

    via_vocab = load_unigram_text(out, spark)
    assert via_vocab["pieces"] == model["pieces"]

    via_hf = load_hf_tokenizer_json(f"{out}/tokenizer.json", spark)
    assert via_hf["pieces"] == model["pieces"]
    # max_piece_len is recomputed from pieces on both paths; encoding is
    # invariant as long as it covers the longest piece
    enc_a = {
        r["doc_id"]: list(r["pieces"])
        for r in unigram_encode(_df(spark), "doc_id", "text", model).collect()
    }
    enc_b = {
        r["doc_id"]: list(r["pieces"])
        for r in unigram_encode(_df(spark), "doc_id", "text", via_hf).collect()
    }
    assert enc_a == enc_b


def test_unigram_text_export_escapes_whitespace_pieces(spark, tmp_path):
    """Review fix (r12): pieces CAN contain tab/newline (word types come
    from the single-space split) — the vocab line format escapes them so
    the round trip stays lossless instead of crashing or silently
    loading the wrong piece."""
    from bitfilters_spark.operators.unigram import (
        load_unigram_text,
        save_unigram_text,
    )

    model = {
        "pieces": {"a\tb": -1.5, "c": -0.5, "x\ny": -2.0, "w\\z": -3.25,
                   "plain": -0.25},
        "max_piece_len": 5,
    }
    out = str(tmp_path / "esc")
    save_unigram_text(model, out, spark)
    back = load_unigram_text(out, spark)
    assert back["pieces"] == model["pieces"]
