"""Unigram-LM tokenizer (Kudo 2018, the SentencePiece default) — the
OTHER production tokenizer algorithm next to BPE (`operators/bpe.py`):
instead of greedy merge rules, a vocabulary of pieces with
log-probabilities, trained by EM and applied by Viterbi segmentation
(each word splits into the maximum-likelihood piece sequence).

Both E-steps are available (``em=``): ``"hard"`` (Viterbi-EM — counts
along each word's BEST segmentation; the variant most re-implementations
ship, and the default here for its determinism) and ``"soft"``
(forward–backward EXPECTED counts over all segmentations —
SentencePiece's actual E-step, `expected_piece_counts`). The vocabulary
shrinks geometrically (``shrink_factor`` per round, lowest-count pieces
dropped, single characters always kept for coverage) until
``vocab_size`` survives — or the single-character floor is reached.

100 TB decomposition (the `train_bpe` shape): the corpus collapses ONCE
into a word-TYPE count table (one hash aggregation — Zipf makes the type
table tiny relative to the corpus, and a ``top_words`` cap bounds it
hard); seeding explodes substrings of the TYPE table (JVM expressions,
weight = word count, TakeOrdered top-``seed_size``); each EM round
broadcasts the piece table into ONE ``mapInPandas`` pass over word types
(Viterbi per type, counts × word frequency) and collects piece-scale
count rows — the driver only ever holds the vocabulary, never corpus
text. Encoding tokenizes distinct word TYPES once and joins the mapping
back (corpus rows never enter Python).

Verification: the distributed trainer is pinned EQUAL (same pieces, same
log-probs to 1e-9) to a sequential pure-Python run of the same
algorithm; Viterbi optimality is checked independently against
brute-force enumeration of ALL segmentations on short words; coverage
and round-trip laws (pieces concatenate back to the word) hold for every
word.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_frequencies
from .text import tokens

__all__ = [
    "viterbi_segment",
    "expected_piece_counts",
    "train_unigram",
    "train_unigram_from_words",
    "train_unigram_local",
    "unigram_encode",
    "unigram_token_counts",
    "save_unigram",
    "load_unigram",
    "save_unigram_text",
    "load_unigram_text",
]


def viterbi_segment(word: str, logp: dict, max_piece_len: int) -> list:
    """Maximum-likelihood segmentation of ``word`` under piece log-probs
    (ties: fewer pieces, then lexicographically smaller piece at the
    earliest difference — fully deterministic). Returns [] when the word
    cannot be covered (impossible once single chars are in the vocab)."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list = [None] * (n + 1)
    nseg = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j] == NEG:
                continue
            cand = best[j] + lp
            take = False
            if cand > best[i]:
                take = True
            elif cand == best[i] and back[i] is not None:
                # tie: fewer pieces, then smaller piece string
                if nseg[j] + 1 < nseg[i]:
                    take = True
                elif nseg[j] + 1 == nseg[i] and piece < word[back[i]:i]:
                    take = True
            if take:
                best[i] = cand
                back[i] = j
                nseg[i] = nseg[j] + 1
    if best[n] == NEG:
        return []
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _seed_counts_local(wc: list, max_piece_len: int) -> dict:
    counts: dict = {}
    for w, c in wc:
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                s = w[i:j]
                counts[s] = counts.get(s, 0) + c
    return counts


def _select_seed(counts: dict, wc: list, seed_size: int) -> dict:
    """Top-``seed_size`` substrings by (count desc, piece asc), single
    characters ALWAYS kept (coverage); log-probs from relative counts."""
    chars = {w[i] for w, _ in wc for i in range(len(w))}
    multi = sorted(
        ((c, p) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[0], t[1]),
    )[: max(seed_size - len(chars), 0)]
    keep = {p: counts[p] for p in chars}
    keep.update({p: c for c, p in multi})
    total = float(sum(keep.values())) or 1.0
    return {p: math.log(c / total) for p, c in keep.items()}


def _em_update(piece_counts: dict, wc_chars: set, prev: dict) -> dict:
    """M-step: re-estimate log-probs from the E-step counts (Viterbi
    or expected); unused non-char pieces drop, unused single chars keep
    a floor count of 1 (coverage must never be lost)."""
    counts = dict(piece_counts)
    for ch in wc_chars:
        counts.setdefault(ch, 0)
        if counts[ch] == 0:
            counts[ch] = 1
    counts = {p: c for p, c in counts.items() if c > 0}
    total = float(sum(counts.values())) or 1.0
    return {p: math.log(c / total) for p in sorted(counts) for c in [counts[p]]}


def _shrink(logp: dict, counts: dict, wc_chars: set, target: int, factor: float) -> dict:
    keep_n = max(int(len(logp) * factor), target)
    multi = sorted(
        ((counts.get(p, 0), p) for p in logp if len(p) > 1),
        key=lambda t: (-t[0], t[1]),
    )
    budget = max(keep_n - len(wc_chars), 0)
    kept = {p for _, p in multi[:budget]} | wc_chars
    return {p: lp for p, lp in logp.items() if p in kept}


def train_unigram_local(
    wc: list,
    vocab_size: int = 8000,
    seed_size: int = 100_000,
    max_piece_len: int = 8,
    em_rounds: int = 2,
    shrink_factor: float = 0.75,
    em: str = "hard",
) -> dict:
    """Sequential reference trainer over (word, count) pairs — the exact
    algorithm `train_unigram` distributes; the equality of the two is a
    pytest law. Returns {"pieces": {piece: logp}, "max_piece_len": n}."""
    if em not in ("hard", "soft"):
        raise ValueError("em must be 'hard' or 'soft'")
    wc_chars = {w[i] for w, _ in wc for i in range(len(w))}
    logp = _select_seed(_seed_counts_local(wc, max_piece_len), wc, seed_size)
    while True:
        counts: dict = {}
        for _ in range(em_rounds):
            counts = {}
            for w, c in wc:
                if em == "hard":
                    for piece in viterbi_segment(w, logp, max_piece_len):
                        counts[piece] = counts.get(piece, 0) + c
                else:
                    for piece, ec in expected_piece_counts(
                        w, logp, max_piece_len
                    ).items():
                        counts[piece] = counts.get(piece, 0.0) + ec * c
            logp = _em_update(counts, wc_chars, logp)
        if len(logp) <= vocab_size:
            break
        shrunk = _shrink(logp, counts, wc_chars, vocab_size, shrink_factor)
        if len(shrunk) >= len(logp):
            # single characters are never dropped (coverage), so a
            # vocab_size below the distinct-character count cannot be
            # reached — stop at the char floor instead of looping forever
            break
        logp = shrunk
    return {"pieces": logp, "max_piece_len": max_piece_len}


def _substring_counts(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, count) over all substrings up to max_piece_len of the
    word-TYPE table, weighted by word frequency — pure JVM explode."""
    w = F.col("word")
    n = F.length(w)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), n - i + 1)
                ),
                lambda l: F.substring(w, i.cast("int"), l.cast("int")),
            ),
        )
    )
    return (
        words.select(F.explode(subs).alias("piece"), F.col("n"))
        .groupBy("piece")
        .agg(F.sum("n").alias("c"))
    )


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 8000,
    seed_size: int = 100_000,
    max_piece_len: int = 8,
    em_rounds: int = 2,
    shrink_factor: float = 0.75,
    top_words: int | None = 200_000,
    em: str = "hard",
) -> dict:
    """Distributed unigram-LM tokenizer training (see module docstring
    for the decomposition). ≡ :func:`train_unigram_local` on the same
    word table — pytest-pinned."""
    words = word_frequencies(df, text_col, top_words)
    return train_unigram_from_words(
        words,
        vocab_size=vocab_size,
        seed_size=seed_size,
        max_piece_len=max_piece_len,
        em_rounds=em_rounds,
        shrink_factor=shrink_factor,
        em=em,
    )


def train_unigram_from_words(
    words_df: DataFrame,
    vocab_size: int = 8000,
    seed_size: int = 100_000,
    max_piece_len: int = 8,
    em_rounds: int = 2,
    shrink_factor: float = 0.75,
    em: str = "hard",
) -> dict:
    """Train from an already-reduced (word, n) frequency table — shared
    by :func:`train_unigram` and `streaming.tokenizer`'s folded-state
    path, so batch and streamed models cannot diverge."""
    import pandas as pd

    if em not in ("hard", "soft"):
        raise ValueError("em must be 'hard' or 'soft'")
    spark = words_df.sparkSession
    words = words_df.localCheckpoint()
    # seed: distributed substring counts, top-K by (count desc, piece);
    # only piece-scale rows ever cross the driver, never the word table
    sub = _substring_counts(words, max_piece_len).localCheckpoint(eager=False)
    char_counts = {
        r["piece"]: int(r["c"])
        for r in sub.where(F.length("piece") == 1).collect()
    }
    n_multi = max(seed_size - len(char_counts), 0)
    multi = (
        sub.where(F.length("piece") > 1)
        .orderBy(F.col("c").desc(), "piece")
        .limit(n_multi)
        .collect()
    )
    keep = dict(char_counts)
    keep.update({r["piece"]: r["c"] for r in multi})
    total = float(sum(keep.values())) or 1.0
    logp = {p: math.log(c / total) for p, c in keep.items()}
    wc_chars = set(char_counts)

    def em_counts(model: dict) -> dict:
        b = spark.sparkContext.broadcast(model)

        def seg(batches):
            for pdf in batches:
                agg: dict = {}
                for w, c in zip(pdf["word"], pdf["n"]):
                    if em == "hard":
                        for piece in viterbi_segment(
                            w, b.value, max_piece_len
                        ):
                            agg[piece] = agg.get(piece, 0.0) + float(c)
                    else:
                        for piece, ec in expected_piece_counts(
                            w, b.value, max_piece_len
                        ).items():
                            agg[piece] = agg.get(piece, 0.0) + ec * float(c)
                yield pd.DataFrame(
                    {"piece": list(agg), "c": list(agg.values())}
                )

        rows = (
            words.mapInPandas(seg, schema="piece string, c double")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        b.unpersist()
        return {r["piece"]: float(r["c"]) for r in rows}

    while True:
        counts: dict = {}
        for _ in range(em_rounds):
            counts = em_counts(logp)
            logp = _em_update(counts, wc_chars, logp)
        if len(logp) <= vocab_size:
            break
        shrunk = _shrink(logp, counts, wc_chars, vocab_size, shrink_factor)
        if len(shrunk) >= len(logp):
            # char floor reached (see train_unigram_local) — never loop
            break
        logp = shrunk
    return {"pieces": logp, "max_piece_len": max_piece_len}


def unigram_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict,
    out_col: str = "pieces",
) -> DataFrame:
    """(id, pieces array<string>) — each document's words Viterbi-
    segmented under the model, in order. Word TYPES tokenize once in a
    broadcast-model mapInPandas pass; the (word → pieces) mapping joins
    back onto the exploded corpus and one per-doc regroup restores
    order — corpus text never enters Python."""
    import pandas as pd

    spark = df.sparkSession
    mpl = int(model["max_piece_len"])
    # the SAME single-space split the trainer reduces the corpus with
    # (word_frequencies -> text.tokens) — a \s+ split here would produce
    # word types training never counted on tab/newline text, Viterbi-
    # segmenting in-corpus words against the wrong distribution
    types = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    b = spark.sparkContext.broadcast(model["pieces"])

    def seg(batches):
        for pdf in batches:
            out = []
            for w in pdf["word"]:
                segs = viterbi_segment(w, b.value, mpl)
                # a word with characters the model never saw cannot be
                # covered: emit the UNK sentinel (the SentencePiece
                # convention) rather than silently dropping the word
                out.append(segs if segs else ["<unk>"])
            yield pd.DataFrame({"word": pdf["word"], "__p": out})

    mapping = types.mapInPandas(seg, schema="word string, __p array<string>")
    exploded = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("__pos", "word"),
    )
    return (
        exploded.join(mapping, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__p")))
                    ),
                    lambda s: s["__p"],
                )
            ).alias(out_col)
        )
    )


def unigram_token_counts(
    df: DataFrame, id_col: str, text_col: str, model: dict
) -> DataFrame:
    """(id, n_pieces) — the packing/budget weight under a unigram
    tokenizer (`bpe_token_counts`' twin)."""
    enc = unigram_encode(df, id_col, text_col, model)
    return enc.select(id_col, F.size("pieces").alias("n_pieces"))


def save_unigram(spark, model: dict, path: str) -> None:
    """Persist as parquet (piece, logp) + a metadata row — the
    `save_bpe` artifact contract."""
    rows = sorted(model["pieces"].items())
    spark.createDataFrame(rows, "piece string, logp double").write.mode(
        "overwrite"
    ).parquet(f"{path}/pieces")
    spark.createDataFrame(
        [(int(model["max_piece_len"]),)], "max_piece_len long"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_unigram(spark, path: str) -> dict:
    pieces = {
        r["piece"]: float(r["logp"])
        for r in spark.read.parquet(f"{path}/pieces").collect()
    }
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return {"pieces": pieces, "max_piece_len": int(meta["max_piece_len"])}


def save_unigram_text(model: dict, path: str, spark=None) -> None:
    """Write the model in the PUBLIC interchange layout (the
    `save_bpe_text` contract for the Unigram family): a SentencePiece-
    style ``unigram.vocab`` — one ``piece<TAB>logprob`` line, scores in
    full ``repr`` precision so a round-trip is bit-identical — plus a
    HuggingFace ``tokenizer.json`` whose ``model`` block is the
    ``tokenizers`` library's Unigram shape (``type: "Unigram"``,
    ``vocab: [[piece, logprob], ...]``), so trained models load into
    standard tooling AND back through :func:`bpe.load_hf_tokenizer_json`.
    Lines order by score descending then piece (deterministic; the
    id order HF assigns on import). Tab/newline/backslash INSIDE a
    piece (legal — word types come from the single-space split) are
    escaped in the vocab file and unescaped on load, keeping the line
    format unambiguous. Conventions note: SentencePiece-trained vocabularies
    mark word starts with ``▁`` (U+2581); models trained HERE carry no
    marker — same caveat as the BPE ``Ġ`` note on import, check
    `tokenizer_fertility_report` before committing a cross-convention
    import to a budget pass. Goes through the scheme-agnostic Hadoop FS
    layer like every persisted artifact."""
    import json as _json

    from ..streaming import state_io

    rows = sorted(model["pieces"].items(), key=lambda kv: (-kv[1], kv[0]))
    # pieces CAN contain tab/newline (word types come from the single-
    # space tokens() split, so '\t'/'\n' are legal piece characters):
    # escape them (and backslash) so the line format stays unambiguous
    # and the round trip lossless — an unescaped tab piece would crash
    # the loader's float() and a newline piece would silently corrupt
    def _esc(piece: str) -> str:
        return (
            piece.replace("\\", "\\\\")
            .replace("\t", "\\t")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )

    vocab_txt = "".join(f"{_esc(p)}\t{logp!r}\n" for p, logp in rows)
    state_io.write_bytes(
        state_io.join(path, "unigram.vocab"), vocab_txt.encode("utf-8"), spark
    )
    doc = {
        "version": "1.0",
        "model": {
            "type": "Unigram",
            "unk_id": None,
            "vocab": [[p, logp] for p, logp in rows],
        },
    }
    state_io.write_bytes(
        state_io.join(path, "tokenizer.json"),
        _json.dumps(doc, ensure_ascii=False).encode("utf-8"),
        spark,
    )


def load_unigram_text(path: str, spark=None) -> dict:
    """Load a ``unigram.vocab`` piece/log-prob file (ours or a
    SentencePiece export) back into the engine's model dict —
    ``max_piece_len`` is recomputed from the pieces themselves, so the
    file is fully self-describing."""
    from ..streaming import state_io

    raw = state_io.read_bytes(state_io.join(path, "unigram.vocab"), spark)
    if raw is None:
        raise FileNotFoundError(f"no unigram.vocab under {path}")
    def _unesc(piece: str) -> str:
        out, i = [], 0
        while i < len(piece):
            ch = piece[i]
            if ch == "\\" and i + 1 < len(piece):
                nxt = piece[i + 1]
                out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}.get(nxt, nxt))
                i += 2
            else:
                out.append(ch)
                i += 1
        return "".join(out)

    pieces = {}
    for line in raw.decode("utf-8").splitlines():
        if not line:
            continue
        piece, _, score = line.partition("\t")
        pieces[_unesc(piece)] = float(score)
    if not pieces:
        raise ValueError(f"empty unigram.vocab under {path}")
    return {
        "pieces": pieces,
        "max_piece_len": max(len(p) for p in pieces),
    }


def expected_piece_counts(word: str, logp: dict, max_piece_len: int) -> dict:
    """Soft-EM E-step kernel: forward–backward over the word's
    segmentation lattice → expected count of every piece under the
    posterior over ALL segmentations (Kudo 2018's actual E-step; the
    Viterbi kernel counts only the best path). Log-space with
    logsumexp — no underflow on long words. Returns {} when the word
    cannot be covered."""
    n = len(word)
    NEG = float("-inf")

    def lse(xs):
        m = max(xs)
        if m == NEG:
            return NEG
        return m + math.log(sum(math.exp(x - m) for x in xs))

    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        terms = []
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and alpha[j] != NEG:
                terms.append(alpha[j] + lp)
        if terms:
            alpha[i] = lse(terms)
    if alpha[n] == NEG:
        return {}
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        terms = []
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is not None and beta[j] != NEG:
                terms.append(lp + beta[j])
        if terms:
            beta[i] = lse(terms)
    z = alpha[n]
    counts: dict = {}
    for j in range(n):
        if alpha[j] == NEG:
            continue
        for i in range(j + 1, min(j + max_piece_len, n) + 1):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or beta[i] == NEG:
                continue
            counts[piece] = counts.get(piece, 0.0) + math.exp(
                alpha[j] + lp + beta[i] - z
            )
    return counts
