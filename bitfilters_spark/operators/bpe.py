"""BPE tokenizer training + encoding, Spark-first (#98).

Closes the "whitespace tokens != training tokens" gap end-to-end: the
engine can now LEARN a subword vocabulary from the corpus and drive
`chunk_documents` / `pack_shards` / `pack_sequences` with real BPE token
counts instead of whitespace counts.

Scale design (the reason this is Spark-first and not a driver loop over
the corpus): BPE training never needs the corpus — it needs the WORD
FREQUENCY TABLE (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units", learns merges from a word->count dict).
So the 100 TB path is:

  corpus --one groupBy shuffle--> (word, n) table --TakeOrderedAndProject
  top-K--> driver merge loop over K rows.

The only corpus-scale work is ONE map-side-combined word count (the same
shuffle `build_vocabulary` already does); the merge loop runs over a
bounded top-K word table (default 200k types), which is also what
production trainers (HuggingFace tokenizers, SentencePiece on frequency
tables) operate on.  Tail types beyond K contribute O(tail_mass) pair
occurrences and cannot flip early merges on natural-language corpora; K
is a documented knob, not a silent cap.

Encoding is the corpus-scale half, so it is an Arrow-batched pandas UDF
(never per-row Python over rows: one Python call per ~10k-row batch)
with a per-batch word->pieces memo — real corpora repeat words heavily,
so the greedy merge loop runs once per distinct word per batch, and the
merge table ships to executors once via the task closure (metadata
scale: num_merges entries).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import tokens

END = "</w>"  # end-of-word marker (Sennrich convention)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def word_frequencies(
    df: DataFrame, text_col: str, top_words: int | None = 200_000
) -> DataFrame:
    """(word, n) — the corpus reduced to its word-frequency table, the
    sufficient statistic for BPE training. One explode + one map-side-
    combined groupBy; `top_words` keeps the driver-bound table bounded
    via TakeOrderedAndProject (per-partition top-K, driver merges
    K x n_partitions candidate rows, never the full vocabulary)."""
    agg = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_words is None:
        return agg
    return agg.orderBy(F.col("n").desc(), "word").limit(top_words)


def _symbols(word: str) -> tuple:
    """'low' -> ('l', 'o', 'w</w>')."""
    return tuple(word[:-1]) + (word[-1] + END,)


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    """Replace non-overlapping occurrences of `pair` left-to-right."""
    a, b = pair
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _pairs_of(syms: tuple) -> Counter:
    c = Counter()
    for i in range(len(syms) - 1):
        c[(syms[i], syms[i + 1])] += 1
    return c


def learn_bpe_merges(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) table, with
    incremental pair-count maintenance: each merge touches only the
    words that actually contain the chosen pair (pair -> word index),
    not the whole vocabulary — O(affected words) per merge instead of
    O(V).  Deterministic: ties break on the pair itself.

    Pure driver-side function over the METADATA-SCALE frequency table;
    the distributed halves are :func:`word_frequencies` (input) and
    :func:`bpe_encode` (output applied back to the corpus)."""
    words: list[tuple] = []
    counts: list[int] = []
    for w, n in word_counts:
        if not w:
            continue
        words.append(_symbols(w))
        counts.append(int(n))

    pair_counts: Counter = Counter()
    pair_words: dict[tuple, set] = {}
    for wi, syms in enumerate(words):
        for p, k in _pairs_of(syms).items():
            pair_counts[p] += k * counts[wi]
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic best: max count, then lexicographically smallest pair
        best_pair, best_n = None, -1
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and p < best_pair):
                best_pair, best_n = p, n
        if best_n < min_pair_count:
            break
        merges.append(best_pair)

        affected = pair_words.pop(best_pair, set())
        for wi in sorted(affected):
            old = words[wi]
            new = _merge_word(old, best_pair)
            words[wi] = new
            cnt = counts[wi]
            old_pairs, new_pairs = _pairs_of(old), _pairs_of(new)
            for p in old_pairs.keys() | new_pairs.keys():
                delta = (new_pairs.get(p, 0) - old_pairs.get(p, 0)) * cnt
                if delta:
                    pair_counts[p] = pair_counts.get(p, 0) + delta
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if new_pairs.get(p, 0):
                    pair_words.setdefault(p, set()).add(wi)
                elif p in pair_words:
                    pair_words[p].discard(wi)
        pair_counts.pop(best_pair, None)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    top_words: int | None = 200_000,
    min_pair_count: int = 2,
) -> dict:
    """Train a BPE tokenizer on a document corpus.

    Returns ``{"merges": [(a, b), ...], "vocab": {piece: id}}`` where the
    vocab is base characters (from the top-K word table) followed by
    merge products, ids dense from 0 in deterministic order.  See module
    docstring for the 100 TB decomposition."""
    rows = word_frequencies(df, text_col, top_words).collect()  # bounded top-K
    return bpe_model_from_word_counts(
        [(r["word"], r["n"]) for r in rows], num_merges, min_pair_count
    )


def bpe_model_from_word_counts(
    wc: list, num_merges: int = 1000, min_pair_count: int = 2
) -> dict:
    """Derive the BPE model from an already-reduced (word, count) list —
    shared by :func:`train_bpe` and `streaming.tokenizer`'s folded-state
    path, so batch and streamed models cannot diverge."""
    merges = learn_bpe_merges(wc, num_merges, min_pair_count)

    base = set()
    for w, _ in wc:
        base.update(_symbols(w))
    vocab: dict[str, int] = {}
    for piece in sorted(base):
        vocab[piece] = len(vocab)
    for a, b in merges:
        piece = a + b
        if piece not in vocab:
            vocab[piece] = len(vocab)
    return {"merges": merges, "vocab": vocab}


# ---------------------------------------------------------------------------
# encoding (corpus-scale, Arrow-batched)
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge ALL non-overlapping
    occurrences of the best-ranked (earliest-learned) adjacent pair —
    the exact inverse of the training loop, so training-corpus words
    round-trip to their trained segmentation."""
    if not word:
        return []
    syms = _symbols(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair)
    return list(syms)


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict,
    oov_id: int = -1,
) -> DataFrame:
    """(id, pieces array<string>, piece_ids array<long>, n_bpe_tokens) —
    the corpus encoded with a trained BPE model.

    Arrow-batched pandas UDF (one Python invocation per batch, numpy/
    dict work inside) with a per-batch word memo: each DISTINCT word in
    a batch runs the greedy merge loop once.  The ranks/vocab dicts ride
    the task closure (metadata-scale, broadcast once per executor).
    Characters never seen at training time map to ``oov_id``."""
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    vocab = dict(model["vocab"])

    out_type = T.StructType(
        [
            T.StructField("pieces", T.ArrayType(T.StringType())),
            T.StructField("piece_ids", T.ArrayType(T.LongType())),
        ]
    )

    @F.pandas_udf(out_type)
    def enc(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, list[str]] = {}
        all_pieces, all_ids = [], []
        for t in texts:
            pieces: list[str] = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    memo[w] = got
                pieces.extend(got)
            all_pieces.append(pieces)
            all_ids.append([vocab.get(p, oov_id) for p in pieces])
        return pd.DataFrame({"pieces": all_pieces, "piece_ids": all_ids})

    return df.select(
        F.col(id_col),
        enc(F.col(text_col)).alias("__e"),
    ).select(
        id_col,
        F.col("__e.pieces").alias("pieces"),
        F.col("__e.piece_ids").alias("piece_ids"),
        F.size("__e.pieces").alias("n_bpe_tokens"),
    )


def bpe_token_counts(
    df: DataFrame, id_col: str, text_col: str, model: dict
) -> DataFrame:
    """(id, n_bpe_tokens) — the real-tokenizer count column to feed
    `pack_shards` / `pack_sequences` / `chunk_documents` weight inputs."""
    return bpe_encode(df, id_col, text_col, model).select(id_col, "n_bpe_tokens")


def chunk_by_pieces(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict,
    chunk_pieces: int = 512,
    tokenizer: str = "bpe",
) -> DataFrame:
    """Split documents into chunks budgeted in REAL tokenizer pieces —
    what the training batch actually pays — instead of
    `text.chunk_documents`' whitespace proxy (a code-heavy doc can run
    2-3x pieces-per-word and silently overflow a context window sized
    by whitespace counts).

    ``(id, chunk_id, chunk_text, n_pieces, n_words)`` where word ``i``
    lands in chunk ``floor(pieces_before_i / chunk_pieces)`` — words
    never split, so a chunk can overrun the budget by at most one
    word's pieces (the documented, SQL-replayable boundary rule).

    Plan: distinct word TYPES tokenize once in a broadcast-model
    mapInPandas pass (the `unigram_encode` shape — corpus text never
    enters Python), the (word -> n_pieces) mapping joins back onto the
    exploded corpus, one per-doc window computes the exclusive piece
    prefix, one regroup assembles chunks. ``tokenizer``: "bpe" (greedy
    merge encode) or "unigram" (Viterbi; uncovered words count 1 —
    the ``<unk>`` convention)."""
    import pandas as pd

    from .text import tokens

    if chunk_pieces < 1:
        raise ValueError("chunk_pieces must be >= 1")
    if tokenizer not in ("bpe", "unigram"):
        raise ValueError("tokenizer must be 'bpe' or 'unigram'")
    from pyspark.sql import Window

    spark = df.sparkSession
    if tokenizer == "bpe":
        ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
        b = spark.sparkContext.broadcast(ranks)

        def n_pieces_of(w):
            return len(encode_word(w, b.value))
    else:
        from .unigram import viterbi_segment

        mpl = int(model["max_piece_len"])
        b = spark.sparkContext.broadcast(model["pieces"])

        def n_pieces_of(w):
            segs = viterbi_segment(w, b.value, mpl)
            return len(segs) if segs else 1  # <unk>

    def count_types(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "__np": [n_pieces_of(w) for w in pdf["word"]],
                }
            )

    types = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    mapping = types.mapInPandas(count_types, schema="word string, __np int")
    exploded = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(tokens(text_col), lambda t: t != "")
        ).alias("__pos", "word"),
    ).join(mapping, "word")
    w = Window.partitionBy(id_col).orderBy("__pos")
    prefix = F.coalesce(
        F.sum("__np").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    chunked = exploded.withColumn(
        "chunk_id", F.floor(prefix / F.lit(chunk_pieces)).cast("long")
    )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("word")))
                    ),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("chunk_text"),
            F.sum("__np").cast("long").alias("n_pieces"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )


def save_bpe(spark, model: dict, path: str) -> None:
    """Persist a trained BPE model as parquet (rank-ordered merge table +
    vocab table under one directory) — train once at ingest, reuse
    across every downstream job, the same persisted-artifact contract as
    the LSH index and IVF centroids."""
    import pandas as pd

    merges = pd.DataFrame(
        {
            "rank": range(len(model["merges"])),
            "a": [a for a, _ in model["merges"]],
            "b": [b for _, b in model["merges"]],
        }
    )
    vocab = pd.DataFrame(
        {"piece": list(model["vocab"]), "id": list(model["vocab"].values())}
    )
    spark.createDataFrame(merges, "rank long, a string, b string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/merges")
    spark.createDataFrame(vocab, "piece string, id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/vocab")


def load_bpe(spark, path: str) -> dict:
    merges = [
        (r["a"], r["b"])
        for r in spark.read.parquet(f"{path}/merges").orderBy("rank").collect()
    ]
    vocab = {
        r["piece"]: int(r["id"])
        for r in spark.read.parquet(f"{path}/vocab").collect()
    }
    return {"merges": merges, "vocab": vocab}


def save_bpe_text(model: dict, path: str, spark=None) -> None:
    """Write the model in the PUBLIC interchange layout — ``vocab.json``
    (piece → id) + ``merges.txt`` (``#version: 0.2`` header, one
    space-separated merge per line in rank order) — the file pair GPT-2 /
    RoBERTa ship and HuggingFace ``tokenizers``/`transformers` BPE
    loaders read, with the same word-end convention this trainer already
    uses (Sennrich ``</w>``, i.e. the subword-nmt lineage). A production
    tokenizer exported this way can drive `bpe_token_counts` /
    `pack_shards` budgets directly, and models trained here load into
    standard tooling. Pieces never contain spaces (words are
    whitespace-split upstream), so the line format is unambiguous.

    Goes through the scheme-agnostic Hadoop FS layer (s3a/hdfs/local),
    same as every other persisted artifact."""
    import json as _json

    from ..streaming import state_io

    merges_txt = "#version: 0.2\n" + "".join(
        f"{a} {b}\n" for a, b in model["merges"]
    )
    state_io.write_bytes(
        state_io.join(path, "merges.txt"), merges_txt.encode("utf-8"), spark
    )
    state_io.write_bytes(
        state_io.join(path, "vocab.json"),
        _json.dumps(
            {p: int(i) for p, i in model["vocab"].items()}, ensure_ascii=False
        ).encode("utf-8"),
        spark,
    )


def load_bpe_text(path: str, spark=None) -> dict:
    """Load a ``vocab.json`` + ``merges.txt`` pair (ours or any public
    tokenizer's) back into the engine's model dict. ``vocab.json`` is
    optional in the wild (subword-nmt ships merges only) — when absent,
    the vocab is reconstructed the same way `train_bpe` builds it:
    base symbols first, then merge outputs in rank order."""
    import json as _json

    from ..streaming import state_io

    raw = state_io.read_bytes(state_io.join(path, "merges.txt"), spark)
    if raw is None:
        raise FileNotFoundError(f"no merges.txt under {path}")
    merges = []
    for line in raw.decode("utf-8").splitlines():
        if not line or line.startswith("#"):
            continue
        a, _, b = line.partition(" ")
        merges.append((a, b))
    vraw = state_io.read_bytes(state_io.join(path, "vocab.json"), spark)
    if vraw is not None:
        vocab = {p: int(i) for p, i in _json.loads(vraw.decode("utf-8")).items()}
    else:
        vocab = {}
        for a, b in merges:
            for piece in (a, b, a + b):
                if piece not in vocab:
                    vocab[piece] = len(vocab)
    return {"merges": merges, "vocab": vocab}


def load_hf_tokenizer_json(path: str, spark=None) -> dict:
    """Load a HuggingFace ``tokenizer.json`` (the single-file format the
    ``tokenizers`` library serializes and production tokenizers actually
    ship) into the engine's model dict.

    Reads ``model.vocab`` (piece → id) and ``model.merges`` — accepting
    BOTH public merge encodings: the classic ``"a b"`` strings and the
    ``["a", "b"]`` pairs newer ``tokenizers`` releases write. Added
    tokens (``added_tokens``) are folded into the vocab at their
    declared ids so budget/encode passes see the full id space.
    ``model.type`` may be ``"BPE"`` (returns the merges/vocab dict
    below) or ``"Unigram"`` (returns the `operators.unigram` model dict
    — pieces + log-probs + max_piece_len, tagged ``type: "unigram"`` —
    ready for `unigram_encode`/`unigram_token_counts`); WordPiece has
    different inference rules and is rejected.

    The returned dict is exactly what :func:`load_bpe_text` produces —
    ``{"merges": [(a, b), ...], "vocab": {piece: id}}`` — so an imported
    production tokenizer drives :func:`bpe_encode` /
    :func:`bpe_token_counts` / `pack_shards` budgets unchanged. The
    engine encodes with the Sennrich ``</w>`` word-end convention;
    tokenizers trained with other conventions (GPT-2 byte-level ``Ġ``
    prefixes) import losslessly but their space-marker merges never fire
    in this encoder — check `tokenizer_fertility_report` before
    committing an import to a budget pass. Goes through the
    scheme-agnostic Hadoop FS layer like every other persisted
    artifact."""
    import json as _json

    from ..streaming import state_io

    raw = state_io.read_bytes(path, spark)
    if raw is None:
        raise FileNotFoundError(f"no tokenizer.json at {path}")
    doc = _json.loads(raw.decode("utf-8"))
    model = doc.get("model") or {}
    mtype = model.get("type", "BPE")
    if mtype == "Unigram":
        # the tokenizers-library Unigram shape: vocab is a list of
        # [piece, logprob] pairs (+ optional unk_id). Maps directly onto
        # the #149 model dict — feed to unigram_encode /
        # unigram_token_counts / save_unigram unchanged. SentencePiece-
        # trained vocabs carry the ▁ word-start marker; this engine's
        # single-space words carry none (the Ġ caveat below, same trade).
        pieces = {str(p): float(lp) for p, lp in (model.get("vocab") or [])}
        # added_tokens are deliberately NOT folded into the lattice:
        # HF matches them as pre-split whole tokens BEFORE the model
        # runs, so giving them an in-lattice score (any score — log-prob
        # 0.0 would dominate every real segmentation mid-word) changes
        # Viterbi where the production tokenizer would not; callers that
        # need specials handle them as a pre-split concern
        if not pieces:
            raise ValueError(f"tokenizer.json Unigram model at {path} has no vocab")
        return {
            "type": "unigram",
            "pieces": pieces,
            "max_piece_len": max(len(p) for p in pieces),
        }
    if mtype != "BPE":
        raise ValueError(
            f"tokenizer.json model.type={mtype!r}; only BPE and Unigram are supported"
        )
    merges = []
    for m in model.get("merges", []):
        if isinstance(m, str):
            a, _, b = m.partition(" ")
        else:
            a, b = m[0], m[1]
        merges.append((a, b))
    vocab = {p: int(i) for p, i in (model.get("vocab") or {}).items()}
    for tok in doc.get("added_tokens", []) or []:
        vocab.setdefault(tok["content"], int(tok["id"]))
    if not vocab:
        for a, b in merges:
            for piece in (a, b, a + b):
                if piece not in vocab:
                    vocab[piece] = len(vocab)
    return {"merges": merges, "vocab": vocab}


def tokenizer_fertility_report(
    df: DataFrame,
    model: dict,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer quality: (group, n_docs, n_words, n_tokens,
    n_bytes, fertility, bytes_per_token) where fertility = BPE tokens
    per whitespace word and bytes_per_token = UTF-8 bytes per token —
    the standard "how well does this tokenizer fit this corpus slice"
    report (high fertility on a language slice means the vocab
    under-serves it; compare slices BEFORE committing a tokenizer to a
    training run, especially one imported via `load_bpe_text`).

    Plan: the encode pass is the Arrow-batched distinct-word-memoized
    encoder (`bpe_encode`); everything else is one map-side-combined
    aggregation over (group) — #groups result rows, one tiny shuffle."""
    # bpe_encode carries exactly one id column through — pack the group
    # key and the word/byte counts into a struct so one encode pass
    # feeds the whole aggregation
    src = df.select(
        F.struct(
            F.col(group_col).alias("g"),
            F.size(F.filter(tokens(text_col), lambda t: t != F.lit("")))
            .alias("nw"),
            F.octet_length(text_col).alias("nb"),
        ).alias("__k"),
        F.col(text_col),
    )
    enc = bpe_encode(src, "__k", text_col, model)
    return (
        enc.groupBy(F.col("__k.g").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__k.nw").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_tokens"),
            F.sum("__k.nb").alias("n_bytes"),
        )
        .select(
            group_col,
            "n_docs",
            "n_words",
            "n_tokens",
            "n_bytes",
            F.round(
                F.col("n_tokens") / F.greatest("n_words", F.lit(1)), 6
            ).alias("fertility"),
            F.round(
                F.col("n_bytes") / F.greatest("n_tokens", F.lit(1)), 6
            ).alias("bytes_per_token"),
        )
    )
