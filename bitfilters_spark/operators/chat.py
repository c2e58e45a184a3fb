"""SFT / chat-data preparation: conversations as data, not text.

Instruction-tuning corpora arrive as message lists — ``array<struct<role
string, content string>>`` — and the pipeline needs to (a) render them to
the template string the tokenizer will see, (b) know WHICH token spans
are assistant output (the loss mask — training on user/system tokens is
the classic SFT bug), (c) dedup at conversation granularity, and (d)
gate on structural health (role alternation, empty turns). All four are
pure JVM expression work over the message arrays — no UDF, no shuffle
beyond what the caller composes (dedup reuses `dedup_exact`'s single
hash shuffle).

Span accounting (the subtle part): spans are indices into
``chat_tokens(rendered)`` — \\s+ whitespace tokenization (NOT
`text.tokens`, which splits on single spaces per the corpus-table
convention; rendered chat is newline-structured). ChatML renders a
message as ``<|im_start|>role\\ncontent<|im_end|>\\n``; the content's
last token ABUTS ``<|im_end|>`` (no whitespace), so they merge into one
whitespace-token. The math stays exact by counting each segment as
``1 + token_count(content || '<|im_end|>')`` (header ``<|im_start|>role``
is one merged token; the concat reproduces the merge — an empty content
yields exactly 1). The assistant span therefore INCLUDES the merged
end-marker token, which is also the standard loss-mask choice: the model
must learn to EMIT the end-of-turn marker. The span-vs-slice law is
pytest-pinned: slicing ``tokens(rendered)`` by each span reproduces
``tokens(content || '<|im_end|>')`` exactly, for every conversation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text

__all__ = [
    "chat_tokens",
    "render_chat",
    "assistant_token_spans",
    "chat_stats",
    "dedup_conversations",
]

_TEMPLATES = ("chatml", "plain")


def chat_tokens(col) -> Column:
    """\\s+ whitespace tokens of rendered chat text. NOT `text.tokens`
    (which splits on single spaces — the corpus tables are single-space
    separated, but rendered chat text is newline-structured, so "\\n"
    must separate). Spans from :func:`assistant_token_spans` index into
    THIS tokenization; slice with it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def _ws_count(c: Column) -> Column:
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))


def _seg_text(m: Column, template: str) -> Column:
    # role coalesced to '': a NULL role must not NULL the whole concat
    # (array_join would then silently SKIP the segment while the span
    # counter still advanced — every later span would misalign)
    role = F.coalesce(m["role"], F.lit(""))
    if template == "chatml":
        return F.concat(
            F.lit("<|im_start|>"), role, F.lit("\n"),
            F.coalesce(m["content"], F.lit("")), F.lit("<|im_end|>\n"),
        )
    return F.concat(
        role, F.lit(": "), F.coalesce(m["content"], F.lit("")), F.lit("\n")
    )


def _seg_tokens(m: Column, template: str) -> Column:
    """Whitespace-token count of one rendered segment, merge-exact (see
    module docstring). The header is counted by the SAME concat-and-
    split rule as the content — a role containing whitespace (or NULL)
    renders as more (or fewer) tokens than one, and assuming 1 would
    shift every later span."""
    role = F.coalesce(m["role"], F.lit(""))
    if template == "chatml":
        return (
            _ws_count(F.concat(F.lit("<|im_start|>"), role))
            + _ws_count(
                F.concat(
                    F.coalesce(m["content"], F.lit("")), F.lit("<|im_end|>")
                )
            )
        ).cast("int")
    # plain: "role: content\n" — content tokens never merge with the
    # header (the ": " separator) nor with the newline
    return (
        _ws_count(F.concat(role, F.lit(":")))
        + _ws_count(F.coalesce(m["content"], F.lit("")))
    ).cast("int")


def render_chat(
    df: DataFrame,
    messages_col: str = "messages",
    template: str = "chatml",
    out_col: str = "text",
) -> DataFrame:
    """Render each conversation to the template string the tokenizer
    will see (``chatml``: ``<|im_start|>role\\ncontent<|im_end|>\\n``
    per message; ``plain``: ``role: content\\n``). One
    ``array_join(transform(...))`` — scan-speed, no shuffle."""
    if template not in _TEMPLATES:
        raise ValueError(f"template must be one of {_TEMPLATES}")
    return df.withColumn(
        out_col,
        F.array_join(
            F.transform(F.col(messages_col), lambda m: _seg_text(m, template)),
            "",
        ),
    )


def assistant_token_spans(
    df: DataFrame,
    messages_col: str = "messages",
    template: str = "chatml",
    out_col: str = "spans",
    role: str = "assistant",
) -> DataFrame:
    """Half-open whitespace-token index ranges ``array<struct<start int,
    end int>>`` into ``chat_tokens(render_chat(...))`` covering each
    ``role`` message's content (+ its merged end marker under chatml) —
    the loss mask. One higher-order ``aggregate`` runs a running token
    counter over the message array; no shuffle, no UDF."""
    if template not in _TEMPLATES:
        raise ValueError(f"template must be one of {_TEMPLATES}")
    empty_spans = F.array().cast("array<struct<start:int,end:int>>")
    zero = F.struct(
        F.lit(0).cast("int").alias("cum"), empty_spans.alias("spans")
    )

    def step(acc, m):
        role_c = F.coalesce(m["role"], F.lit(""))
        if template == "chatml":
            head_t = _ws_count(F.concat(F.lit("<|im_start|>"), role_c))
        else:
            head_t = _ws_count(F.concat(role_c, F.lit(":")))
        seg_t = _seg_tokens(m, template)
        span = F.struct(
            (acc["cum"] + head_t).cast("int").alias("start"),
            (acc["cum"] + seg_t).cast("int").alias("end"),
        )
        return F.struct(
            (acc["cum"] + seg_t).cast("int").alias("cum"),
            F.when(
                m["role"] == role, F.concat(acc["spans"], F.array(span))
            )
            .otherwise(acc["spans"])
            .alias("spans"),
        )

    return df.withColumn(
        out_col,
        F.aggregate(F.col(messages_col), zero, step, lambda acc: acc["spans"]),
    )


def chat_stats(
    df: DataFrame, messages_col: str = "messages"
) -> DataFrame:
    """Structural health columns for gating: ``n_turns``,
    ``n_assistant`` / ``n_user``, ``n_empty`` (NULL/blank contents),
    ``alternates`` (after an optional leading system message, roles
    strictly alternate user/assistant starting with user — the shape
    most SFT trainers assume), ``ends_assistant``. Pure expressions."""
    msgs = F.col(messages_col)
    body = F.when(
        (F.size(msgs) > 0)
        & (F.element_at(msgs, 1)["role"] == "system"),
        F.slice(msgs, 2, F.greatest(F.size(msgs) - 1, F.lit(0))),
    ).otherwise(msgs)
    alternates = F.forall(
        F.zip_with(
            body,
            F.sequence(F.lit(0), F.greatest(F.size(body) - 1, F.lit(0))),
            lambda m, i: m["role"]
            == F.when(i % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")),
        ),
        lambda ok: ok,
    ) & (F.size(body) > 0)
    count_role = lambda r: F.size(F.filter(msgs, lambda m: m["role"] == r))
    return df.select(
        "*",
        F.size(msgs).alias("n_turns"),
        count_role("assistant").alias("n_assistant"),
        count_role("user").alias("n_user"),
        F.size(
            F.filter(
                msgs,
                lambda m: m["content"].isNull()
                | (F.trim(m["content"]) == ""),
            )
        ).alias("n_empty"),
        alternates.alias("alternates"),
        F.when(
            F.size(msgs) > 0,
            F.element_at(msgs, -1)["role"] == "assistant",
        )
        .otherwise(F.lit(False))
        .alias("ends_assistant"),
    )


def dedup_conversations(
    df: DataFrame,
    id_col: str,
    messages_col: str = "messages",
    normalize: bool = True,
) -> DataFrame:
    """Exact conversation dedup: the canonical key hashes the
    (role, content) sequence — content piped through `normalize_text`
    by default so whitespace/case/punct-spacing variants of the same
    conversation collapse — and `dedup_exact` keeps the min-id winner
    per key (its one 8-byte-hash shuffle). Unit-separator joins keep
    ("a", "bc") distinct from ("ab", "c")."""
    from .dedup import dedup_exact

    content = lambda m: (
        normalize_text(F.coalesce(m["content"], F.lit("")))
        if normalize
        else F.coalesce(m["content"], F.lit(""))
    )
    # role is coalesced like content: a NULL role would NULL the whole
    # element and array_join SKIPS null elements, collapsing two
    # distinct conversations onto one key (the exact hazard _seg_text's
    # own coalesce defends against)
    key = F.array_join(
        F.transform(
            F.col(messages_col),
            lambda m: F.concat(
                F.coalesce(m["role"], F.lit("")), F.lit("\x1f"), content(m)
            ),
        ),
        "\x1e",
    )
    return dedup_exact(df.withColumn("__ckey", key), "__ckey", id_col).drop(
        "__ckey"
    )
