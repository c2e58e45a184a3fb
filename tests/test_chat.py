"""SFT/chat-data operators (operators/chat.py): template rendering, the
span-vs-slice law for assistant loss masks, structural stats, and
conversation dedup."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.chat import (
    assistant_token_spans,
    chat_stats,
    dedup_conversations,
    render_chat,
)

SCHEMA = "conv_id long, messages array<struct<role string, content string>>"

CONVS = [
    (1, [("system", "be helpful"), ("user", "hi there"), ("assistant", "hello friend")]),
    (2, [("user", "what is 2+2"), ("assistant", "4"), ("user", "and 3+3"), ("assistant", "6 of course")]),
    (3, [("user", "empty answer"), ("assistant", "")]),
    (4, [("assistant", "starts wrong")]),
    (5, []),
]


def _df(spark):
    return spark.createDataFrame(CONVS, SCHEMA)


def test_render_chat_templates(spark):
    out = {r["conv_id"]: r["text"] for r in render_chat(_df(spark)).collect()}
    assert out[1] == (
        "<|im_start|>system\nbe helpful<|im_end|>\n"
        "<|im_start|>user\nhi there<|im_end|>\n"
        "<|im_start|>assistant\nhello friend<|im_end|>\n"
    )
    assert out[5] == ""
    plain = {
        r["conv_id"]: r["text"]
        for r in render_chat(_df(spark), template="plain").collect()
    }
    assert plain[2].startswith("user: what is 2+2\nassistant: 4\n")
    with pytest.raises(ValueError, match="template"):
        render_chat(_df(spark), template="bogus")


@pytest.mark.parametrize("template", ["chatml", "plain"])
def test_spans_slice_law(spark, template):
    """For EVERY conversation: slicing tokens(rendered) by each span
    reproduces the assistant content's own tokens (merge-exact under
    chatml, where the last content token absorbs <|im_end|>)."""
    df = assistant_token_spans(
        render_chat(_df(spark), template=template), template=template
    )
    rows = df.collect()
    for r in rows:
        toks = r["text"].split()
        assistant_contents = [
            m["content"] for m in r["messages"] if m["role"] == "assistant"
        ]
        assert len(r["spans"]) == len(assistant_contents)
        for span, content in zip(r["spans"], assistant_contents):
            got = toks[span["start"] : span["end"]]
            if template == "chatml":
                want = (content + "<|im_end|>").split()
            else:
                want = content.split()
            assert got == want, (r["conv_id"], template, content)
    # spans are within bounds and ordered
    for r in rows:
        n = len(r["text"].split())
        last = 0
        for s in r["spans"]:
            assert 0 <= s["start"] <= s["end"] <= n
            assert s["start"] >= last
            last = s["end"]


def test_spans_feed_loss_mask_composition(spark):
    """The use case: spans mark exactly the tokens a trainer keeps loss
    on — everything outside the spans is prompt/template."""
    df = assistant_token_spans(render_chat(_df(spark))).where("conv_id = 2")
    r = df.collect()[0]
    toks = r["text"].split()
    masked = set()
    for s in r["spans"]:
        masked.update(range(s["start"], s["end"]))
    kept = [toks[i] for i in sorted(masked)]
    assert kept == ["4<|im_end|>", "6", "of", "course<|im_end|>"]
    # no user/system token is ever inside a span
    for i, t in enumerate(toks):
        if "user" in t or "system" in t:
            assert i not in masked


def test_chat_stats_gates(spark):
    got = {r["conv_id"]: r for r in chat_stats(_df(spark)).collect()}
    assert got[1]["n_turns"] == 3 and got[1]["n_assistant"] == 1
    assert got[1]["alternates"] and got[1]["ends_assistant"]
    assert got[2]["alternates"] and got[2]["n_user"] == 2
    assert got[3]["n_empty"] == 1
    assert not got[4]["alternates"]  # assistant-first body
    assert got[5]["n_turns"] == 0 and not got[5]["alternates"]
    assert not got[5]["ends_assistant"]


def test_dedup_conversations(spark):
    rows = [
        (1, [("user", "Hello,  World"), ("assistant", "hi")]),
        (2, [("user", "hello world"), ("assistant", "HI")]),   # normalized dup of 1
        (3, [("user", "hello"), ("assistant", "world hi")]),   # different split
        (4, [("user", "hello world hi")]),                     # different roles
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    kept = sorted(
        r["conv_id"] for r in dedup_conversations(df, "conv_id").collect()
    )
    assert kept == [1, 3, 4]
    # normalize=False keeps the case/punct variant
    raw = sorted(
        r["conv_id"]
        for r in dedup_conversations(df, "conv_id", normalize=False).collect()
    )
    assert raw == [1, 2, 3, 4]


def test_chat_to_packing_composition(spark):
    """render -> spans -> token budget: the rendered text's token count
    equals the span arithmetic's total (cum), so pack_shards budgets
    computed on the rendered column agree with the mask math."""
    df = assistant_token_spans(render_chat(_df(spark)))
    rows = df.select(
        "conv_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n1"),
        F.col("text"),
        F.col("spans"),
    ).collect()
    for r in rows:
        n_tokens = len(r["text"].split())
        for s in r["spans"]:
            assert s["end"] <= n_tokens


def test_masked_packing_composition(spark):
    """chat -> spans -> pack_sequences -> materialize_masked_sequences:
    the packed loss_mask selects exactly the assistant tokens of every
    packed conversation, across document boundaries."""
    from bitfilters_spark.operators.chat import chat_tokens
    from bitfilters_spark.operators.packing import (
        materialize_masked_sequences,
        pack_sequences,
    )

    convs = spark.createDataFrame(
        [c for c in CONVS if c[1]], SCHEMA
    )  # non-empty conversations
    rendered = assistant_token_spans(render_chat(convs))
    encoded = rendered.select(
        "conv_id",
        "messages",
        F.transform(chat_tokens("text"), lambda t: F.xxhash64(t)).alias(
            "token_ids"
        ),
        "spans",
    )
    # weight budgets the +1 eos separator per doc
    weighted = encoded.withColumn(
        "w", F.size("token_ids") + 1
    ).coalesce(1)  # one partition: deterministic packing for the assert
    assignment = pack_sequences(weighted, "conv_id", "w", capacity=64)
    packed = materialize_masked_sequences(
        assignment, encoded, "conv_id", eos_id=-1, pad_to=64, pad_id=0
    )
    rows = packed.collect()
    assert sum(r["n_docs"] for r in rows) == 4
    # reference: recompute each conversation's masked tokens in Python
    want_masked = []
    for r in rendered.collect():
        toks = r["text"].split()
        for s in r["spans"]:
            want_masked.extend(toks[s["start"] : s["end"]])
    # gather masked token ids from the packed rows
    got_ids = []
    for r in rows:
        assert len(r["loss_mask"]) == len(r["token_ids"]) == 64
        for tid, m in zip(r["token_ids"], r["loss_mask"]):
            if m:
                got_ids.append(tid)
    # hash the expected tokens the same way
    want_ids = [
        r["h"]
        for r in spark.createDataFrame([(t,) for t in want_masked], "t string")
        .select(F.xxhash64("t").alias("h"))
        .collect()
    ]
    assert sorted(got_ids) == sorted(want_ids)
    # eos separators and padding are never masked
    for r in rows:
        for tid, m in zip(r["token_ids"], r["loss_mask"]):
            if tid in (-1, 0):
                assert m == 0


def test_spans_survive_null_and_whitespace_roles(spark):
    """A NULL role must not silently drop the rendered segment while the
    span counter advances past it, and a role containing whitespace must
    count as its real token width — both would misalign every later
    span (code-review finding)."""
    rows = [
        (1, [
            (None, "sys note"),
            ("assistant helper", "multi role turn"),
            ("user", "q"),
            ("assistant", "final answer"),
        ]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    for template in ("chatml", "plain"):
        r = assistant_token_spans(
            render_chat(df, template=template), template=template,
        ).collect()[0]
        toks = r["text"].split()
        # only the exact role 'assistant' matches; its span must slice
        # to its own content despite the weird earlier segments
        assert len(r["spans"]) == 1
        s = r["spans"][0]
        want = (
            ("final answer<|im_end|>").split()
            if template == "chatml"
            else "final answer".split()
        )
        assert toks[s["start"]:s["end"]] == want, template


def test_masked_and_unmasked_materialize_agree(spark):
    """materialize_masked_sequences must stay token-for-token identical
    to materialize_sequences (same regroup, eos, padding) — the masked
    twin duplicates the plan, so the agreement is pinned (code-review
    finding #10)."""
    from bitfilters_spark.operators.packing import (
        materialize_masked_sequences,
        materialize_sequences,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [
            (1, [10, 11, 12], [(0, 2)]),
            (2, [20], []),
            (3, [30, 31, 32, 33, 34], [(1, 3)]),
        ],
        "doc_id long, token_ids array<long>, "
        "spans array<struct<start:int,end:int>>",
    )
    weighted = docs.withColumn("w", F.size("token_ids") + 1).coalesce(1)
    assignment = pack_sequences(weighted, "doc_id", "w", capacity=8)
    plain = {
        r["seq"]: (list(r["token_ids"]), r["n_docs"], r["n_tokens"])
        for r in materialize_sequences(
            assignment, docs, "doc_id", eos_id=-1, pad_to=8
        ).collect()
    }
    masked = {
        r["seq"]: (list(r["token_ids"]), r["n_docs"], r["n_tokens"])
        for r in materialize_masked_sequences(
            assignment, docs, "doc_id", eos_id=-1, pad_to=8
        ).collect()
    }
    assert plain == masked


def test_dedup_conversations_null_role_distinct(spark):
    """NULL-role key regression (ADVICE r11): a null-role message must
    not vanish from the dedup key (array_join skips null elements), so
    a conversation containing one stays DISTINCT from the same
    conversation without it."""
    rows = [
        (1, [("user", "hello"), (None, "hello"), ("assistant", "hi")]),
        (2, [("user", "hello"), ("assistant", "hi")]),
        (3, [(None, "x")]),
        (4, [("", "x")]),  # empty-string role: same key as null role is
                           # acceptable, but both must differ from NO row
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    kept = sorted(
        r["conv_id"] for r in dedup_conversations(df, "conv_id").collect()
    )
    # 1 and 2 both survive (the null-role message distinguishes them);
    # 3/4 collapse onto one key (role coalesced to ""), min-id wins
    assert kept == [1, 2, 3]
