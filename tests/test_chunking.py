"""Document chunking: coverage/overlap semantics, edge cases, DuckDB
parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.text import chunk_documents

DOCS = [
    (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
    (2, "a b c"),  # shorter than one chunk
    (3, "x"),  # single token
    (4, None),  # no rows
]


def test_non_overlapping_chunks_partition_the_doc(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"]) for r in out}
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t4 t5 t6 t7", 4)
    assert got[(1, 2)] == ("t8 t9", 2)  # short tail
    assert got[(2, 0)] == ("a b c", 3)
    assert got[(3, 0)] == ("x", 1)
    assert not any(d == 4 for d, _ in got)  # null text -> no rows
    # reassembling non-overlapping chunks reproduces the doc
    joined = " ".join(got[(1, c)][0] for c in range(3))
    assert joined == DOCS[0][1]


def test_overlap_carries_context(spark):
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    out = chunk_documents(
        df, "doc_id", "text", chunk_tokens=4, overlap=2
    ).collect()
    got = {r["chunk_id"]: r["chunk_text"] for r in out}
    # stride 2: starts 0,2,4,6,8
    assert got[0] == "t0 t1 t2 t3"
    assert got[1] == "t2 t3 t4 t5"
    assert got[4] == "t8 t9"
    # consecutive chunks share exactly `overlap` tokens
    assert got[0].split()[-2:] == got[1].split()[:2]


def test_bad_params_raise(spark):
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


@pytest.mark.parametrize("chunk,overlap", [(4, 0), (5, 2), (3, 1)])
def test_duckdb_parity(spark, chunk, overlap):
    df = spark.createDataFrame(
        [d for d in DOCS if d[1] is not None], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=chunk, overlap=overlap
        ).collect()
    }
    stride = chunk - overlap
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [d for d in DOCS if d[1] is not None]
    )
    want = {
        (d, c): (txt, n)
        for d, c, txt, n in con.sql(
            f"""
            WITH tok AS (
              SELECT doc_id, string_split(text, ' ') AS ts FROM t),
            starts AS (
              SELECT doc_id, ts,
                     unnest(generate_series(0, len(ts) - 1, {stride})) AS s
              FROM tok)
            SELECT doc_id, s // {stride} AS chunk_id,
                   array_to_string(ts[s+1:s+{chunk}], ' ') AS chunk_text,
                   least({chunk}, len(ts) - s) AS n_tokens
            FROM starts
            """
        ).fetchall()
    }
    assert got == want


# ------------------------------------------------------ token encoding ---


def test_encode_documents_order_and_oov(spark):
    """Token ids come back in document order, OOV tokens take the oov id,
    and the counts are exact; repartitioning can't disturb the order."""
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.text import encode_documents

    vocab = spark.createDataFrame(
        [("hello", 1), ("world", 2), ("spark", 3)], "token string, rank long"
    )
    docs = spark.createDataFrame(
        [
            (1, "hello world hello mystery"),
            (2, "spark"),
            (3, "unknown only tokens"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"], r["n_oov"])
        for r in encode_documents(docs, "doc_id", "text", vocab).collect()
    }
    assert got[1] == ([1, 2, 1, 0], 4, 1)
    assert got[2] == ([3], 1, 0)
    assert got[3] == ([0, 0, 0], 3, 3)
    rep = {
        r["doc_id"]: list(r["token_ids"])
        for r in encode_documents(
            docs.repartition(7), "doc_id", "text", vocab
        ).collect()
    }
    assert rep == {k: v[0] for k, v in got.items()}


def test_encode_documents_feeds_pack_sequences(spark):
    """The intended composition: vocab -> encode -> pack by n_tokens."""
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.packing import pack_sequences
    from bitfilters_spark.operators.text import encode_documents

    docs = spark.createDataFrame(
        [(i, "a b c d e"[: 2 * ((i % 3) + 1) - 1]) for i in range(30)],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate("abcde")], "token string, rank long"
    )
    enc = encode_documents(docs, "doc_id", "text", vocab)
    packed = pack_sequences(enc, "doc_id", "n_tokens", capacity=8)
    joined = packed.join(enc.select("doc_id", "token_ids"), "doc_id")
    rows = joined.collect()
    assert len(rows) == 30
    fills = {}
    for r in rows:
        assert len(r["token_ids"]) == r["n_tokens"]
        fills[r["seq"]] = fills.get(r["seq"], 0) + r["n_tokens"]
    assert all(v <= 8 for v in fills.values())
