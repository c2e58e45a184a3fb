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
