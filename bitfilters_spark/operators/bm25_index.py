"""Persisted BM25 inverted index: rank incoming query sets against a
reference corpus WITHOUT rescanning it — the retrieval twin of the
persisted LSH near-dup index (`neardup_index.py`).

`text.bm25_scores` re-derives tf / doc lengths / df on every call —
correct, but at 100 TB the corpus side dominates and rarely changes
between query batches. This module splits that cost:

* :func:`build_bm25_index` — one-time corpus scan persisting a BUCKETED,
  token-sorted postings table ``<name>_postings`` (token, id, tf, dl —
  the doc length is DENORMALIZED into the posting row, the classic
  norm-in-postings layout, so query time needs no doc-length join), a
  vocabulary table ``<name>_vocab`` (token, df), and a 1-row
  ``<name>_stats`` (n_docs, avgdl). Bucketing + in-bucket token sort
  pre-pay the probe-time work: a query's postings live in known buckets,
  in sorted runs parquet min/max stats prune to.
* :func:`bm25_query_index` — scores a query set against the index: the
  tiny query-term set is BROADCAST and pushed into the postings scan as
  an ``In`` filter (map-side; non-matching postings never leave the
  scan), df rides a broadcast join of the (query-term-filtered)
  vocabulary, and the per-(query, doc) sum map-side-combines. Cost ∝
  postings of the query terms, never ∝ corpus size.

Composition law (pytest, tests/test_signals.py): ``bm25_query_index``
over a built index returns EXACTLY ``bm25_scores`` on the same corpus —
both paths share :func:`text.bm25_contribution`, so the float operation
order is identical and the equality is bit-exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import write_bucketed
from .text import bm25_contribution, tokens


def build_bm25_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    name: str,
    num_buckets: int = 32,
    path: str | None = None,
) -> dict:
    """Build and persist the index; returns its stats dict
    ``{"n_docs": float, "avgdl": float}`` (also persisted). ``path``
    makes the tables EXTERNAL (data under ``path/<table>``, bucket
    metadata in the catalog) — same contract as the LSH index; without
    it the managed warehouse location must not already hold an orphaned
    directory for the name."""
    spark = df.sparkSession
    for suffix in ("postings", "vocab", "stats"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
    stats_row = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col)).cast("long")).alias("avgdl"),
    ).collect()[0]
    n_docs = float(stats_row["n_docs"])
    avgdl = float(stats_row["avgdl"]) if stats_row["avgdl"] is not None else 1.0

    postings = (
        df.select(
            F.col(id_col).alias("id"),
            F.size(tokens(text_col)).cast("long").alias("dl"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .groupBy("token", "id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    write_bucketed(
        postings.select("token", "id", "tf", "dl"),
        f"{name}_postings",
        ["token"],
        num_buckets=num_buckets,
        sort_cols=["token"],
        path=f"{path}/{name}_postings" if path else None,
    )
    vocab = (
        spark.table(f"{name}_postings")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    write_bucketed(
        vocab,
        f"{name}_vocab",
        ["token"],
        num_buckets=num_buckets,
        path=f"{path}/{name}_vocab" if path else None,
    )
    sw = spark.createDataFrame(
        [(n_docs, avgdl)], "n_docs double, avgdl double"
    ).write.mode("overwrite")
    if path:
        sw = sw.option("path", f"{path}/{name}_stats")
    sw.saveAsTable(f"{name}_stats")
    return {"n_docs": n_docs, "avgdl": avgdl}


def bm25_query_index(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, id, score) for every (query, doc) pair sharing a term —
    identical rows to ``bm25_scores`` on the indexed corpus."""
    stats = spark.table(f"{name}_stats").collect()[0]
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    qtok = queries.select(
        F.col(query_id_col), F.explode(tokens(query_text_col)).alias("token")
    ).distinct()
    # the term list is collected once (queries are small by contract) so
    # the postings scan gets a LITERAL In-filter it can push to parquet
    # row groups — a broadcast join alone cannot prune the scan
    terms = [r["token"] for r in qtok.select("token").distinct().collect()]
    postings = spark.table(f"{name}_postings").where(F.col("token").isin(terms))
    vocab = spark.table(f"{name}_vocab").where(F.col("token").isin(terms))
    hits = postings.join(F.broadcast(qtok), "token").join(
        F.broadcast(vocab), "token"
    )
    contrib = bm25_contribution(n_docs, avgdl, k1, b)
    return hits.groupBy(query_id_col, "id").agg(
        F.round(F.sum(contrib), 6).alias("score")
    )
