"""Exact substring (token-span) dedup — the corpus-wide "duplicated
text regions" operator from Lee et al. 2022, *Deduplicating Training
Data Makes Language Models Better* (arXiv:2107.06499), re-expressed at
token-n-gram granularity for a distributed engine.

Every n-token gram that occurs at more than one ``(id, position)`` in
the corpus is *duplicated text* everywhere except its first occurrence
(lowest ``(id, position)``).  Flagged gram starts covering
``[pos, pos + n)`` merge into maximal spans per document; the removal
variant rebuilds each document's text with those spans cut out, leaving
the first copy of every region intact corpus-wide.

Scale posture (100 TB): the reference implementation builds a suffix
array over the whole corpus — a global sort of every suffix, which has
no cheap distributed analog.  The n-gram formulation keeps the same
"remove repeated substrings of length >= L" contract (L = n tokens)
with Spark-native primitives: grams become 8-byte ``xxhash64`` keys at
the explode (token text never shuffles), the winner election is a
map-side-partial ``min(struct(id, pos))`` aggregate — identical shape
to :func:`~bitfilters_spark.operators.dedup.dedup_paragraphs`'s winner
election, so a 10^8-copy boilerplate gram partial-aggregates instead of
hot-spotting one task — and span merging is one per-document window
(every interval has the same length n, so "start <= previous start + n"
is an exact merge test; same lag + cumulative-sum shape as
``sessionize``).  One shuffle for the election, one for the per-doc
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import hashed_word_shingles, tokens


def _flagged_starts(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, pos) of every duplicated n-gram occurrence that is NOT the
    corpus-wide first (lowest (id, pos)) occurrence of that gram."""
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(hashed_word_shingles(F.col(text_col), n)).alias(
            "__pos", "__h"
        ),
    )
    # filter to DUPLICATED grams before the join: the build side shrinks
    # from |distinct grams| to |duplicated grams| — in a mostly-clean
    # corpus that's a tiny fraction and AQE broadcasts it, removing the
    # occurrence-side shuffle entirely; on a repetition-heavy corpus the
    # plan degrades gracefully to the same shuffle join as before. Rows
    # whose gram has c == 1 could never survive the post-join filter.
    winners = (
        ex.groupBy("__h")
        .agg(
            F.min(F.struct("__id", "__pos")).alias("__w"),
            F.count(F.lit(1)).alias("__c"),
        )
        .where(F.col("__c") > 1)
    )
    return (
        ex.join(winners, "__h")
        .where(
            ~(
                (F.col("__id") == F.col("__w.__id"))
                & (F.col("__pos") == F.col("__w.__pos"))
            )
        )
        .select("__id", "__pos")
    )


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns ``(id_col, span_start, span_end, n_grams)`` with token-index
    spans ``[span_start, span_end)`` (0-based): the merged union of
    ``[pos, pos + n)`` over every non-first duplicated gram occurrence.
    Documents containing no duplicated region produce no rows.
    """
    flagged = _flagged_starts(df, id_col, text_col, n)
    w = Window.partitionBy("__id").orderBy("__pos")
    prev = F.lag("__pos").over(w)
    is_new = F.when(prev.isNull() | (F.col("__pos") > prev + n), 1).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = flagged.withColumn("__span", F.sum(is_new).over(wcum))
    return spans.groupBy("__id", "__span").agg(
        F.min("__pos").alias("span_start"),
        (F.max("__pos") + n).alias("span_end"),
        F.count(F.lit(1)).alias("n_grams"),
    ).select(
        F.col("__id").alias(id_col), "span_start", "span_end", "n_grams"
    )


def dup_token_coverage(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Per-document count of tokens inside duplicated spans (0 for clean
    docs) — ``sum(span_end - span_start)``, i.e. |union of [pos, pos+n)|.
    The scalar profile of :func:`duplicated_spans`, exactly SQL-checkable.
    """
    spans = duplicated_spans(df, id_col, text_col, n)
    cov = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens")
    )
    return (
        df.select(id_col)
        .join(cov, id_col, "left")
        .select(
            id_col, F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens")
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_span_tokens: int = 0,
) -> DataFrame:
    """Rewrite ``text_col`` with every duplicated span's tokens removed
    (the first corpus-wide copy of each region survives).  Null text
    passes through; token positions outside every span rejoin with a
    single space.  Document text shuffles once, in the rebuild join.

    ``min_span_tokens`` only removes spans at least that long (the Lee
    et al. setup removes repeats of >= 50 tokens; short incidental
    matches — common phrases — are kept), mirroring
    ``dedup_paragraphs``'s ``min_chars`` bypass one level down.
    """
    all_spans = duplicated_spans(df, id_col, text_col, n)
    if min_span_tokens > 0:
        all_spans = all_spans.where(
            F.col("span_end") - F.col("span_start") >= min_span_tokens
        )
    spans = all_spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = tokens(F.col(text_col))
    empty = F.array().cast("array<struct<span_start:int,span_end:int>>")
    sp = F.coalesce(F.col("__spans"), empty)
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            sp,
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    rebuilt = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(F.array_join(kept, " "))
    return (
        df.join(spans, id_col, "left")
        .withColumn(text_col, rebuilt)
        .drop("__spans")
    )
