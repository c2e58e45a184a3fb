"""A/B the substring-dedup winner election at 10x stress with planted
boilerplate (VERDICT r14 item 6).

`dup_token_coverage` elects each gram's corpus-wide first occurrence
with a map-side-partial `min(struct(id, pos))` aggregate + join — the
skew-safe shape: a boilerplate gram repeated 10^8 times partial-
aggregates instead of landing in one task. The faster-looking
alternative is a window `row_number() over (partition by gram)` which
puts EVERY occurrence of a hot gram in one task. This tool plants a
shared boilerplate sentence in every document of the 10x corpus
(~500k occurrences per boilerplate gram) and times both shapes on the
same input; it also checks they produce the identical total coverage.

    python tools/ab_dup_election.py [sf_dir]

One JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main(sf_dir: str) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.substring import dup_token_coverage
    from bitfilters_spark.operators.text import hashed_word_shingles
    from bitfilters_spark.session import make_session

    spark = make_session(app="ab-dup-election", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    copies = spark.range(10).select(F.col("id").alias("copy"))
    boiler = "this corpus wide boilerplate legal notice repeats in every single document verbatim"
    stress = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * 10 + F.col("copy")).alias("doc_id"),
            F.concat(
                F.lit(boiler + " "),
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit(r"$1_c"), F.col("copy").cast("string")),
                ),
            ).alias("text"),
        )
        .localCheckpoint()
    )
    out: dict = {"sf_dir": sf_dir, "n_docs": stress.count()}

    n = 5

    def run_agg() -> tuple[float, int]:
        t0 = time.time()
        total = (
            dup_token_coverage(stress, "doc_id", "text", n=n)
            .agg(F.sum("dup_tokens"))
            .collect()[0][0]
        )
        return round(time.time() - t0, 2), int(total)

    def run_window() -> tuple[float, int]:
        """Same contract, window election: rn=1 is the corpus-wide first
        (id, pos) occurrence; every other row of a duplicated gram is
        flagged. One window puts all occurrences of a gram in one task."""
        t0 = time.time()
        ex = stress.select(
            F.col("doc_id").alias("__id"),
            F.posexplode(hashed_word_shingles(F.col("text"), n)).alias(
                "__pos", "__h"
            ),
        )
        w = Window.partitionBy("__h").orderBy("__id", "__pos")
        flagged = (
            ex.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > 1)
            .select("__id", "__pos")
        )
        wd = Window.partitionBy("__id").orderBy("__pos")
        prev = F.lag("__pos").over(wd)
        is_new = F.when(
            prev.isNull() | (F.col("__pos") > prev + n), 1
        ).otherwise(0)
        wcum = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spans = flagged.withColumn("__span", F.sum(is_new).over(wcum))
        cov = spans.groupBy("__id", "__span").agg(
            (F.max("__pos") + n - F.min("__pos")).alias("c")
        )
        total = cov.agg(F.sum("c")).collect()[0][0]
        return round(time.time() - t0, 2), int(total)

    # interleave A/B/A/B so window drift hits both shapes equally
    a1, tot_a = run_agg()
    b1, tot_b = run_window()
    a2, _ = run_agg()
    b2, _ = run_window()
    out.update(
        {
            "agg_join_s": [a1, a2],
            "window_s": [b1, b2],
            "coverage_agg": tot_a,
            "coverage_window": tot_b,
            "identical": tot_a == tot_b,
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
