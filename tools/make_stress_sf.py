"""Build a coherent 10x stress-scale table directory from sf0.1 — the
scale where Spark's per-stage overhead amortizes and the parallel plans
should overtake DuckDB's fused single-node pipeline.

Every table is the union of ``copies`` key-remapped replicas, remapped
COHERENTLY so joins still resolve (o_orderkey and l_orderkey shift
together, o_custkey follows c_custkey, ...). Text-bearing replicas get
per-copy token suffixes (the SURVEY stress methodology): shingle
structure per copy is isomorphic to the original but copies don't
cross-match, so dedup pair volume scales linearly instead of
quadratically — the honest way to scale a dedup benchmark. Embedding
replicas are rotated by copy-dependent sign flips (norm-preserving), so
cosine near-dup copies don't cross-match either. Events remap user_id
per copy so sessions replicate instead of interleaving.

Usage: ``python tools/make_stress_sf.py OUT_DIR [SF_DIR] [COPIES]``
(defaults: /root/testdata/sf0.1, 10). Writes one parquet per table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_dir: str, sf_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from bitfilters_spark.session import make_session

    spark = make_session(app="make-stress-sf", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    cdf = spark.range(copies).select(F.col("id").alias("__copy"))

    def replicate(table: str, remap: dict):
        """Union of `copies` replicas: `remap` maps column -> lambda(col,
        copy) producing the shifted key; everything else passes through."""
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        rep = df.crossJoin(F.broadcast(cdf))
        cols = [
            remap[c](F.col(c), F.col("__copy")).cast(dtype).alias(c)
            if c in remap
            else F.col(c)
            for c, dtype in df.dtypes
        ]
        rep.select(*cols).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )

    t0 = time.time()
    shift = lambda col, copy: col * copies + copy  # noqa: E731
    stats = {}

    # dimension tables stay as-is: FKs keep resolving, group-bys keep
    # their cardinality (25 nations at 100 TB too)
    for t in ("region", "nation"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")
        stats[t] = "copied"

    replicate("customer", {"c_custkey": shift})
    replicate("supplier", {"s_suppkey": shift})
    replicate("part", {"p_partkey": shift})
    replicate("orders", {"o_orderkey": shift, "o_custkey": shift})
    replicate(
        "lineitem",
        {"l_orderkey": shift, "l_partkey": shift, "l_suppkey": shift},
    )
    replicate("events", {"event_id": shift, "user_id": shift})

    # documents: per-copy token suffix so copies never cross-match in
    # shingle/minhash space (suffix each whitespace token with c<copy>)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = docs.crossJoin(F.broadcast(cdf))
    rep.select(
        (F.col("doc_id") * copies + F.col("__copy")).alias("doc_id"),
        F.when(F.col("__copy") == 0, F.col("text"))
        .otherwise(
            F.regexp_replace(
                F.col("text"),
                r"(\S+)",
                F.concat(F.lit(r"$1x"), F.col("__copy").cast("string")),
            )
        )
        .alias("text"),
        "lang",
        "source",
        F.length(
            F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    r"(\S+)",
                    F.concat(F.lit(r"$1x"), F.col("__copy").cast("string")),
                )
            )
        ).alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # embeddings: norm-preserving per-copy sign flips (deterministic by
    # dimension parity vs copy) so cosine copies don't cross-match
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rep = emb.crossJoin(F.broadcast(cdf))
    flipped = F.zip_with(
        "embedding",
        F.transform(
            F.sequence(F.lit(0), F.size("embedding") - 1),
            lambda i: F.when(
                (i % (F.col("__copy") + 1)) % 2 == 1, F.lit(-1.0)
            ).otherwise(F.lit(1.0)),
        ),
        lambda v, s: v * s,
    )
    rep.select(
        (F.col("vec_id") * copies + F.col("__copy")).alias("vec_id"),
        F.when(F.col("__copy") == 0, F.col("embedding"))
        .otherwise(flipped.cast("array<float>"))
        .alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    for t in (
        "customer supplier part orders lineitem events documents embeddings"
    ).split():
        stats[t] = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
    print(
        json.dumps(
            {
                "out_dir": out_dir,
                "copies": copies,
                "build_s": round(time.time() - t0, 1),
                "rows": stats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf",
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
        int(sys.argv[3]) if len(sys.argv) > 3 else 10,
    )
