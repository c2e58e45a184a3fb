"""A/B the session join posture at 10x stress scale (VERDICT r14 item 3).

The r14 session factory sets `spark.sql.join.preferSortMergeJoin=false`
(static planner preference, trusts size ESTIMATES) on top of the
AQE rewrite `maxShuffledHashJoinLocalMapThreshold=64m` (gated on
MEASURED bytes). The static half is the scale risk: at 100 TB a wrong
estimate builds an unbounded hash map. This tool runs the join-heavy
stress paths — LSH index build + probe, CDC index build + probe,
simhash banded self-join — over the 10x replicated corpus under a named
posture so the two halves can be compared:

    python tools/ab_shj_stress.py static_shj   # r14 posture (both)
    python tools/ab_shj_stress.py aqe_only     # SMJ preference, AQE 64m
    python tools/ab_shj_stress.py smj          # neither (pre-r14)

One JSON line per run. Each posture must run in a fresh process
(planner confs are session-static).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

POSTURES = {
    "static_shj": {},  # session default since r14
    "aqe_only": {"spark.sql.join.preferSortMergeJoin": "true"},
    "smj": {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    },
}


def main(posture: str, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.cdc import build_cdc_index, probe_cdc_index
    from bitfilters_spark.operators.dedup import simhash_near_pairs
    from bitfilters_spark.operators.neardup_index import (
        build_lsh_index,
        probe_lsh_index,
    )
    from bitfilters_spark.session import make_session

    spark = make_session(
        app=f"ab-shj-{posture}", cpus=32, extra_conf=POSTURES[posture]
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix=f"ab_shj_{posture}_")
    out: dict = {"posture": posture, "sf_dir": sf_dir}
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        copies = spark.range(10).select(F.col("id").alias("copy"))
        stress = (
            docs.crossJoin(copies)
            .select(
                (F.col("doc_id") * 10 + F.col("copy")).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit(r"$1_c"), F.col("copy").cast("string")),
                ).alias("text"),
            )
            .localCheckpoint()
        )
        out["n_docs"] = stress.count()

        for t in ("abshj_bands", "abshj_shingles", "abshjc_chunks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        t0 = time.time()
        build_lsh_index(stress, "doc_id", "text", "abshj", path=f"{tmp}/ix")
        out["lsh_build_s"] = round(time.time() - t0, 2)
        probe = stress.where(F.col("doc_id") % 10 == 3)
        t0 = time.time()
        out["lsh_probe_pairs"] = probe_lsh_index(
            spark, probe, "doc_id", "text", "abshj"
        ).count()
        out["lsh_probe_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        build_cdc_index(
            stress.where(F.col("doc_id") % 10 != 3),
            "doc_id", "text", "abshjc", path=f"{tmp}/cdc",
        )
        out["cdc_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        out["cdc_probe_rows"] = probe_cdc_index(
            spark, probe, "doc_id", "text", "abshjc"
        ).count()
        out["cdc_probe_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        out["simhash_pairs"] = simhash_near_pairs(
            stress, "doc_id", "text", max_hamming=8
        ).count()
        out["simhash_s"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
    )
