"""Standalone per-query A/B profiler for the optimization rounds.

Times one or more queries() entries exactly the way bench.py does (noop
sink, clearCache between executions, cold + best-of-N warm) without
paying for the whole 50-query suite. Usage:

    python tools/prof_query.py q_pagerank q_contamination [--runs 3]

Reads $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py so numbers
are comparable run-to-run on the same host window.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    extra_conf = {}
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
        elif a.startswith("--conf="):  # --conf=spark.x.y=v, repeatable
            k, v = a.split("=", 1)[1].split("=", 1)
            extra_conf[k] = v
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from bitfilters_spark.session import make_session

    spark = make_session(app="prof-query", cpus=cpus, extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()

    qs = E.queries()
    out: dict[str, dict] = {}
    for name in args:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"prof:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        cold = time.time() - t0
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
        spark.catalog.clearCache()
        out[name] = {
            "cold": round(cold, 3),
            "warm_best": round(min(samples), 3),
            "warm_all": [round(s, 3) for s in samples],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
