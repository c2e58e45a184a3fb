"""Single-node throughput comparison vs DuckDB: time every oracle-backed
query BOTH ways — the Spark DataFrame implementation and the equivalent
ANSI SQL on DuckDB — over the same parquet at the same SF.

The reference engine is a DuckDB extension, so DuckDB running the oracle
SQL is the closest 'reference single-node throughput' stand-in we can
measure in this container. This is deliberately an UNFAIR baseline for
Spark at bench scale (DuckDB runs a fused vectorized plan with zero task
scheduling; Spark pays per-stage/task overhead that only amortizes at
real data sizes) — the interesting signals are the ratio's trend across
SFs and any query where Spark is slower by far more than that fixed
overhead explains.

Usage: python tools/duckdb_compare.py [sf_dir] [runs] [block] [only]
``block`` names the section of DUCKDB_COMPARE.json to write: "main"
(default — the top-level summary/queries, preserving any other blocks)
or e.g. "stress" (merged under that key, for the 10x corpus from
tools/make_stress_sf.py). ``only`` is a comma-list restricting the
query set — at stress scale the O(n^2) brute-force oracles
(q_simhash_pairs, q_embed_neardup_pairs, ...) are excluded because
DuckDB would grind on billions of pairs; the point of the block is the
real-work queries where the crossover shows.
Prints one summary JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    block = sys.argv[3] if len(sys.argv) > 3 else "main"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    import duckdb

    import __spark_entry__ as E
    from bitfilters_spark.session import make_session

    spark = make_session(app="duckdb-compare", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.isdir(p):  # Spark-written dataset directory
            p = os.path.join(p, "*.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    out: dict = {}
    for name, fn in qs.items():
        if name not in osql or (only is not None and name not in only):
            continue
        row: dict = {}
        try:
            import gc

            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts = []
            for _ in range(runs):
                # same hygiene as bench.py: drop cached/checkpointed blocks
                # from the previous execution so they don't inflate the next
                spark.catalog.clearCache()
                gc.collect()
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                ts.append(time.time() - t0)
            row["spark_s"] = round(min(ts), 3)
        except Exception as ex:
            row["spark_err"] = str(ex)[:200]
        duck_budget = float(os.environ.get("DUCK_TIMEOUT_S", "0")) or None

        def duck_run():
            if duck_budget is None:
                con.sql(osql[name]).fetchall()
                return
            import threading

            timer = threading.Timer(duck_budget, con.interrupt)
            timer.start()
            try:
                con.sql(osql[name]).fetchall()
            finally:
                timer.cancel()

        try:
            duck_run()
            ts = []
            for _ in range(runs):
                t0 = time.time()
                duck_run()
                ts.append(time.time() - t0)
            row["duckdb_s"] = round(min(ts), 3)
        except Exception as ex:
            msg = str(ex)[:200]
            if duck_budget is not None and (
                "INTERRUPT" in msg.upper() or "interrupted" in msg
            ):
                # a timeout IS the measurement: DuckDB could not finish
                # inside the budget the Spark side beat
                row["duckdb_err"] = f"timeout: exceeded {duck_budget:.0f}s budget"
            else:
                row["duckdb_err"] = msg
        if "spark_s" in row and "duckdb_s" in row and row["duckdb_s"] > 0:
            row["ratio"] = round(row["spark_s"] / row["duckdb_s"], 2)
        out[name] = row
        print(name, row, file=sys.stderr)

    ok = [r for r in out.values() if "ratio" in r]
    spark_total = round(sum(r["spark_s"] for r in ok), 3)
    duck_total = round(sum(r["duckdb_s"] for r in ok), 3)
    summary = {
        "sf_dir": sf_dir,
        "runs": runs,
        "n_compared": len(ok),
        "spark_total_s": spark_total,
        "duckdb_total_s": duck_total,
        "total_ratio": round(spark_total / duck_total, 2) if duck_total else None,
        "median_ratio": sorted(r["ratio"] for r in ok)[len(ok) // 2] if ok else None,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "DUCKDB_COMPARE.json")
    doc: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            doc = {}
    # merge at query level so a long sweep can run in batches (``only``)
    # without wiping the block's other rows; drop rows for queries that
    # no longer exist so consolidations can't leave stale entries behind
    prev = (
        doc.get("queries", {}) if block == "main"
        else doc.get(block, {}).get("queries", {})
    )
    prev = {q: r for q, r in prev.items() if q in qs}
    prev.update(out)
    ok_all = [r for r in prev.values() if "ratio" in r]
    st = round(sum(r["spark_s"] for r in ok_all), 3)
    dt = round(sum(r["duckdb_s"] for r in ok_all), 3)
    merged_summary = {
        "sf_dir": sf_dir,
        "runs": runs,
        "n_compared": len(ok_all),
        "spark_total_s": st,
        "duckdb_total_s": dt,
        "total_ratio": round(st / dt, 2) if dt else None,
        "median_ratio": sorted(r["ratio"] for r in ok_all)[len(ok_all) // 2]
        if ok_all
        else None,
    }
    if block == "main":
        doc["summary"], doc["queries"] = merged_summary, prev
        summary = merged_summary
    else:
        doc[block] = {"summary": merged_summary, "queries": prev}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc[block]["summary"] if block != "main" else summary))


if __name__ == "__main__":
    main()
