"""Benchmark harness: runs every implemented query from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE compact JSON line as its FINAL output:
{"metric", "value", "unit", "queries", "sf", ...}.

The per-query detail that does not fit a single short line — the cold
(first-run) times, the scaling curve across SF dirs — is written to
BENCH_CURVE.json next to this script instead of inlined (an inlined curve
once blew past the driver's ~2 KB tail capture and the round lost its
headline number).

Materialization is a noop-sink write (full computation, no driver collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_HERE = os.path.dirname(os.path.abspath(__file__))


def _baseline(sf) -> dict | None:
    """The frozen per-query baseline from BASELINE.md's ```json baseline
    block, or None when absent / recorded at a different SF."""
    try:
        with open(os.path.join(_HERE, "BASELINE.md")) as f:
            m = re.search(r"```json baseline\n(.*?)```", f.read(), re.S)
        if not m:
            return None
        b = json.loads(m.group(1))
        return b if b.get("sf") == sf else None
    except (OSError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as E
    from bitfilters_spark.session import make_session

    # make_session carries the engine's tuned posture, including the 15s
    # periodicGC that keeps ~90 query executions from piling up shuffle
    # state (which dragged tail queries 5-9x)
    spark = make_session(app="bitfilters-bench", cpus=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/py4j warm-up so the first measured query doesn't pay startup costs
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()

    # The first (cold) execution is timed and reported separately: a cluster
    # reading fresh data runs everything cold, and the cold/warm gap is 2-4x
    # on the heavy queries. The gate value stays best-of-N steady-state:
    # sporadic GC pauses / host contention must not distort it.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, fn in E.queries().items():
        import gc

        def _cleanup():
            # operators cache/checkpoint intermediates internally and never
            # unpersist (the DataFrame handle owns the lifetime); dropping
            # them between EXECUTIONS keeps one run's blocks out of the
            # next measurement — without this, cache-heavy plans measured
            # 2-3x their isolated cost by the end of the suite
            spark.catalog.clearCache()
            gc.collect()

        samples = []
        try:
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            cold[name] = round(time.time() - t0, 3)  # cold first run
            for _ in range(runs):
                _cleanup()
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                samples.append(time.time() - t0)
            times[name] = round(min(samples), 3)
        except Exception as ex:  # a failing query must not hide the others
            times[name] = -1.0
            print(f"bench: {name} failed: {ex}", file=sys.stderr)
        _cleanup()

    # ---- scaling curve: one timed run per query at every smaller SF dir
    # (warmed), so super-linear cost growth is measured, not argued.
    # Linear scaling predicts t(sf*10)/t(sf) <= ~10 once past fixed
    # overhead; queries above SUPERLINEAR_RATIO are named in the output.
    # Skipped when the SF dir name carries no sf (no ratio is computable).
    SUPERLINEAR_RATIO = 10.0
    curve: dict[str, dict] = {}
    superlinear: dict[str, float] = {}
    if sf is not None and os.environ.get("SPARK_GRAFT_CURVE", "1") != "0":
        base = os.path.dirname(sf_dir.rstrip("/")) or "/root/testdata"
        smaller = []
        for cand in ("sf0.001", "sf0.01", "sf0.1"):
            d = os.path.join(base, cand)
            csf = float(cand[2:])
            if os.path.isdir(d) and csf < sf:
                smaller.append((csf, d))
        for name, fn in E.queries().items():
            if times.get(name, -1) < 0:
                continue
            curve[name] = {str(sf): times[name]}
            for csf, d in smaller:
                try:
                    fn(spark, d).write.mode("overwrite").format("noop").save()
                    spark.catalog.clearCache()
                    t0 = time.time()
                    fn(spark, d).write.mode("overwrite").format("noop").save()
                    curve[name][str(csf)] = round(time.time() - t0, 3)
                except Exception as ex:
                    print(f"bench curve: {name}@{d} failed: {ex}", file=sys.stderr)
                spark.catalog.clearCache()
            pts = sorted((float(s), t) for s, t in curve[name].items())
            for (s0, t0_), (s1, t1_) in zip(pts, pts[1:]):
                if t0_ > 0.05 and s1 / s0 <= 10.001:
                    ratio = t1_ / t0_
                    if ratio > SUPERLINEAR_RATIO:
                        superlinear[name] = round(ratio, 2)

    ok = [v for v in times.values() if v >= 0]

    # Full detail to a side file; keep the stdout line small enough for the
    # driver's tail capture.
    detail = {
        "sf": sf,
        "cpus": int(cpus),
        "runs": runs,
        "best_of_n": times,
        "cold_first_run": cold,
        "scale_curve": curve,
        "superlinear_over_10x": superlinear,
    }
    try:
        with open(os.path.join(_HERE, "BENCH_CURVE.json"), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError as ex:
        print(f"bench: could not write BENCH_CURVE.json: {ex}", file=sys.stderr)

    # Delta vs the standing baseline (BASELINE.md): the gate's "within 2x
    # of BASELINE at the same SF" comparison, computed here so every run
    # self-reports its position. Per-query regressions go to stderr (the
    # final stdout line must stay short and single).
    out = {
        "metric": "sum_query_seconds",
        "value": round(sum(ok), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": int(cpus),
        "n_queries": len(times),
        "n_failed": len(times) - len(ok),
        "cold_sum_seconds": round(sum(cold.values()), 3),
        "superlinear_over_10x": superlinear,
        "detail_file": "BENCH_CURVE.json",
    }
    base = _baseline(sf)
    if base:
        out["baseline_warm_sum"] = base["warm_sum_s"]
        out["vs_baseline"] = round(sum(ok) / base["warm_sum_s"], 3)
        regressed = {
            q: (t, base["queries"][q])
            for q, t in times.items()
            # >0.5s AND >1.5x: below either bound is machine noise at sf0.1
            if q in base["queries"]
            and t - base["queries"][q] > 0.5
            and t > 1.5 * base["queries"][q]
        }
        for q, (t, b) in sorted(regressed.items()):
            print(f"bench: {q} {b:.2f}s -> {t:.2f}s vs baseline", file=sys.stderr)

    # FINAL line (driver contract): one compact JSON object. Per-query
    # best-of-N times stay inline (the driver records them); everything
    # bulky lives in BENCH_CURVE.json.
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
