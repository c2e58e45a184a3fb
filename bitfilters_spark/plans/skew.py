"""Skew mitigation helpers.

AQE's skew-join splitting (on in ``session.make_session``) handles most
cases at runtime; ``salted_join`` is the explicit variant for when a few
keys are SO hot that even split partitions overwhelm a task — the classic
fact-with-hot-keys x small-dim shape. The dim side is replicated
``n_salts`` times; each fact row picks one deterministic salt, so each hot
key spreads over ``n_salts`` tasks. Result is row-identical to the plain
join (salts join 1-of-N replicas, never duplicate matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """``fact JOIN dim`` with the shuffle key salted ``n_salts`` ways.

    The fact salt is derived from the whole row (xxhash64 over all fact
    columns), so it is deterministic and uniform without requiring a row
    id. Use when one fact key carries a disproportionate share of rows;
    for even keys prefer the plain join (salting replicates the dim side
    n_salts x).
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    cond = (salted_fact[fact_key] == salted_dim[dim_key]) & (
        salted_fact["__salt"] == salted_dim["__salt"]
    )
    return salted_fact.join(salted_dim, cond, how).drop("__salt")


def skew_report(df: DataFrame, key_col: str, top_k: int = 20) -> dict:
    """Diagnose join/groupBy key skew before paying for a bad shuffle:
    returns ``{n_rows, n_keys, top: [(key, count, share)...],
    max_share, skew_factor}`` where ``skew_factor`` is the heaviest
    key's count over the mean per-key count (1.0 = perfectly even).

    One map-side-combined count aggregate; the top-k plans as
    TakeOrderedAndProject (per-partition top-k, no global sort) and only
    ``top_k + 2`` scalars reach the driver. Rule of thumb: a skew_factor
    in the hundreds on a join key means AQE skew-split territory; in the
    thousands, reach for ``salted_join`` or pre-thin the hot keys.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    top = counts.orderBy(F.col("__n").desc(), F.col(key_col)).limit(top_k).collect()
    agg = counts.agg(
        F.sum("__n").alias("rows"), F.count(F.lit(1)).alias("keys")
    ).collect()[0]
    n_rows, n_keys = int(agg["rows"] or 0), int(agg["keys"] or 0)
    if n_rows == 0:
        return {"n_rows": 0, "n_keys": 0, "top": [], "max_share": 0.0,
                "skew_factor": 1.0}
    mean = n_rows / n_keys
    top_list = [
        (r[key_col], int(r["__n"]), round(int(r["__n"]) / n_rows, 6))
        for r in top
    ]
    return {
        "n_rows": n_rows,
        "n_keys": n_keys,
        "top": top_list,
        "max_share": top_list[0][2] if top_list else 0.0,
        "skew_factor": round(top_list[0][1] / mean, 2) if top_list else 1.0,
    }


def shuffle_report(df: DataFrame) -> dict:
    """Static plan audit: how much data movement will this DataFrame pay?

    Returns ``{n_exchanges, n_broadcasts, n_sorts, n_codegen_spans,
    exchange_keys: [partitioning-expression strings…]}`` parsed from the
    physical plan (pre-execution — nothing runs). ``n_codegen_spans`` is
    best-effort: with AQE on, WholeStageCodegen stars only annotate the
    FINAL plan, so it reads 0 until the DataFrame has executed once —
    re-call after an action to see the realized spans. The per-operator
    discipline this engine applies by hand ("would this plan survive a
    100x scale-up?") as a callable: assert ``n_exchanges`` in tests,
    print it in notebooks before launching a 100 TB job, diff it across
    refactors. Pairs with :func:`skew_report` (is the shuffle key safe?)
    and ``cms_join_size`` (how big is the join?) as the pre-flight
    toolkit."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    # codegen spans (*(n)) only annotate the spark-plan after codegen prep,
    # not the AQE-wrapped formatted tree
    plan = buf.getvalue() + df._jdf.queryExecution().executedPlan().toString()
    # formatted tree prints "Exchange (3)"; hashpartitioning args live in
    # the details section
    keys = [
        m.group(1)
        for m in re.finditer(r"Arguments: hashpartitioning\(([^)]*)\)", plan)
    ]
    return {
        # ReusedExchange re-reads an existing shuffle's output — no new
        # data movement, so it doesn't count
        "n_exchanges": len(
            re.findall(r"(?<!Broadcast)(?<!Reused)Exchange \(\d+\)", plan)
        ),
        "n_broadcasts": len(
            re.findall(
                r"Broadcast(?:Exchange|HashJoin|NestedLoopJoin) \(\d+\)", plan
            )
        ),
        "n_sorts": len(re.findall(r"(?<!Merge)\bSort \(\d+\)", plan)),
        "n_codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "exchange_keys": keys,
    }
