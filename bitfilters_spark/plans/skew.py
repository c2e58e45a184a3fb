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
