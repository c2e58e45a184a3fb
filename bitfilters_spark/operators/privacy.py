"""Re-identification risk audits — k-anonymity / l-diversity.

`text.pii_scan` (#34) finds DIRECT identifiers (emails, phones); this
module audits QUASI-identifiers — the Sweeney 2002 result that made the
field: 87% of the US population is unique on (ZIP, birth date, sex), so
a "de-identified" release re-identifies through joins even with every
direct identifier scrubbed. Training-data pipelines hit the same shape
when exporting structured user metadata next to text: the release gate
is "every quasi-identifier combination is shared by ≥ k rows"
(k-anonymity, Samarati/Sweeney) and — because a k-anonymous group whose
SENSITIVE value is constant still leaks it — "every group carries ≥ l
distinct sensitive values" (l-diversity, Machanavelli et al. 2007).

Spark shape: one map-side-combined groupBy on the quasi columns (the
group table is combination-scale, not row-scale), a second 1-row
aggregate. Exact integers end-to-end — the driver gate replays the
whole audit in SQL with zero tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quasi_identifier_groups", "k_anonymity_report"]


def quasi_identifier_groups(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str | None = None,
) -> DataFrame:
    """(quasi_cols..., n_rows[, n_sensitive]) — one row per
    quasi-identifier combination; ``n_rows`` is that combination's
    anonymity set size (a row's re-identification risk is 1/n_rows),
    ``n_sensitive`` its distinct-sensitive-value count (the l in
    l-diversity). NULLs group as values (a NULL ZIP is itself a
    quasi-identifier state), and a NULL SENSITIVE value counts as one
    distinct sensitive state (r14, ADVICE): "attribute withheld" is
    itself disclosable information, and the alternative — count_distinct
    skipping NULLs — made an all-NULL group read l=0, ambiguous with
    "impossible". No sentinel substitution, so real values can never
    collide with the NULL state. The detail table for drill-down; the
    one-row gate is :func:`k_anonymity_report`."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if sensitive_col is not None:
        s = F.col(sensitive_col)
        aggs.append(
            (
                F.count_distinct(s)
                + F.max(F.when(s.isNull(), 1).otherwise(0))
            ).alias("n_sensitive")
        )
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list,
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """One-row release-gate audit:

    - ``n_rows`` / ``n_groups`` — table size and distinct
      quasi-identifier combinations;
    - ``k_anonymity`` — min group size (the table IS k-anonymous for
      every k ≤ this);
    - ``n_rows_at_risk`` / ``frac_at_risk`` — rows in groups smaller
      than ``k`` (the rows a release at threshold k must suppress or
      generalize);
    - with ``sensitive_col``: ``l_diversity`` — min distinct sensitive
      values over groups (a 1 here means some group's sensitive value
      is fully determined even though the group is k-anonymous).

    All integers except ``frac_at_risk`` (one double division at the
    end — cross-engine exact, the `q_token_budget` convention)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    g = quasi_identifier_groups(df, quasi_cols, sensitive_col)
    aggs = [
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("n_rows").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("n_rows") < k, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_rows_at_risk"),
    ]
    if sensitive_col is not None:
        aggs.append(F.min("n_sensitive").cast("long").alias("l_diversity"))
    return g.agg(*aggs).withColumn(
        "frac_at_risk",
        F.col("n_rows_at_risk").cast("double")
        / F.greatest(F.col("n_rows").cast("double"), F.lit(1.0)),
    )
