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
distinct sensitive values" (l-diversity, Machanavelli et al. 2007) —
and, because a group can be l-diverse yet still skewed enough to
disclose (99% of one diagnosis in a group IS a disclosure even with
l=3), "every group's sensitive distribution sits within t of the
global one" (t-closeness, Li/Li/Venkatasubramanian 2007, with total
variation distance as the metric).

Spark shape: one map-side-combined groupBy on the quasi columns (the
group table is combination-scale, not row-scale), a second 1-row
aggregate. Exact integers end-to-end — the driver gate replays the
whole audit in SQL with zero tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quasi_identifier_groups",
    "k_anonymity_report",
    "t_closeness_groups",
    "ordered_t_closeness_groups",
    "t_closeness_report",
]


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


def t_closeness_groups(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
) -> DataFrame:
    """(quasi_cols..., n_rows, tvd_num, tvd) — per quasi-identifier group,
    the total variation distance between the group's sensitive-value
    distribution and the table-wide one (t-closeness, Li et al. 2007:
    an l-diverse group that is 99% one diagnosis still discloses — the
    DISTRIBUTION must stay close to global, not just the value count).

    Exact arithmetic: TVD_g = Σ_v |n_gv·N − N_v·n_g| / (2·n_g·N) — the
    numerator is a pure integer sum (values absent from the group fold
    into one closed-form term n_g·(N − Σ_{v∈g} N_v), so the per-group
    work touches only values the group actually holds), and the single
    final division is cross-engine exact (the repo's one-division
    convention; the driver gate replays the whole audit in SQL with
    zero tolerance). Integer products stay in int64 for n_gv·N up to
    2^63 — beyond ~3·10^9 rows × million-row groups, pre-aggregate.

    NULL sensitive values are one distinct state (the
    :func:`quasi_identifier_groups` convention — SQL GROUP BY gives it
    for free); NULL quasi values group as values. Scale shape: one
    groupBy on (quasi, sensitive) — combination-scale output — one
    value-scale aggregate broadcast back, one group-scale reduce."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    s = sensitive_col
    gv = df.groupBy(*quasi_cols, s).agg(F.count(F.lit(1)).alias("n_gv"))
    # null-SAFE value join: a NULL sensitive state must meet its own
    # global count (a plain equi-join drops NULL=NULL and would silently
    # shift the NULL mass into the absent-values term)
    vt = df.groupBy(F.col(s).alias("__sv")).agg(F.count(F.lit(1)).alias("n_v"))
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    # group size rides every (group, value) row via a window over the
    # quasi partition — NULL quasi keys partition together exactly like
    # groupBy (a re-join on the quasi columns would drop NULL groups:
    # the same null-unsafe-equality trap as the value join above)
    from pyspark.sql import Window

    wg = Window.partitionBy(*quasi_cols)
    terms = (
        gv.withColumn("__n_g", F.sum("n_gv").over(wg).cast("long"))
        .join(F.broadcast(vt), F.col(s).eqNullSafe(F.col("__sv")))
        .crossJoin(F.broadcast(tot))
        .groupBy(*quasi_cols)
        .agg(
            F.sum(
                F.abs(
                    F.col("n_gv") * F.col("n_total")
                    - F.col("n_v") * F.col("__n_g")
                )
            )
            .cast("long")
            .alias("__present"),
            F.sum(F.col("n_v")).cast("long").alias("__nv_present"),
            F.first("__n_g").alias("__n_g"),
            F.first("n_total").alias("n_total"),
        )
    )
    return (
        terms.withColumn(
            "tvd_num",
            (
                F.col("__present")
                + F.col("__n_g") * (F.col("n_total") - F.col("__nv_present"))
            ).cast("long"),
        )
        .select(
            *quasi_cols,
            F.col("__n_g").alias("n_rows"),
            "tvd_num",
            (
                F.col("tvd_num").cast("double")
                / (F.lit(2.0) * F.col("__n_g") * F.col("n_total"))
            ).alias("tvd"),
        )
    )


def ordered_t_closeness_groups(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
) -> DataFrame:
    """(quasi_cols..., n_rows, emd_num, emd) — t-closeness with the
    paper's headline metric for ORDERED sensitive attributes: Earth
    Mover's Distance under unit ground distance between adjacent
    values, EMD_g = (1/(m−1))·Σ_{i<m} |Σ_{j≤i}(p_gj − p_j)| (Li et al.
    2007 §4.2 — for a salary-like attribute, a group holding only the
    two EXTREME salaries is far from global under EMD even when TVD
    reads it as mildly off).

    Same exact-arithmetic discipline as :func:`t_closeness_groups`:
    the cumulative terms C_i = Σ_{j≤i}(n_gj·N − N_j·n_g) are pure
    integers (one ordered cumsum window per group over the m global
    values), and the single division by (m−1)·n_g·N happens once at
    the end. m==1 degenerates to emd = 0.

    Ordering is undefined for NULL, so a NULL sensitive value FAILS
    LOUDLY (use the TVD metric, where NULL is just another state).
    Scale shape: each group materializes all m global values (the
    cumsum needs absent positions) — groups×values rows; for
    high-cardinality sensitive attributes bucket them first (the
    floor()-binning the k-anonymity examples already use)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    from pyspark.sql import Window

    s = sensitive_col
    if df.where(F.col(s).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"ordered t-closeness needs a NULL-free sensitive column; "
            f"'{s}' has NULLs — bin/impute them or use the TVD metric"
        )
    gv = df.groupBy(*quasi_cols, s).agg(F.count(F.lit(1)).alias("n_gv"))
    vt = df.groupBy(F.col(s).alias("__sv")).agg(F.count(F.lit(1)).alias("n_v"))
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    m_cnt = vt.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    # every group gets every global value (cumsum needs absent rows);
    # the n_gv placement join is null-SAFE per quasi column — NULL
    # quasi states are groups too (same trap class as the TVD value
    # join; a plain multi-key join would zero their counts)
    sizes = gv.groupBy(*quasi_cols).agg(
        F.sum("n_gv").cast("long").alias("__n_g")
    )
    gvr = gv.select(
        *[F.col(c).alias(f"__q_{c}") for c in quasi_cols],
        F.col(s).alias("__gs"),
        "n_gv",
    )
    cond = F.col("__sv").eqNullSafe(F.col("__gs"))
    for c in quasi_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__q_{c}"))
    grid = (
        sizes.crossJoin(F.broadcast(vt))
        .join(gvr, cond, "left")
        .withColumn("__n_gv", F.coalesce(F.col("n_gv"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(m_cnt))
    )
    wcum = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__sv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    widx = Window.partitionBy(*quasi_cols).orderBy("__sv")
    cum = grid.withColumn(
        "__c",
        F.sum(
            F.col("__n_gv") * F.col("n_total") - F.col("n_v") * F.col("__n_g")
        ).over(wcum),
    ).withColumn("__i", F.row_number().over(widx))
    # one aggregation, no re-join: the i<m restriction lives INSIDE the
    # sum so m==1 groups still emit a row (emd defined 0 there)
    return cum.groupBy(*quasi_cols).agg(
        F.first("__n_g").alias("n_rows"),
        F.sum(
            F.when(F.col("__i") < F.col("__m"), F.abs(F.col("__c"))).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("emd_num"),
        F.when(F.first("__m") <= 1, F.lit(0.0))
        .otherwise(
            F.sum(
                F.when(
                    F.col("__i") < F.col("__m"), F.abs(F.col("__c"))
                ).otherwise(F.lit(0))
            ).cast("double")
            / (
                (F.first("__m") - 1).cast("double")
                * F.first("__n_g")
                * F.first("n_total")
            )
        )
        .alias("emd"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    t: float = 0.15,
    metric: str = "tvd",
) -> DataFrame:
    """One-row t-closeness release gate: ``n_groups``, ``t_closeness``
    (the max group distance — the table IS t-close for every t ≥ this),
    ``n_groups_over_t`` / ``n_rows_over_t`` (the groups/rows a release
    at threshold ``t`` must generalize further). ``metric="tvd"``
    (categorical sensitive values; the driver-gated path) or ``"emd"``
    (ordered values — see :func:`ordered_t_closeness_groups`). Each
    group's distance is one exact division; max/comparisons of exact
    doubles stay exact cross-engine."""
    if not 0.0 < t <= 1.0:
        raise ValueError("t must be in (0, 1]")
    if metric == "tvd":
        g = t_closeness_groups(df, quasi_cols, sensitive_col)
    elif metric == "emd":
        g = ordered_t_closeness_groups(df, quasi_cols, sensitive_col).select(
            *quasi_cols, "n_rows", F.col("emd").alias("tvd")
        )
    else:
        raise ValueError(f"metric must be 'tvd' or 'emd', got {metric!r}")
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max("tvd").alias("t_closeness"),
        F.sum(F.when(F.col("tvd") > t, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_over_t"),
        F.sum(F.when(F.col("tvd") > t, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_rows_over_t"),
    )
