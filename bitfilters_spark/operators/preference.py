"""Preference-data (DPO / RLHF reward-model) preparation: pairs as data.

Alignment corpora arrive as (prompt, chosen, rejected) triples and the
pipeline needs to (a) gate structural health (empty/identical sides —
a pair whose two responses are equal carries zero preference signal and
some trainers NaN on it), (b) measure LENGTH BIAS — the classic reward
hack: if `chosen` is systematically longer, a reward model learns
"longer is better" (Singhal et al. 2023's length-correlation audit) —
(c) dedup at pair AND prompt granularity (duplicated prompts leak
gradient weight onto one distribution mode), (d) check prompt leakage
against an eval set, and (e) render both branches to the template
string the trainer tokenizes (one shared prompt prefix + two assistant
continuations — the DPO input shape).

Everything is pure JVM expression work over the pair rows; dedup reuses
`dedup_exact`'s single hash shuffle; leakage is one broadcast-or-shuffle
join on normalized prompt identity. Token counts use the \\s+ chat
tokenization (`chat.chat_tokens`) — preference text is newline-
structured like rendered chat, not the single-space corpus convention
(the `chat.py` trap, pinned there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .chat import _seg_text, _ws_count
from .text import normalize_text

__all__ = [
    "preference_stats",
    "length_bias_report",
    "dedup_preference_pairs",
    "preference_prompt_leakage",
    "render_preference",
]


def _wc(c: Column) -> Column:
    return _ws_count(F.coalesce(c, F.lit("")))


def preference_stats(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """Adds per-pair integrity/signal columns:

    - ``n_prompt`` / ``n_chosen`` / ``n_rejected`` — \\s+ token counts;
    - ``len_delta`` = n_chosen − n_rejected (the length-bias signal,
      positive when the preferred side is longer);
    - ``identical`` — chosen == rejected after whitespace-trim (zero
      preference signal; drop or audit);
    - ``degenerate`` — any side NULL/blank, or prompt blank (a pair a
      DPO loss cannot use);
    - ``pref_ok`` — the standard keep gate: not identical, not
      degenerate."""
    ch = F.coalesce(F.col(chosen_col), F.lit(""))
    rj = F.coalesce(F.col(rejected_col), F.lit(""))
    pr = F.coalesce(F.col(prompt_col), F.lit(""))
    identical = F.trim(ch) == F.trim(rj)
    degenerate = (
        (F.trim(pr) == "") | (F.trim(ch) == "") | (F.trim(rj) == "")
    )
    return (
        df.withColumn("n_prompt", _wc(pr).cast("long"))
        .withColumn("n_chosen", _wc(ch).cast("long"))
        .withColumn("n_rejected", _wc(rj).cast("long"))
        .withColumn(
            "len_delta", (F.col("n_chosen") - F.col("n_rejected")).cast("long")
        )
        .withColumn("identical", identical)
        .withColumn("degenerate", degenerate)
        .withColumn("pref_ok", ~identical & ~degenerate)
    )


def length_bias_report(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """One-row corpus audit of the length-for-preference confound:
    ``n_pairs``, ``n_ok`` (pref_ok pairs — all other columns are over
    these), ``n_chosen_longer`` / ``n_rejected_longer`` / ``n_len_tied``
    and ``mean_len_delta``. A healthy preference corpus sits near 50/50
    with mean_len_delta ≈ 0; a large skew predicts a length-hacking
    reward model BEFORE any training run spends GPUs. One map-side
    aggregation, no shuffle beyond the final 1-row combine."""
    s = preference_stats(df, prompt_col, chosen_col, rejected_col)
    ok = F.col("pref_ok")
    oklong = ok.cast("long")
    return s.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(oklong).alias("n_ok"),
        F.sum((ok & (F.col("len_delta") > 0)).cast("long")).alias(
            "n_chosen_longer"
        ),
        F.sum((ok & (F.col("len_delta") < 0)).cast("long")).alias(
            "n_rejected_longer"
        ),
        F.sum((ok & (F.col("len_delta") == 0)).cast("long")).alias(
            "n_len_tied"
        ),
        F.avg(F.when(ok, F.col("len_delta"))).alias("mean_len_delta"),
    )


def dedup_preference_pairs(
    df: DataFrame,
    id_col: str,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    granularity: str = "pair",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup at ``granularity``:

    - ``"pair"`` — key is (prompt, chosen, rejected): the same pair
      collected twice trains twice (a silent 2× gradient weight);
    - ``"prompt"`` — key is the prompt alone: keep ONE pair per prompt
      (min id wins, `dedup_exact`'s winner election) so a prompt
      over-sampled by the collection pipeline cannot dominate.

    Unit-separator joins keep ("a","bc") distinct from ("ab","c");
    every field is NULL-coalesced BEFORE the concat (the `chat.py`
    array_join NULL-skip class). ``normalize`` folds whitespace/case
    via `normalize_text` so trivial variants collapse."""
    from .dedup import dedup_exact

    if granularity not in ("pair", "prompt"):
        raise ValueError("granularity must be 'pair' or 'prompt'")
    fields = [prompt_col] if granularity == "prompt" else [
        prompt_col, chosen_col, rejected_col
    ]
    parts = []
    for c in fields:
        v = F.coalesce(F.col(c), F.lit(""))
        parts.append(normalize_text(v) if normalize else v)
    key = F.concat_ws("\x1f", *parts)
    return dedup_exact(df.withColumn("__pkey", key), "__pkey", id_col).drop(
        "__pkey"
    )


def preference_prompt_leakage(
    df: DataFrame,
    eval_prompts: DataFrame,
    prompt_col: str = "prompt",
    eval_prompt_col: str = "prompt",
    normalize: bool = True,
) -> DataFrame:
    """Adds ``leaked`` — the pair's prompt appears (normalized) in the
    eval prompt set: training a preference model on eval prompts
    inflates win-rates exactly like benchmark contamination inflates
    accuracy. Identity is the normalized prompt's 64-bit hash (8-byte
    join keys); the eval side aggregates to distinct hashes first, so
    the join's build side is eval-scale."""
    p = F.coalesce(F.col(prompt_col), F.lit(""))
    e = F.coalesce(F.col(eval_prompt_col), F.lit(""))
    if normalize:
        p, e = normalize_text(p), normalize_text(e)
    ev = (
        eval_prompts.select(F.xxhash64(e).alias("__ph"))
        .distinct()
        .withColumn("__leak", F.lit(True))
    )
    # no broadcast hint: eval sets are usually broadcastable (AQE picks
    # that itself) but the operator must survive ones that are not
    return (
        df.withColumn("__ph", F.xxhash64(p))
        .join(ev, "__ph", "left")
        .withColumn("leaked", F.coalesce(F.col("__leak"), F.lit(False)))
        .drop("__ph", "__leak")
    )


def render_preference(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    template: str = "chatml",
) -> DataFrame:
    """Adds ``text_chosen`` / ``text_rejected`` — the two branches
    rendered as (user: prompt, assistant: response) under the `chat.py`
    template, SHARING the prompt prefix byte-for-byte (the DPO trainer
    contract: log-prob deltas are over the continuation only, so the
    prefixes must be identical — guaranteed here by construction, both
    branches concat the SAME rendered prompt segment)."""
    if template not in ("chatml", "plain"):
        raise ValueError("template must be 'chatml' or 'plain'")

    def seg(role: str, content: Column) -> Column:
        m = F.struct(
            F.lit(role).alias("role"),
            F.coalesce(content, F.lit("")).alias("content"),
        )
        return _seg_text(m, template)

    prefix = seg("user", F.col(prompt_col))
    return df.withColumn(
        "text_chosen", F.concat(prefix, seg("assistant", F.col(chosen_col)))
    ).withColumn(
        "text_rejected",
        F.concat(prefix, seg("assistant", F.col(rejected_col))),
    )
