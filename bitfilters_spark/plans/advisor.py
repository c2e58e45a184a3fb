"""Sketch-driven join planning: size and shape a join BEFORE paying for
its shuffle.

The engine's sketches each answer one pre-flight question — CMS inner
product: how many output rows (`core/cms.py cms_join_size`); KMV:
how many distinct keys on each side and how much they overlap
(`core/kmv.py kmv_overlap`); the count aggregate behind ``skew_report``:
is any key hot. :func:`join_plan_report` runs them together from ONE
metadata-scale pass per side and emits the numbers plus the strategy a
planner would pick — the DataFrame-level analog of what a cost-based
optimizer does with table statistics, usable when there are no collected
stats (fresh intermediate results, external parquet).

Everything here is an upper-bound or estimate with known direction:
join_size only overcounts (CMS collisions add cross terms), KMV
under-full counts are exact, and the skew factor is exact. Cost: two
scans (one per side) shuffling sketch blobs and top-k scalars only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import skew_report


def join_plan_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    broadcast_threshold_rows: int = 1_000_000,
    skew_factor_salt: float = 1000.0,
    cms_d: int = 4,
    cms_w: int = 1 << 15,
    kmv_k: int = 4096,
) -> dict:
    """Returns ``{est_join_rows, left: {n_rows, n_keys, skew_factor,
    top_key}, right: {...}, key_jaccard, recommendation, reasons}``.

    ``est_join_rows`` is the CMS inner-product UPPER bound;
    ``key_jaccard`` the KMV overlap estimate of the two key sets (a
    near-zero value flags a join that will mostly produce nothing — a
    semi-join/bloom pre-filter candidate). ``recommendation`` is one of
    ``broadcast_left`` / ``broadcast_right`` / ``salted`` /
    ``shuffle_hash_or_sort_merge`` with human-readable ``reasons``.

    Bound tightness is the CMS error ``~ n_left * n_right / cms_w``
    (sf0.1 orders x customer: 46% over at the default w = 2^15, 5% at
    2^18); widen ``cms_w`` when the decision rides on the estimate —
    the blob stays metadata-scale either way.
    """
    from ..core.cms import cms_join_size
    from ..core.kmv import kmv_overlap
    from ..functions.filters import build_filter

    def side(df: DataFrame, key: str) -> dict:
        keyed = df.select(F.xxhash64(F.col(key)).alias("h"))
        cms_blob = bytes(
            build_filter(keyed, [], "h", "cms", d=cms_d, w=cms_w)
            .collect()[0]["filter"]
        )
        kmv_blob = bytes(
            build_filter(keyed, [], "h", "kmv", k=kmv_k).collect()[0]["filter"]
        )
        sk = skew_report(df, key, top_k=1)
        return {
            "n_rows": sk["n_rows"],
            "n_keys": sk["n_keys"],
            "skew_factor": sk["skew_factor"],
            "top_key": sk["top"][0][0] if sk["top"] else None,
            "_cms": cms_blob,
            "_kmv": kmv_blob,
        }

    L, R = side(left, left_key), side(right, right_key)
    est = cms_join_size(L.pop("_cms"), R.pop("_cms"))
    k_eff, both, union_est = kmv_overlap(L.pop("_kmv"), R.pop("_kmv"))
    # under-full sketches hold the WHOLE union (union_est exact and
    # < k_eff): the jaccard sample is that union, not k
    sample_n = min(k_eff, union_est)
    jac = both / sample_n if sample_n else 0.0

    reasons = []
    if R["n_rows"] <= broadcast_threshold_rows and R["n_rows"] <= L["n_rows"]:
        rec = "broadcast_right"
        reasons.append(
            f"right side has {R['n_rows']} rows (<= {broadcast_threshold_rows}): "
            "map-side hash join, zero shuffle of the big side"
        )
    elif L["n_rows"] <= broadcast_threshold_rows:
        rec = "broadcast_left"
        reasons.append(
            f"left side has {L['n_rows']} rows (<= {broadcast_threshold_rows})"
        )
    elif max(L["skew_factor"], R["skew_factor"]) >= skew_factor_salt:
        hot = L if L["skew_factor"] >= R["skew_factor"] else R
        rec = "salted"
        reasons.append(
            f"key {hot['top_key']!r} carries {hot['skew_factor']}x the mean "
            "per-key rows: one task would own it — use salted_join or AQE "
            "skew split"
        )
    else:
        rec = "shuffle_hash_or_sort_merge"
        reasons.append("both sides large, keys even: plain shuffled join")
    if jac < 0.05 and min(L["n_keys"], R["n_keys"]) > 0:
        reasons.append(
            f"key sets barely overlap (jaccard ~ {jac:.3f}): pre-filter with "
            "a bloom of the smaller key set (plans.bloom_prefiltered_join) "
            "before any shuffle"
        )
    return {
        "est_join_rows": est,
        "left": L,
        "right": R,
        "key_jaccard": round(jac, 4),
        "recommendation": rec,
        "reasons": reasons,
    }
