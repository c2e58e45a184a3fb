"""Edit-distance (fuzzy) join — record linkage / entity resolution (#103).

``fuzzy_join(left, right, col, max_dist)`` finds all cross pairs with
Levenshtein distance <= ``max_dist`` WITHOUT a cartesian product, via
PassJoin-style pigeonhole blocking (Li/Deng/Feng 2011, "PASS-JOIN: a
partition-based method for similarity joins"):

  If lev(s, t) <= d, then splitting s into d+1 contiguous segments,
  at least one segment is untouched by all d edits and appears EXACTLY
  in t, at a start position shifted by at most d.

So: the left side emits its d+1 segments keyed by (len(s), i, segment);
the right side emits, for every candidate left-length l within d of
len(t) and every segment slot i, the substrings of t of the segment's
length starting within +-d of the segment's position. Candidates meet
in an EQUI-join on (l, i, substring) — the only wide op — and the exact
``F.levenshtein`` (JVM) verifies inside the join. Recall is COMPLETE
(the pigeonhole argument is exhaustive); precision is exact (verify).

Scale: per left row, d+1 key rows; per right row, at most
(2d+1) x (d+1) x (2d+1) probe rows (lens x segments x shifts; ~45 at
d=2) — linear fan-out, constants bounded by d, everything pure JVM
(substring/length/sequence + one equi-join). Segment keys are hashed
to 8-byte longs so the shuffle carries fixed-width keys, not strings.

Skew: a segment VALUE shared corpus-wide (template prefixes —
"Supplier#", "ORD-", course codes) makes that segment's bucket
quadratic, and unlike the jaccard df-cap there is no recall-preserving
way to just drop it (pairs whose edit falls outside the hot segment
match ONLY on it). The complete fix is the second blocking strategy:
``strategy="deletion"`` (FastSS neighborhoods) keys on the whole
string minus d characters, so identical prefixes cost nothing — pick
it for short template-shaped keys, keep "segment" for long free text
(see `fuzzy_join` docstring for the exact trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(col, d: int):
    """Array of (i, start, slen) for the even split of a string of this
    row's length into d+1 segments (1-based start). Even split:
    first (len % k) segments get ceil(len/k), rest floor(len/k) —
    deterministic and recomputable from (len, i) alone on the right."""
    k = d + 1
    n = F.length(col)
    base, extra = (n / k).cast("int"), n % k

    def seg(i):  # i in 0..d
        slen = F.when(F.lit(i) < extra, base + 1).otherwise(base)
        start = (
            F.lit(1)
            + F.least(F.lit(i), extra) * (base + 1)
            + F.greatest(F.lit(i) - extra, F.lit(0)) * base
        )
        return F.struct(
            F.lit(i).alias("i"), start.alias("start"), slen.alias("slen")
        )

    return F.array(*[seg(i) for i in range(k)])


def _del_variants(c, d: int):
    """array<string> of every variant of the string with 0..d character
    deletions (FastSS neighborhoods, Bocek et al. 2007): lev(s,t) <= d
    implies deleting the edited positions from each leaves a COMMON
    string reachable with <= d deletions per side — so sharing a
    variant is a complete blocking key. Pure JVM: nested transform over
    index sequences + Column.substr with column args. Counts: d=1 ->
    len+1 variants; d=2 -> 1 + len + C(len,2)."""
    n = F.length(c)
    out = F.array(c)
    if d >= 1:
        one = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, n - i)),
        )
        one = F.when(n >= 1, one).otherwise(F.array().cast("array<string>"))
        out = F.concat(out, one)
    if d >= 2:
        two = F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, n),
                    lambda j: F.concat(
                        c.substr(F.lit(1), i - 1),
                        c.substr(i + 1, j - i - 1),
                        c.substr(j + 1, n - j),
                    ),
                ),
            )
        )
        two = F.when(n >= 2, two).otherwise(F.array().cast("array<string>"))
        out = F.concat(out, two)
    return F.array_distinct(out)


def _deletion_join(L, R, d: int):
    """Candidate pairs via shared deletion-neighborhood keys."""
    lk = L.select(
        "__lid",
        "__lval",
        F.explode(_del_variants(F.col("__lval"), d)).alias("__v"),
    ).select("__lid", "__lval", F.xxhash64("__v").alias("__kh"))
    rk = R.select(
        "__rid",
        "__rval",
        F.explode(_del_variants(F.col("__rval"), d)).alias("__v"),
    ).select("__rid", "__rval", F.xxhash64("__v").alias("__kh"))
    return lk.join(rk, "__kh").select("__lid", "__lval", "__rid", "__rval")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int,
    left_id: str = None,
    right_id: str = None,
    strategy: str = "segment",
    max_tiny_pairs: int = 100_000_000,
) -> DataFrame:
    """(left_id, right_id, left_val, right_val, dist) — all cross pairs
    with lev(left_val, right_val) <= max_dist. NULL never matches;
    length difference > d is pruned before any join.

    ``left_id`` / ``right_id`` name the id columns carried through to the
    output; when omitted they DEFAULT to columns literally named
    ``left_id`` / ``right_id`` — pass them explicitly unless your tables
    already use those names (an absent column raises AnalysisException).

    ``max_tiny_pairs`` fail-fast guard: with ``strategy="segment"`` and
    ``max_dist >= 3``, left strings shorter than d+1 chars fall back to a
    salted length-block join whose candidate count is |tinyL| x |tinyR|
    (genuinely quadratic — nearly every short pair is within d edits, so
    the OUTPUT itself is quadratic); the join refuses to start when that
    product exceeds this bound rather than running away silently. At
    d <= 2 the fallback is an exact deletion-neighborhood join instead —
    distributed, pruned, no guard needed.

    Two EXACT blocking strategies (both complete recall, both verified
    in-join with `F.levenshtein`); pick by data shape:

    - ``"segment"`` (default): PassJoin pigeonhole segments — O(d)
      keys/row regardless of string length. Right for LONG strings
      (titles, lines, URLs). Weakness: a segment value shared corpus-
      wide (identical prefixes like "Supplier#") makes that bucket's
      candidate volume quadratic.
    - ``"deletion"``: FastSS deletion neighborhoods — len+1 (d=1) or
      ~len²/2 (d=2) keys/row, but keys carry the WHOLE string minus d
      chars, so shared prefixes cost nothing: only true near-pairs
      collide. Right for SHORT keys (names, codes, words); d <= 2
      enforced (variant count explodes beyond)."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if strategy not in ("segment", "deletion"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "deletion" and max_dist > 2:
        raise ValueError("deletion strategy supports max_dist <= 2")
    d, k = max_dist, max_dist + 1

    lid = left_id or "left_id"
    rid = right_id or "right_id"
    L = left.select(
        F.col(lid).alias("__lid"), F.col(left_col).alias("__lval")
    ).where(F.col(left_col).isNotNull())
    R = right.select(
        F.col(rid).alias("__rid"), F.col(right_col).alias("__rval")
    ).where(F.col(right_col).isNotNull())

    if strategy == "deletion":
        allc = _deletion_join(L, R, d).where(
            F.abs(F.length("__lval") - F.length("__rval")) <= d
        ).dropDuplicates(["__lid", "__rid"])
        out = allc.withColumn(
            "dist", F.levenshtein("__lval", "__rval")
        ).where(F.col("dist") <= d)
        rid_out = rid if rid != lid else rid + "_r"
        return out.select(
            F.col("__lid").alias(lid),
            F.col("__rid").alias(rid_out),
            F.col("__lval").alias("left_val"),
            F.col("__rval").alias("right_val"),
            "dist",
        )

    # left: one row per segment, keyed by (len, i, segment-hash)
    lseg = (
        L.withColumn("__len", F.length("__lval"))
        .withColumn("__seg", F.explode(_segments(F.col("__lval"), d)))
        .select(
            "__lid",
            "__lval",
            "__len",
            F.col("__seg.i").alias("__i"),
            F.xxhash64(
                F.substring(F.col("__lval"), F.col("__seg.start"), F.col("__seg.slen"))
            ).alias("__kh"),
        )
        # zero-length segments (strings shorter than d+1 chars) match
        # everything of length 0 — route those tiny strings through the
        # length-block fallback below instead of the segment join
        .where(F.col("__len") >= k)
    )

    # right: probe rows for every candidate left length and segment slot
    # and shift. start/slen recompute from (l, i) exactly as _segments.
    # guard: sequence(a, b) DESCENDS when a > b, so rows too short to
    # partner any segment-joinable left string must not emit probes
    R2 = R.withColumn("__tlen", F.length("__rval")).where(
        F.col("__tlen") + d >= k
    )
    ls = F.explode(
        F.sequence(
            F.greatest(F.col("__tlen") - d, F.lit(k)), F.col("__tlen") + d
        )
    ).alias("__l")
    probes = R2.select("__rid", "__rval", "__tlen", ls)
    base, extra = (F.col("__l") / k).cast("int"), F.col("__l") % k
    rows = []
    for i in range(k):
        slen = F.when(F.lit(i) < extra, base + 1).otherwise(base)
        start = (
            F.lit(1)
            + F.least(F.lit(i), extra) * (base + 1)
            + F.greatest(F.lit(i) - extra, F.lit(0)) * base
        )
        rows.append(
            F.struct(F.lit(i).alias("i"), start.alias("start"), slen.alias("slen"))
        )
    probes = probes.withColumn("__seg", F.explode(F.array(*rows)))
    probes = probes.withColumn(
        "__shift", F.explode(F.sequence(F.lit(-d), F.lit(d)))
    ).select(
        "__rid",
        "__rval",
        "__l",
        F.col("__seg.i").alias("__i"),
        (F.col("__seg.start") + F.col("__shift")).alias("__pstart"),
        F.col("__seg.slen").alias("__slen"),
    ).where(
        (F.col("__pstart") >= 1)
        & (F.col("__pstart") + F.col("__slen") - 1 <= F.length("__rval"))
        & (F.col("__slen") > 0)
    ).select(
        "__rid",
        "__rval",
        F.col("__l").alias("__len"),
        "__i",
        F.xxhash64(
            F.substring(F.col("__rval"), F.col("__pstart"), F.col("__slen"))
        ).alias("__kh"),
    )
    # no probe-level dedup: distinct shifts rarely produce identical
    # substrings, so pre-deduping costs a full extra Exchange to remove
    # almost nothing — the single PAIR-level dedup below (after the tiny
    # fallback union) collapses all duplicate candidates at once
    cand = lseg.join(probes, ["__len", "__i", "__kh"]).select(
        "__lid", "__lval", "__rid", "__rval"
    )

    # fallback block for left strings shorter than d+1 chars: they have
    # < k usable segments; their match partners differ by <= d in length,
    # i.e. length <= 2d. NEVER a broadcast cross join — nothing bounds
    # these sets (a corpus of millions of short codes at d=2 puts every
    # string of length <= 4 here), so:
    #   d == 0  -> exact equi-join on the value;
    #   d <= 2  -> FastSS deletion-neighborhood equi-join (complete for
    #              lev <= d, distributed, shared keys prune real
    #              non-pairs; variant fan-out is trivial at these
    #              lengths);
    #   d >= 3  -> salted block join (right side hashed into SALT
    #              buckets, left replicated across them — the candidate
    #              set IS quadratic here because nearly all short pairs
    #              are within d edits), behind a fail-fast count guard
    #              (`max_tiny_pairs`, same posture as streaming/asof.py's
    #              max_right_rows) instead of a silent runaway.
    tinyL = L.where(F.length("__lval") < k)
    tinyR = R.where(F.length("__rval") <= 2 * d)
    if d == 0:
        tiny = tinyL.join(tinyR, F.col("__lval") == F.col("__rval"))
    elif d <= 2:
        tiny = _deletion_join(tinyL, tinyR, d).where(
            F.abs(F.length("__lval") - F.length("__rval")) <= d
        )
    else:
        n_l, n_r = tinyL.count(), tinyR.count()
        if n_l * n_r > max_tiny_pairs:
            raise ValueError(
                f"fuzzy_join short-string fallback would generate "
                f"{n_l} x {n_r} = {n_l * n_r} candidate pairs "
                f"(> max_tiny_pairs={max_tiny_pairs}): at max_dist="
                f"{d}, every left string shorter than {k} chars pairs "
                f"with every right string of length <= {2 * d}, and "
                f"that output is quadratic by nature. Pre-filter the "
                f"short strings, lower max_dist, or raise "
                f"max_tiny_pairs explicitly to accept the cost."
            )
        salt = 32
        lk = tinyL.withColumn(
            "__s", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        rk = tinyR.withColumn(
            "__s", (F.pmod(F.xxhash64("__rid"), F.lit(salt))).cast("int")
        )
        tiny = lk.join(rk, "__s").where(
            F.abs(F.length("__lval") - F.length("__rval")) <= d
        )

    allc = cand.unionByName(
        tiny.select("__lid", "__lval", "__rid", "__rval")
    ).dropDuplicates(["__lid", "__rid"])

    out = allc.withColumn(
        "dist", F.levenshtein("__lval", "__rval")
    ).where(F.col("dist") <= d)
    rid_out = rid if rid != lid else rid + "_r"
    return out.select(
        F.col("__lid").alias(lid),
        F.col("__rid").alias(rid_out),
        F.col("__lval").alias("left_val"),
        F.col("__rval").alias("right_val"),
        "dist",
    )


def fuzzy_dedup_pairs(
    df: DataFrame, id_col: str, col: str, max_dist: int,
    strategy: str = "segment",
) -> DataFrame:
    """(id_a, id_b, dist) — within-corpus near-identical values (typo
    dedup for names/titles/URLs): the self-join form of `fuzzy_join`,
    a<b half kept (the right-id column is suffixed `_r` by the join)."""
    pairs = fuzzy_join(df, df, col, col, max_dist, id_col, id_col,
                       strategy=strategy)
    return pairs.where(F.col(id_col) < F.col(id_col + "_r")).select(
        F.col(id_col).alias("id_a"),
        F.col(id_col + "_r").alias("id_b"),
        "dist",
    )


def fuzzy_dedup(
    df: DataFrame, id_col: str, col: str, max_dist: int,
    strategy: str = "segment",
) -> DataFrame:
    """Canonical typo-dedup: cluster all values within ``max_dist`` edits
    (connected components over the `fuzzy_dedup_pairs` edge list — so
    chains a-b-c collapse even when a and c differ by > d) and keep each
    cluster's minimum-id row; singletons pass through. The same
    cluster→canonical policy as `dedup_near`, on edit-distance edges."""
    from .clustering import dedup_near

    pairs = fuzzy_dedup_pairs(df, id_col, col, max_dist, strategy)
    return dedup_near(df, pairs.select("id_a", "id_b"), id_col)
