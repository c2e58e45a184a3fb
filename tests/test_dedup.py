

def test_lsh_plan_banding_choice():
    """#166: the planner's areas match a brute-force integral replay,
    the chosen banding separates above/below-threshold similarities,
    and the knobs behave (recall weight -> lower-r curves; budget cap
    respected)."""
    from bitfilters_spark.operators.dedup import lsh_plan

    plan = lsh_plan(0.5, n_perm=128)
    assert plan["b"] * plan["r"] <= 128
    # replay the winning cost on an independent finer grid
    b, r = plan["b"], plan["r"]
    fine = 5000
    fp = sum(
        (1 - (1 - ((k + 0.5) / fine) ** r) ** b) / fine
        for k in range(fine)
        if (k + 0.5) / fine < 0.5
    )
    fn = sum(
        (1 - ((k + 0.5) / fine) ** r) ** b / fine
        for k in range(fine)
        if (k + 0.5) / fine >= 0.5
    )
    assert abs(fp - plan["fp_area"]) < 1e-3
    assert abs(fn - plan["fn_area"]) < 1e-3
    # and it beats (or ties) every other candidate on its own grid
    assert all(plan["cost"] <= c["cost"] + 1e-12 for c in plan["candidates"])
    # the S-curve actually separates: high sim ~ caught, low sim ~ not
    p = lambda s: 1 - (1 - s**r) ** b
    assert p(0.8) > 0.95 and p(0.2) < 0.2
    assert abs(plan["threshold_est"] - 0.5) < 0.25
    # recall bias: weighting FN makes the curve catch borderline sims
    # at least as often as the balanced plan
    rec = lsh_plan(0.5, n_perm=128, fn_weight=10.0)
    pb = lambda s, c: 1 - (1 - s ** c["r"]) ** c["b"]
    assert pb(0.45, rec) >= pb(0.45, plan) - 1e-12
    import pytest as _p
    with _p.raises(ValueError, match="threshold"):
        lsh_plan(1.5)


def test_lsh_plan_full_lattice_and_b1_estimate():
    """r13 review: the planner searches the FULL b*r <= n_perm lattice
    (fp-heavy weights pick a smaller-than-maximal b for some r), and
    threshold_est honors (1/b)^(1/r) at b == 1 (i.e. 1.0, not 0.0)."""
    from bitfilters_spark.operators.dedup import lsh_plan

    plan = lsh_plan(0.5, n_perm=128, fp_weight=5.0)
    cands = plan["candidates"]
    # the lattice contains non-maximal b rows for a given r
    r16 = sorted(c["b"] for c in cands if c["r"] == 16)
    assert r16 == list(range(1, 9))
    # and the fp-heavy winner is optimal over that full lattice
    assert all(plan["cost"] <= c["cost"] + 1e-12 for c in cands)
    b1 = [c for c in cands if c["b"] == 1]
    assert b1 and all(c["threshold_est"] == 1.0 for c in b1)


def test_lsh_plan_duckdb_parity():
    """r14 (VERDICT r13 missing #4): a live DuckDB replay of the
    midpoint-grid S-curve integrals over the FULL b*r <= n_perm lattice
    picks the same winner (b, r) and the same areas (1e-9 — numpy's
    pairwise sums vs DuckDB's sequential sums differ only in last
    bits), at two (threshold, weights) settings. Pins the planner's
    arithmetic cross-engine the way q_token_budget pins its closed
    form."""
    import duckdb

    from bitfilters_spark.operators.dedup import lsh_plan

    for threshold, fpw, fnw in ((0.5, 1.0, 1.0), (0.8, 2.0, 1.0)):
        mine = lsh_plan(threshold, n_perm=128, fp_weight=fpw, fn_weight=fnw)
        row = duckdb.sql(f"""
            WITH g AS (
              SELECT (i + 0.5) / 2000.0 AS s
              FROM generate_series(0, 1999) t(i)),
            lattice AS (
              SELECT r, b
              FROM generate_series(1, 128) tr(r),
                   generate_series(1, 128) tb(b)
              WHERE b * r <= 128),
            areas AS (
              SELECT b, r,
                sum(CASE WHEN s < {threshold}
                    THEN 1.0 - power(1.0 - power(s, r), b)
                    ELSE 0.0 END) / 2000.0 AS fp_area,
                sum(CASE WHEN s >= {threshold}
                    THEN power(1.0 - power(s, r), b)
                    ELSE 0.0 END) / 2000.0 AS fn_area
              FROM lattice, g GROUP BY b, r)
            SELECT b, r, fp_area, fn_area,
                   {fpw} * fp_area + {fnw} * fn_area AS cost
            FROM areas
            ORDER BY cost, b * r, r
            LIMIT 1
        """).fetchone()
        assert (row[0], row[1]) == (mine["b"], mine["r"]), (threshold, row)
        assert abs(row[2] - mine["fp_area"]) < 1e-9
        assert abs(row[3] - mine["fn_area"]) < 1e-9
        assert abs(row[4] - mine["cost"]) < 1e-9


def test_bbit_minhash_packing_and_estimator(spark):
    """#176 (Li & König 2010): (a) packed b-bit words unpack to exactly
    sig[i] & mask for every position at b=1 and b=4 (sign bit clear);
    (b) match_frac equals a python replay of slot agreement; (c) the
    collision-corrected estimator tracks exact Jaccard and strictly
    beats the UNCORRECTED match fraction, whose b-bit collisions bias
    it high."""
    import numpy as np
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.dedup import (
        bbit_jaccard_estimate,
        bbit_minhash_signatures,
        minhash_signatures,
    )
    from bitfilters_spark.operators.text import word_shingles

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(400)]
    # controlled-overlap doc pairs: docs 2j and 2j+1 share a prefix
    rows = []
    for j in range(4):
        base = list(rng.choice(vocab, 60, replace=False))
        other = list(rng.choice(vocab, 60, replace=False))
        keep = 15 * j  # 0, 15, 30, 45 shared tokens
        rows.append((2 * j, " ".join(base)))
        rows.append((2 * j + 1, " ".join(base[:keep] + other[keep:60])))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    k = 256
    full = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(df, "doc_id", "text", k=k).collect()
    }
    for b in (1, 4):
        per_word = 63 // b
        mask = (1 << b) - 1
        packed = {
            r["doc_id"]: r["bsig"]
            for r in bbit_minhash_signatures(
                df, "doc_id", "text", k=k, b=b
            ).collect()
        }
        for d, sig in full.items():
            got = [
                (packed[d][i // per_word] >> ((i % per_word) * b)) & mask
                for i in range(k)
            ]
            assert got == [v & mask for v in sig], (b, d)
            assert all(w >= 0 for w in packed[d])  # sign bit clear

    # estimator over the 4 planted pairs at b=1
    pairs = spark.createDataFrame(
        [(2 * j, 2 * j + 1) for j in range(4)], "id_a long, id_b long"
    )
    sigs = bbit_minhash_signatures(df, "doc_id", "text", k=k, b=1).select(
        F.col("doc_id").alias("id"), "bsig"
    )
    est = {
        (r["id_a"], r["id_b"]): (r["match_frac"], r["jaccard_est"])
        for r in bbit_jaccard_estimate(pairs, sigs, k=k, b=1).collect()
    }
    sh = {
        r["doc_id"]: set(r["s"])
        for r in df.select(
            "doc_id", F.array_distinct(word_shingles("text", 3)).alias("s")
        ).collect()
    }
    for j in range(4):
        a_, b_ = 2 * j, 2 * j + 1
        true_j = len(sh[a_] & sh[b_]) / len(sh[a_] | sh[b_])
        mf, je = est[(a_, b_)]
        # python replay of slot agreement on the packed signatures
        replay = sum(
            (full[a_][i] & 1) == (full[b_][i] & 1) for i in range(k)
        ) / k
        assert abs(mf - replay) < 1e-12
        assert abs(je - true_j) <= abs(mf - true_j) + 1e-12  # correction helps
        assert abs(je - true_j) < 0.16, (j, je, true_j)  # k=256 noise band
