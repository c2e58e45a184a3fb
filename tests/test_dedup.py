

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
