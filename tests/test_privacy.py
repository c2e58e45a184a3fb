"""k-anonymity / l-diversity audits (#172, operators/privacy.py)."""

import pytest


def test_k_anonymity_report_exact(spark):
    """Report ≡ a python replay on a hand-built table: min group size,
    at-risk mass below k, l-diversity floor, NULL quasi values group."""
    from bitfilters_spark.operators.privacy import (
        k_anonymity_report,
        quasi_identifier_groups,
    )

    rows = [
        # (zip, sex, diagnosis)
        ("02138", "m", "flu"), ("02138", "m", "flu"), ("02138", "m", "cold"),
        ("02139", "f", "flu"), ("02139", "f", "flu"),
        ("02140", "m", "covid"),                       # singleton -> at risk
        (None, "f", "flu"), (None, "f", "cold"),       # NULL zip groups
    ]
    df = spark.createDataFrame(rows, "zip string, sex string, dx string")
    g = {
        (r["zip"], r["sex"]): (r["n_rows"], r["n_sensitive"])
        for r in quasi_identifier_groups(df, ["zip", "sex"], "dx").collect()
    }
    assert g == {
        ("02138", "m"): (3, 2),
        ("02139", "f"): (2, 1),
        ("02140", "m"): (1, 1),
        (None, "f"): (2, 2),
    }
    rep = k_anonymity_report(df, ["zip", "sex"], k=2, sensitive_col="dx").collect()[0]
    assert rep["n_rows"] == 8 and rep["n_groups"] == 4
    assert rep["k_anonymity"] == 1          # the singleton
    assert rep["n_rows_at_risk"] == 1       # only groups < 2
    assert rep["frac_at_risk"] == 1 / 8
    # the k-anonymous-but-leaking case: (02139, f) is 2-anonymous yet
    # its diagnosis is fully determined -> l_diversity floor is 1
    assert rep["l_diversity"] == 1
    rep5 = k_anonymity_report(df, ["zip", "sex"], k=5).collect()[0]
    assert rep5["n_rows_at_risk"] == 8 and rep5["frac_at_risk"] == 1.0
    assert "l_diversity" not in rep5.asDict()
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_report(df, [])
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_report(df, ["zip"], k=0)


def test_null_sensitive_counts_as_a_state(spark):
    """r14 (ADVICE): a NULL sensitive value is one distinct sensitive
    state — an all-NULL group reads l=1 (not the ambiguous 0), a mixed
    group counts NULL alongside its real values, and no sentinel can
    collide with real data."""
    from bitfilters_spark.operators.privacy import (
        k_anonymity_report,
        quasi_identifier_groups,
    )

    df = spark.createDataFrame(
        [
            ("a", None), ("a", None),          # all-NULL sensitive group
            ("b", "x"), ("b", None), ("b", "y"),  # mixed: 2 real + NULL
            ("c", "x"), ("c", "x"),            # constant real value
        ],
        "zip string, diag string",
    )
    g = {
        r["zip"]: r["n_sensitive"]
        for r in quasi_identifier_groups(df, ["zip"], "diag").collect()
    }
    assert g == {"a": 1, "b": 3, "c": 1}
    rep = k_anonymity_report(df, ["zip"], k=2, sensitive_col="diag")
    assert rep.collect()[0]["l_diversity"] == 1


def test_t_closeness_groups_hand_replay(spark):
    """#181: per-group TVD ≡ an exact python replay (integer numerator,
    one division), including NULL quasi and NULL sensitive states."""
    from collections import Counter

    from bitfilters_spark.operators.privacy import t_closeness_groups

    rows = [
        # zip, diagnosis
        ("47677", "flu"), ("47677", "flu"), ("47677", "cancer"),
        ("47602", "flu"), ("47602", "cold"), ("47602", "cold"),
        (None, "cancer"), (None, None), (None, "flu"),
        ("47678", None), ("47678", None),
    ]
    df = spark.createDataFrame(rows, "zip string, diag string")
    got = {
        r["zip"]: (r["n_rows"], r["tvd_num"], r["tvd"])
        for r in t_closeness_groups(df, ["zip"], "diag").collect()
    }
    N = len(rows)
    glob = Counter(d for _, d in rows)
    by_g: dict = {}
    for z, d in rows:
        by_g.setdefault(z, []).append(d)
    assert set(got) == set(by_g)
    for z, ds in by_g.items():
        cg = Counter(ds)
        n_g = len(ds)
        num = sum(
            abs(cg.get(v, 0) * N - glob[v] * n_g) for v in glob
        )
        assert got[z][0] == n_g
        assert got[z][1] == num
        assert got[z][2] == num / (2.0 * n_g * N)


def test_t_closeness_report_gate_and_leak_case(spark):
    """The l-diverse-but-skewed leak: a group with 9:1 flu:cancer against
    a 50:50 global is l=2 diverse yet far from t-close — the report
    flags it; a distribution-matching group reads tvd 0."""
    from bitfilters_spark.operators.privacy import (
        k_anonymity_report,
        t_closeness_groups,
        t_closeness_report,
    )

    rows = (
        [("skew", "flu")] * 9 + [("skew", "cancer")]
        + [("fair", "flu")] * 5 + [("fair", "cancer")] * 5
    )
    df = spark.createDataFrame(rows, "zip string, diag string")
    g = {r["zip"]: r["tvd"] for r in t_closeness_groups(df, ["zip"], "diag").collect()}
    # global: 14 flu / 6 cancer over 20. fair(5,5): |5*20-14*10| + |5*20-6*10| = 40+40=80 -> 80/400=0.2
    assert abs(g["fair"] - 0.2) < 1e-15
    # skew(9,1): |9*20-14*10|+|1*20-6*10| = 40+40 -> 80/400... compute exactly
    assert abs(g["skew"] - (abs(9 * 20 - 14 * 10) + abs(1 * 20 - 6 * 10)) / (2.0 * 10 * 20)) < 1e-15
    # l-diversity calls both groups equally fine (l=2); t-closeness separates
    ka = k_anonymity_report(df, ["zip"], k=2, sensitive_col="diag").first()
    assert ka["l_diversity"] == 2
    rep = t_closeness_report(df, ["zip"], "diag", t=0.15).first()
    assert rep["n_groups"] == 2
    assert rep["t_closeness"] == max(g.values())
    assert rep["n_groups_over_t"] == sum(1 for v in g.values() if v > 0.15)
    assert rep["n_rows_over_t"] == 10 * rep["n_groups_over_t"]

    # identical-to-global group distribution -> tvd exactly 0
    rows0 = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    df0 = spark.createDataFrame(rows0, "zip string, diag string")
    assert all(
        r["tvd"] == 0.0 for r in t_closeness_groups(df0, ["zip"], "diag").collect()
    )

    import pytest as _pt

    with _pt.raises(ValueError):
        t_closeness_report(df, ["zip"], "diag", t=0.0)
    with _pt.raises(ValueError):
        t_closeness_groups(df, [], "diag")


def test_ordered_t_closeness_emd_hand_replay(spark):
    """#181 (EMD variant): ordered-attribute t-closeness ≡ an exact
    python replay, the extremes-vs-middle case EMD separates while TVD
    can't, NULL quasi groups intact, NULL sensitive fails loudly."""
    from collections import Counter

    from bitfilters_spark.operators.privacy import (
        ordered_t_closeness_groups,
        t_closeness_groups,
        t_closeness_report,
    )

    # salaries 1..5; "ext" holds the two extremes, "mid" the two middles
    rows = (
        [("ext", 1)] * 2 + [("ext", 5)] * 2
        + [("mid", 2)] * 2 + [("mid", 4)] * 2
        + [(None, 3)] * 4  # NULL quasi group, all middle
    )
    df = spark.createDataFrame(rows, "zip string, sal int")
    got = {
        r["zip"]: (r["n_rows"], r["emd_num"], r["emd"])
        for r in ordered_t_closeness_groups(df, ["zip"], "sal").collect()
    }
    # python replay
    N = len(rows)
    vals = sorted({v for _, v in rows})
    glob = Counter(v for _, v in rows)
    by_g: dict = {}
    for z, v in rows:
        by_g.setdefault(z, []).append(v)
    for z, vs in by_g.items():
        cg = Counter(vs)
        n_g = len(vs)
        c = 0
        num = 0
        for v in vals[:-1]:
            c += cg.get(v, 0) * N - glob[v] * n_g
            num += abs(c)
        assert got[z][0] == n_g
        assert got[z][1] == num
        assert got[z][2] == num / ((len(vals) - 1) * n_g * N)
    # extremes read FARTHER than middles under EMD...
    assert got["ext"][2] > got["mid"][2]
    # ...while TVD cannot tell them apart (same per-value deviation set)
    tvd = {
        r["zip"]: r["tvd"] for r in t_closeness_groups(df, ["zip"], "sal").collect()
    }
    assert tvd["ext"] == tvd["mid"]

    # report plumbing + guards
    rep = t_closeness_report(df, ["zip"], "sal", t=0.2, metric="emd").first()
    assert rep["n_groups"] == 3
    assert abs(rep["t_closeness"] - max(v[2] for v in got.values())) < 1e-15
    import pytest as _pt
    with _pt.raises(ValueError):
        t_closeness_report(df, ["zip"], "sal", metric="cdf")
    dfn = spark.createDataFrame([("a", 1), ("a", None)], "zip string, sal int")
    with _pt.raises(ValueError):
        ordered_t_closeness_groups(dfn, ["zip"], "sal")
    # single-value corpus: emd defined 0
    df1 = spark.createDataFrame([("a", 7), ("b", 7)], "zip string, sal int")
    assert all(
        r["emd"] == 0.0 and r["emd_num"] == 0
        for r in ordered_t_closeness_groups(df1, ["zip"], "sal").collect()
    )
