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
