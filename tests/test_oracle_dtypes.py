"""Dtype-parity gate for oracle_sql() — kills the HUGEINT→float64 class.

Rounds 4 and 5 each shipped one driver-red `hash_match` caused by a DuckDB
aggregate (SUM over BIGINT → HUGEINT) exporting to pandas as float64 while
the Spark side returned int64. The values were identical; the driver's
dtype-sensitive value hash still failed. This test audits EVERY oracle
column's exported dtype against the Spark query's schema-implied dtype so
the class cannot ship again. Spark plans are built but never executed
(schema-only), DuckDB runs at sf0.001 — the whole gate is seconds per query.
"""

import os
import subprocess
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_oracle_dtypes_match_spark_schema(spark, capsys):
    # In-process (r15): the audit is schema-only on the Spark side and
    # read-only DuckDB on the oracle side — it mutates no session state,
    # so the old subprocess isolation bought nothing but a second ~20 s
    # JVM startup. Its getOrCreate() picks up the suite session.
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "oracle_dtype_audit", os.path.join(REPO, "tools", "oracle_dtype_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    try:
        bad = mod.main(SF_DIR)
    finally:
        # building all 50 constructors leaves their .cache() entries in
        # the shared session; later plan-shape tests (the PLAN_AUDIT
        # gate) would see InMemoryRelation substitutions that a fresh
        # session does not. Leave the session as we found it.
        spark.catalog.clearCache()
    assert bad == 0, f"dtype mismatches:\n{capsys.readouterr().out[-4000:]}"


def test_queries_fit_driver_correctness_cap():
    """The driver records correctness for at most 50 queries() rows; r8
    grew the dict to 55 and five previously-green queries silently fell
    out of the gate. Every entry must fit — consolidate legs (the
    q_dedup_exact pattern) before adding a 51st."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    qs = E.queries()
    assert len(qs) <= 50, f"queries() has {len(qs)} entries; the driver caps at 50"
    # every query must keep a same-named oracle (rows-only checks are the
    # explicitly-exempt non-SQL surfaces; today there are none)
    missing = [k for k in qs if k not in E.oracle_sql()]
    assert not missing, f"queries without oracles: {missing}"
