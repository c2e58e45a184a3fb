"""Preference-data preparation (operators/preference.py): integrity
gates, length-bias audit, pair/prompt dedup, eval-prompt leakage, and
the shared-prefix DPO rendering contract."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.preference import (
    dedup_preference_pairs,
    length_bias_report,
    preference_prompt_leakage,
    preference_stats,
    render_preference,
)

ROWS = [
    (1, "What is 2+2?", "It is 4.", "5"),
    (2, "What is 2+2?", "It is 4.", "5"),            # exact dup of 1
    (3, "what is 2+2 ?", "it is 4.", "5"),           # normalized dup of 1
    (4, "Explain tides", "The moon pulls the ocean with gravity.", "Magic."),
    (5, "Explain tides", "Short.", "Much longer rejected answer here ok."),
    (6, "Same same", "identical text", "identical text"),   # zero signal
    (7, "", "a", "b"),                               # degenerate: no prompt
    (8, "Null side", None, "b"),                     # degenerate: null chosen
]
SCHEMA = "pair_id long, prompt string, chosen string, rejected string"


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_preference_stats_gates_and_len_delta(spark):
    got = {r["pair_id"]: r for r in preference_stats(_df(spark)).collect()}
    assert got[1]["pref_ok"] and got[4]["pref_ok"] and got[5]["pref_ok"]
    assert got[6]["identical"] and not got[6]["pref_ok"]
    assert got[7]["degenerate"] and got[8]["degenerate"]
    assert got[4]["len_delta"] == 7 - 1
    assert got[5]["len_delta"] == 1 - 6
    assert got[1]["n_prompt"] == 3 and got[1]["n_chosen"] == 3


def test_length_bias_report(spark):
    r = length_bias_report(_df(spark)).collect()[0]
    assert r["n_pairs"] == 8
    # ok pairs: 1,2,3,4,5
    assert r["n_ok"] == 5
    assert r["n_chosen_longer"] == 4   # pairs 1,2,3 (3 vs 1) and 4
    assert r["n_rejected_longer"] == 1  # pair 5
    assert r["n_len_tied"] == 0
    deltas = [2, 2, 2, 6, -5]
    assert r["mean_len_delta"] == pytest.approx(sum(deltas) / 5)


def test_dedup_pair_and_prompt_granularity(spark):
    kept = sorted(
        r["pair_id"]
        for r in dedup_preference_pairs(_df(spark), "pair_id").collect()
    )
    # 2 and 3 collapse onto 1 (normalized); everything else unique
    assert kept == [1, 4, 5, 6, 7, 8]
    raw = sorted(
        r["pair_id"]
        for r in dedup_preference_pairs(
            _df(spark), "pair_id", normalize=False
        ).collect()
    )
    assert raw == [1, 3, 4, 5, 6, 7, 8]  # only the exact dup collapses
    by_prompt = sorted(
        r["pair_id"]
        for r in dedup_preference_pairs(
            _df(spark), "pair_id", granularity="prompt"
        ).collect()
    )
    # one pair per normalized prompt: 1 (covers 2,3), 4 (covers 5), 6, 7, 8
    assert by_prompt == [1, 4, 6, 7, 8]
    with pytest.raises(ValueError, match="granularity"):
        dedup_preference_pairs(_df(spark), "pair_id", granularity="both")


def test_prompt_leakage(spark):
    ev = spark.createDataFrame(
        [("what is 2+2 ?",), ("unrelated",)], "prompt string"
    )
    got = {
        r["pair_id"]: r["leaked"]
        for r in preference_prompt_leakage(_df(spark), ev).collect()
    }
    assert got[1] and got[2] and got[3]  # normalized match
    assert not got[4] and not got[5] and not got[6]


def test_render_preference_shared_prefix(spark):
    out = {
        r["pair_id"]: (r["text_chosen"], r["text_rejected"])
        for r in render_preference(_df(spark)).collect()
    }
    ch, rj = out[1]
    prefix = "<|im_start|>user\nWhat is 2+2?<|im_end|>\n"
    assert ch.startswith(prefix) and rj.startswith(prefix)
    assert ch == prefix + "<|im_start|>assistant\nIt is 4.<|im_end|>\n"
    assert rj == prefix + "<|im_start|>assistant\n5<|im_end|>\n"
    # the DPO contract: prefixes byte-identical up to the divergence point
    assert ch[: len(prefix)] == rj[: len(prefix)]
    # null side renders as empty content, never NULLs the row
    ch8, rj8 = out[8]
    assert "assistant\n<|im_end|>" in ch8 and rj8.endswith("b<|im_end|>\n")
    # plain template
    p = {
        r["pair_id"]: r["text_chosen"]
        for r in render_preference(_df(spark), template="plain").collect()
    }
    assert p[1] == "user: What is 2+2?\nassistant: It is 4.\n"
    with pytest.raises(ValueError, match="template"):
        render_preference(_df(spark), template="llama")
