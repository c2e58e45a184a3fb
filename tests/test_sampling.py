import pytest
from pyspark.sql import functions as F

from bitfilters_spark.operators.sampling import hash_sample, hash_split, split_edges

SF = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_rate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 103).collect())
    s2 = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 103).collect())
    assert s1 == s2 and len(s1) > 0
    rate = len(s1) / docs.count()
    assert 0.02 < rate < 0.25  # ~10% nominal, small-n variance allowed


def test_hash_split_partitions_everything(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = hash_split(docs, "doc_id", {"train": 8, "val": 1, "test": 1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"] + counts["test"]


def test_hash_split_correlated_across_tables(spark):
    # the same key must land in the same split in any table
    a = spark.range(0, 500).withColumnRenamed("id", "k")
    b = spark.range(0, 500).withColumnRenamed("id", "k")
    sa = hash_split(a, "k", {"train": 9, "test": 1})
    sb = hash_split(b, "k", {"train": 9, "test": 1})
    joined = sa.alias("x").join(sb.alias("y"), "k")
    assert joined.where(F.col("x.split") != F.col("y.split")).count() == 0


def test_split_edges_exposed():
    assert split_edges({"train": 8, "val": 1, "test": 1}, 1023) == [
        ("train", 819),
        ("val", 921),
    ]


def test_stratified_sample_rates_and_determinism(spark):
    from bitfilters_spark.operators.sampling import stratified_hash_sample

    from bitfilters_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    s1 = stratified_hash_sample(
        ev, "event_id", "event_type", {"click": 819, "view": 0}, default_threshold=102
    )
    s2 = stratified_hash_sample(
        ev, "event_id", "event_type", {"click": 819, "view": 0}, default_threshold=102
    )
    assert sorted(r["event_id"] for r in s1.collect()) == sorted(
        r["event_id"] for r in s2.collect()
    )
    rates = {
        r["event_type"]: r["n"]
        for r in s1.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "view" not in rates  # threshold 0 drops the stratum entirely
    assert 0.6 < rates["click"] / totals["click"] < 0.95  # ~80%
    other = set(totals) - {"click", "view"}
    got_other = sum(rates.get(t, 0) for t in other)
    tot_other = sum(totals[t] for t in other)
    assert 0.03 < got_other / tot_other < 0.25  # ~10%


def test_mixture_thresholds_integer_exact():
    from bitfilters_spark.operators.sampling import mixture_thresholds

    counts = {"a": 1000, "b": 5000, "c": 300, "d": 42}
    # binding stratum is c (300/1 is scarcest vs its weight)
    thr = mixture_thresholds(counts, {"a": 1, "b": 1, "c": 1}, mask=1023)
    K = 300 * 1024 // 1
    assert thr == {"a": K // 1000, "b": K // 5000, "c": 1024}
    # d absent from weights -> no threshold (dropped)
    assert "d" not in thr
    # empty / missing strata
    assert mixture_thresholds({}, {"a": 1}) == {}
    assert mixture_thresholds({"a": 10}, {"a": 1, "zz": 5}) == {"a": 1024}


def test_mixture_sample_proportions_and_determinism(spark):
    from bitfilters_spark.operators.sampling import mixture_sample

    rows = [(i, "big" if i % 10 else "small") for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = mixture_sample(df, "id", "src", {"big": 1, "small": 1})
    got = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    # small (2000 rows) is binding and kept whole; big downsampled to ~2000
    assert got["small"] == 2000
    assert abs(got["big"] - 2000) < 250
    # deterministic: second draw identical
    ids1 = {r["id"] for r in out.collect()}
    ids2 = {r["id"] for r in mixture_sample(df, "id", "src", {"big": 1, "small": 1}).collect()}
    assert ids1 == ids2
    # counts= passthrough (r15, the blobs= pattern): pre-collected strata
    # counts must yield the identical sample
    from bitfilters_spark.operators.sampling import mixture_strata_counts

    pre = mixture_strata_counts(df, "src")
    ids3 = {
        r["id"]
        for r in mixture_sample(
            df, "id", "src", {"big": 1, "small": 1}, counts=pre
        ).collect()
    }
    assert ids3 == ids1


def test_cap_per_group_caps_and_is_deterministic(spark):
    from bitfilters_spark.operators.sampling import cap_per_group

    rows = [(i, f"d{i % 5}") for i in range(1_000)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = cap_per_group(df, "id", "domain", 30)
    sizes = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {f"d{g}": 30 for g in range(5)}  # every group exactly capped
    # a group under the cap is kept whole
    small = spark.createDataFrame([(1, "x"), (2, "x")], "id long, domain string")
    assert cap_per_group(small, "id", "domain", 30).count() == 2
    # deterministic + repartition-stable
    ids1 = {r["id"] for r in out.collect()}
    ids2 = {r["id"] for r in cap_per_group(df.repartition(13), "id", "domain", 30).collect()}
    assert ids1 == ids2


def test_cap_per_group_duckdb_parity(spark):
    """native=False draws the SAME per-domain sample DuckDB would: rank by
    hash(id) within domain, keep the k smallest."""
    import duckdb

    from bitfilters_spark.operators.sampling import cap_per_group

    rows = [(i, f"d{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, "id long, domain string")
    got = {
        (r["id"], r["domain"])
        for r in cap_per_group(df, "id", "domain", 25, native=False).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ",".join(f"({i},'d{i % 3}')" for i in range(600)) +
                ") v(id, domain)")
    want = {
        (i, d)
        for i, d in con.sql(
            """
            SELECT id, domain FROM t
            QUALIFY row_number() OVER (
              PARTITION BY domain ORDER BY hash(id), id) <= 25
            """
        ).fetchall()
    }
    assert got == want


def test_top_per_group_quality_ranked_cap(spark):
    """top_per_group keeps each group's k best under the given ranking,
    deterministically; k=1 grouped by fingerprint reproduces dedup_best."""
    from bitfilters_spark.operators.dedup import dedup_best
    from bitfilters_spark.operators.sampling import top_per_group

    rows = [
        (1, "a", 0.9), (2, "a", 0.7), (3, "a", 0.8),
        (4, "b", 0.5), (5, "b", 0.6),
        (6, "c", 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, q double")
    got = {
        (r["domain"], r["doc_id"])
        for r in top_per_group(
            df, "domain", [F.col("q").desc()], 2, id_col="doc_id"
        ).collect()
    }
    assert got == {("a", 1), ("a", 3), ("b", 5), ("b", 4), ("c", 6)}
    # k=1 == dedup_best on the same ranking
    a = sorted(
        r["doc_id"]
        for r in top_per_group(
            df, "domain", [F.col("q").desc()], 1, id_col="doc_id"
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in dedup_best(
            df, "domain", [F.col("q").desc()], id_col="doc_id"
        ).collect()
    )
    assert a == b == [1, 5, 6]


def test_mine_contrastive_triplets(spark):
    """Each direction of each pair anchors k negatives; negatives are
    never the anchor, its positive, or any of the anchor's other
    near-dups; the draw is deterministic and differs across anchors."""
    from bitfilters_spark.operators.sampling import mine_contrastive_triplets

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.8), (10, 11, 0.95)],
        "id_a long, id_b long, jaccard double",
    )
    trips = mine_contrastive_triplets(
        docs, pairs, "doc_id", k_negatives=3, negative_pool=50
    ).collect()
    by_anchor = {}
    for r in trips:
        by_anchor.setdefault((r["anchor"], r["positive"]), []).append(r["negative"])
    # both orientations of every pair present, 3 negatives each
    assert set(by_anchor) == {(1, 2), (2, 1), (1, 3), (3, 1), (10, 11), (11, 10)}
    assert all(len(v) == 3 for v in by_anchor.values())
    neardups = {1: {2, 3}, 2: {1}, 3: {1}, 10: {11}, 11: {10}}
    for (a, p), negs in by_anchor.items():
        for n in negs:
            assert n != a and n != p and n not in neardups[a]
    # determinism
    again = mine_contrastive_triplets(
        docs, pairs, "doc_id", k_negatives=3, negative_pool=50
    ).collect()
    assert sorted(map(tuple, trips)) == sorted(map(tuple, again))
    # anchors draw different negative sets from the shared pool
    assert len({tuple(sorted(v)) for v in by_anchor.values()}) > 1


def test_epoch_shuffle_deterministic_distinct_permutations(spark):
    """Same epoch -> identical order; different epochs -> different
    permutations of identical content; no global single-partition sort."""
    from bitfilters_spark.operators.sampling import epoch_shuffle

    df = spark.range(2000).select(F.col("id").alias("doc_id"))

    def order_of(epoch):
        out = epoch_shuffle(df, "doc_id", epoch, n_partitions=8)
        # partition-major order == the intended global permutation
        import pandas as pd

        parts = out.withColumn("p", F.spark_partition_id()).toPandas()
        return list(parts.sort_values(["p"], kind="stable")["doc_id"])

    e1a, e1b, e2 = order_of(1), order_of(1), order_of(2)
    assert e1a == e1b
    assert e1a != e2
    assert sorted(e1a) == sorted(e2) == list(range(2000))
    # hash-range partitioning: every partition gets a share (no 1-task sort)
    sizes = (
        epoch_shuffle(df, "doc_id", 1, n_partitions=8)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert len(sizes) == 8 and all(r["count"] > 0 for r in sizes)


def test_temperature_weights_extremes_and_monotonicity():
    from bitfilters_spark.operators.sampling import temperature_weights

    counts = {"big": 90_000, "mid": 9_000, "small": 900}
    # tau=0: uniform targets
    assert set(temperature_weights(counts, 0.0).values()) == {10_000}
    # tau=1: proportional to counts
    w1 = temperature_weights(counts, 1.0)
    assert w1["big"] == 10_000 and w1["mid"] == 1_000 and w1["small"] == 100
    # 0 < tau < 1 sits strictly between: scarce strata gain share
    wh = temperature_weights(counts, 0.5)
    assert w1["small"] / w1["big"] < wh["small"] / wh["big"] < 1.0
    # zero-count strata vanish, never divide-by-zero
    assert "z" not in temperature_weights({"z": 0, "a": 10}, 0.5)


def test_temperature_mixture_sample_rebalances(spark):
    from bitfilters_spark.operators.sampling import temperature_mixture_sample

    rows = [(i, "big") for i in range(8000)] + [
        (100_000 + i, "small") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k long, src string")
    out = temperature_mixture_sample(df, "k", "src", tau=0.0, mask=1023)
    kept = {r["src"]: r["n"] for r in out.groupBy("src").count()
            .withColumnRenamed("count", "n").collect()}
    # uniform target: both strata keep ~500 rows (scarce side kept whole)
    assert kept["small"] > 450
    assert abs(kept["big"] - kept["small"]) < 120
    # deterministic: rerun identical
    again = temperature_mixture_sample(df, "k", "src", tau=0.0, mask=1023)
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in again.collect()
    )


def test_leakage_safe_split_keeps_clusters_together(spark):
    from bitfilters_spark.operators.sampling import hash_split, leakage_safe_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    # chains: (3k, 3k+1), (3k+1, 3k+2) -> triples share a component
    pairs = []
    for k in range(0, 1998, 3):
        pairs += [(k, k + 1), (k + 1, k + 2)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = leakage_safe_split(
        df, "doc_id", pdf, {"train": 8, "val": 1, "test": 1}
    )
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 2000
    for k in range(0, 1998, 3):
        assert rows[k] == rows[k + 1] == rows[k + 2]
    # proportions still roughly honored (clusters of 3, 10% targets)
    import collections
    c = collections.Counter(rows.values())
    assert 0.05 < c["val"] / 2000 < 0.2 and 0.05 < c["test"] / 2000 < 0.2
    # plain hash_split WOULD leak on this corpus (sanity that the guard
    # is actually doing something)
    plain = {r["doc_id"]: r["split"]
             for r in hash_split(df, "doc_id", {"train": 8, "val": 1, "test": 1}).collect()}
    leaked = sum(
        1 for k in range(0, 1998, 3)
        if not (plain[k] == plain[k + 1] == plain[k + 2])
    )
    assert leaked > 0


def test_leakage_safe_split_unpaired_matches_hash_split(spark):
    from bitfilters_spark.operators.sampling import hash_split, leakage_safe_split

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    empty = spark.createDataFrame([], "id_a long, id_b long")
    a = {r["doc_id"]: r["split"] for r in
         leakage_safe_split(df, "doc_id", empty, {"train": 3, "test": 1}).collect()}
    b = {r["doc_id"]: r["split"] for r in
         hash_split(df, "doc_id", {"train": 3, "test": 1}).collect()}
    assert a == b


def test_curriculum_order_stages_then_shuffles(spark):
    from bitfilters_spark.operators.sampling import curriculum_order

    rows = [(i, float(i % 100)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, difficulty double")
    out = curriculum_order(df, "doc_id", "difficulty", n_stages=4, epoch=1)
    got = out.select("doc_id", "difficulty", "stage").toPandas()
    # reading partitions in order yields non-decreasing stages
    stages = got["stage"].tolist()
    assert stages == sorted(stages)
    # equal-population quantile stages (scores uniform 0..99)
    import collections
    c = collections.Counter(stages)
    assert set(c) == {0, 1, 2, 3}
    assert all(150 < v < 350 for v in c.values())
    # stage respects difficulty: max difficulty of stage i <= min of i+2
    for i in range(3):
        assert got[got.stage == i]["difficulty"].max() <= got[got.stage == i + 1]["difficulty"].max()
    # within a stage, epoch hash shuffles (not id order), deterministically
    s0 = got[got.stage == 0]["doc_id"].tolist()
    assert s0 != sorted(s0)
    again = curriculum_order(df, "doc_id", "difficulty", n_stages=4, epoch=1)
    assert again.select("doc_id").toPandas()["doc_id"].tolist() == got["doc_id"].tolist()
    other = curriculum_order(df, "doc_id", "difficulty", n_stages=4, epoch=2)
    assert other.select("doc_id").toPandas()["doc_id"].tolist() != got["doc_id"].tolist()


def test_reservoir_sample_exact_k_and_salt_equivalence(spark):
    """Exactly k rows per key (fewer when the key is small), rank 1..k,
    deterministic across runs, and the salted two-phase form returns the
    IDENTICAL row set and ranks as the plain window."""
    from bitfilters_spark.operators.sampling import reservoir_sample

    rows = [(i, f"k{i % 5}") for i in range(200)] + [(1000, "rare")]
    df = spark.createDataFrame(rows, "id long, key string")

    out = reservoir_sample(df, "key", 7, "id", seed=3).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append((r["rs_rank"], r["id"]))
    for k in ("k0", "k1", "k2", "k3", "k4"):
        assert sorted(r for r, _ in by_key[k]) == list(range(1, 8))
    assert by_key["rare"] == [(1, 1000)]

    again = {(r["key"], r["rs_rank"], r["id"])
             for r in reservoir_sample(df, "key", 7, "id", seed=3).collect()}
    assert again == {(r["key"], r["rs_rank"], r["id"]) for r in out}

    salted = {(r["key"], r["rs_rank"], r["id"])
              for r in reservoir_sample(df, "key", 7, "id", seed=3, salt=4).collect()}
    assert salted == again

    other = {(r["key"], r["rs_rank"], r["id"])
             for r in reservoir_sample(df, "key", 7, "id", seed=4).collect()}
    assert other != again  # a different seed draws a different sample

    # caller-supplied scramble order: engine-free arithmetic, same laws
    from pyspark.sql import functions as F
    sc = (F.col("id") * F.lit(2654435761)) % F.lit(4294967296)
    plain = {(r["key"], r["rs_rank"], r["id"])
             for r in reservoir_sample(df, "key", 7, "id", order_by=sc).collect()}
    salted2 = {(r["key"], r["rs_rank"], r["id"])
               for r in reservoir_sample(df, "key", 7, "id", order_by=sc, salt=4).collect()}
    assert plain == salted2 and plain != again

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        reservoir_sample(df, "key", 0, "id")


def test_reservoir_prefiltered_equals_window_incl_fallback(spark):
    """The threshold pre-filter form must equal the plain window for any
    order_by: a uniform scramble (fast path) AND an adversarial order
    concentrated at the top of the range on a key large enough that the
    filter undershoots (verified fallback path)."""
    from pyspark.sql import functions as F
    from bitfilters_spark.operators.sampling import (
        reservoir_sample, reservoir_sample_prefiltered,
    )

    rows = [(i, f"k{i % 3}") for i in range(3000)] + [(9000, "rare")]
    df = spark.createDataFrame(rows, "id long, key string")
    M = 2**32

    sc = (F.col("id") * F.lit(2654435761)) % F.lit(M)
    want = {(r["key"], r["rs_rank"], r["id"])
            for r in reservoir_sample(df, "key", 7, "id", order_by=sc).collect()}
    got = {(r["key"], r["rs_rank"], r["id"])
           for r in reservoir_sample_prefiltered(
               df, "key", 7, "id", order_by=sc, order_max=M).collect()}
    assert got == want

    # adversarial: all of k0's order values sit at the top of the range
    # (uniformity assumption broken); k0 has 1000 > k*safety rows with
    # safety=8, so T < M and the filter keeps nothing -> fallback must
    # re-rank k0 exactly
    adv = F.when(F.col("key") == "k0", F.lit(M - 10) + F.col("id") % 3)            .otherwise(sc)
    want_a = {(r["key"], r["rs_rank"], r["id"])
              for r in reservoir_sample(df, "key", 7, "id", order_by=adv).collect()}
    got_a = {(r["key"], r["rs_rank"], r["id"])
             for r in reservoir_sample_prefiltered(
                 df, "key", 7, "id", order_by=adv, order_max=M, safety=8).collect()}
    assert got_a == want_a
    assert sum(1 for kk, _, _ in got_a if kk == "k0") == 7


def test_allocate_token_budget_matches_brute_force(spark):
    """Water-filling (#124): distributed max-over-candidates theta equals
    a binary-search brute-force water level on random domain profiles,
    and the budget is met exactly (sum of caps == min(budget, total))."""
    import numpy as np

    from bitfilters_spark.operators.sampling import allocate_token_budget

    def brute_theta(T, B):
        if sum(T) <= B:
            return float("inf")
        lo, hi = 0.0, float(max(T))
        for _ in range(200):
            mid = (lo + hi) / 2
            if sum(min(t, mid) for t in T) < B:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    rng = np.random.default_rng(0)
    for _ in range(5):
        d = int(rng.integers(1, 40))
        T = rng.integers(0, 1000, d).tolist()
        B = int(rng.integers(0, max(1, sum(T) * 12 // 10)))
        df = spark.createDataFrame(
            [(f"d{i}", int(t)) for i, t in enumerate(T)],
            "domain string, tokens long",
        )
        out = allocate_token_budget(df, "domain", "tokens", B, n_partitions=3)
        caps = {r["domain"]: r["cap"] for r in out.collect()}
        th = brute_theta(T, B)
        for i, t in enumerate(T):
            want = float(t) if th == float("inf") else min(float(t), th)
            assert abs(caps[f"d{i}"] - want) < 1e-6
        assert abs(sum(caps.values()) - min(B, sum(T))) < 1e-6 * max(1, B)


def test_allocate_token_budget_semantics(spark):
    """Head capped at theta, tail fully kept; budget >= total keeps all;
    zero-token domain gets keep_frac 0; rows aggregate before allocating."""
    from bitfilters_spark.operators.sampling import allocate_token_budget

    rows = [("big", 600), ("big", 400), ("mid", 300), ("tiny", 50), ("zero", 0)]
    df = spark.createDataFrame(rows, "domain string, tokens long")
    out = {r["domain"]: r for r in
           allocate_token_budget(df, "domain", "tokens", 750).collect()}
    # T = {big:1000, mid:300, tiny:50, zero:0}; theta = 700: 700+min(300,700)
    # -> over; solve: tiny+zero full (50), big/mid capped? mid=300<theta?
    # f(theta)=min(1000,th)+min(300,th)+50 = 750 -> th+300+50=750 -> th=400
    # (valid: 300 <= 400 <= 1000)
    assert abs(out["big"]["cap"] - 400.0) < 1e-9
    assert abs(out["mid"]["cap"] - 300.0) < 1e-9
    assert abs(out["tiny"]["cap"] - 50.0) < 1e-9
    assert out["zero"]["cap"] == 0.0 and out["zero"]["keep_frac"] == 0.0
    assert abs(out["big"]["keep_frac"] - 0.4) < 1e-12
    assert abs(out["mid"]["keep_frac"] - 1.0) < 1e-12
    # budget beyond total: no capping
    all_kept = {r["domain"]: r["keep_frac"] for r in
                allocate_token_budget(df, "domain", "tokens", 10_000).collect()}
    assert all(f == 1.0 for d, f in all_kept.items() if d != "zero")


# --------------------------------------------- weighted budget allocation ---


def _waterfill_reference(caps, ws, budget):
    """Brute-force bisection water-filler: lambda s.t.
    sum(min(cap, w*lambda)) == budget."""
    total = sum(caps)
    if budget >= total:
        return list(caps)
    lo, hi = 0.0, max(c / w for c, w in zip(caps, ws)) + 1.0
    for _ in range(200):
        mid = (lo + hi) / 2
        s = sum(min(c, w * mid) for c, w in zip(caps, ws))
        if s < budget:
            lo = mid
        else:
            hi = mid
    lam = (lo + hi) / 2
    return [min(c, w * lam) for c, w in zip(caps, ws)]


def test_allocate_weighted_budget_matches_brute_force(spark):
    import random

    from bitfilters_spark.operators.sampling import allocate_weighted_budget

    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(1, 12)
        caps = [rng.randint(1, 500) * 1.0 for _ in range(n)]
        ws = [rng.uniform(0.1, 10.0) for _ in range(n)]
        B = rng.uniform(0, sum(caps) * 1.2)
        df = spark.createDataFrame(
            [(f"k{i}", caps[i], ws[i]) for i in range(n)],
            "key string, cap double, w double",
        )
        out = {
            r["key"]: r["alloc"]
            for r in allocate_weighted_budget(
                df, "key", "cap", "w", B, n_partitions=3
            ).collect()
        }
        want = _waterfill_reference(caps, ws, B)
        for i in range(n):
            assert out[f"k{i}"] == pytest.approx(want[i], abs=1e-6), (trial, i)
        assert sum(out.values()) == pytest.approx(min(B, sum(caps)), abs=1e-6)


def test_allocate_weighted_budget_semantics(spark):
    from bitfilters_spark.operators.sampling import allocate_weighted_budget

    rows = [
        ("big", 100.0, 1.0),
        ("small", 2.0, 1.0),
        ("dead", 50.0, 0.0),   # zero weight: no budget
        ("empty", 0.0, 5.0),   # zero capacity
    ]
    df = spark.createDataFrame(rows, "key string, cap double, w double")
    got = {
        r["key"]: r
        for r in allocate_weighted_budget(df, "key", "cap", "w", 12.0).collect()
    }
    # equal weights: small saturates at 2, big gets the remaining 10
    assert got["small"]["alloc"] == pytest.approx(2.0, abs=1e-9)
    assert got["big"]["alloc"] == pytest.approx(10.0, abs=1e-9)
    assert got["dead"]["alloc"] == 0.0 and got["dead"]["fill_frac"] == 0.0
    assert got["empty"]["alloc"] == 0.0
    # budget clears total capacity: every live key fully filled
    full = {
        r["key"]: r
        for r in allocate_weighted_budget(df, "key", "cap", "w", 1e6).collect()
    }
    assert full["big"]["alloc"] == 100.0 and full["big"]["fill_frac"] == 1.0
    assert full["dead"]["alloc"] == 0.0
    # duplicate keys aggregate additively before allocation
    dup = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 1.0)], "key string, cap double, w double"
    )
    agg = allocate_weighted_budget(dup, "key", "cap", "w", 100.0).collect()
    assert len(agg) == 1 and agg[0]["capacity"] == 3.0 and agg[0]["weight"] == 2.0
    with pytest.raises(ValueError, match="budget"):
        allocate_weighted_budget(df, "key", "cap", "w", -1)


def test_allocate_weighted_budget_reduces_to_token_budget(spark):
    """w == 1 for every key must reproduce allocate_token_budget's caps
    (the #124 special case)."""
    from bitfilters_spark.operators.sampling import (
        allocate_token_budget,
        allocate_weighted_budget,
    )

    rows = [("a", 10), ("b", 100), ("c", 1000), ("d", 7)]
    df = spark.createDataFrame(rows, "domain string, tokens long")
    B = 300
    base = {
        r["domain"]: r["cap"]
        for r in allocate_token_budget(df, "domain", "tokens", B).collect()
    }
    wdf = df.select("domain", "tokens", F.lit(1.0).alias("w"))
    got = {
        r["key"]: r["alloc"]
        for r in allocate_weighted_budget(
            wdf, "domain", "tokens", "w", float(B)
        ).collect()
    }
    for k in base:
        assert got[k] == pytest.approx(base[k], abs=1e-9), k


def test_allocate_weighted_budget_from_pagerank(spark):
    """Composition: host authority (pagerank) weights the fetch budget
    across hosts' frontier queues."""
    from bitfilters_spark.operators.graph import pagerank
    from bitfilters_spark.operators.sampling import allocate_weighted_budget

    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (10, 20)], "src long, dst long"
    )
    ranks = pagerank(edges, "src", "dst", iters=2)
    frontier = spark.createDataFrame(
        [(10, 50.0), (20, 50.0), (1, 50.0)], "node long, n_urls double"
    )
    hosts = frontier.join(ranks, "node")
    out = {
        r["key"]: r["alloc"]
        for r in allocate_weighted_budget(
            hosts, "node", "n_urls", "rank", 60.0
        ).collect()
    }
    # equal queue sizes: allocation order follows authority order
    ranks2 = {r["node"]: r["rank"] for r in ranks.collect()}
    order_by_rank = sorted([10, 20, 1], key=lambda n: -ranks2[n])
    order_by_alloc = sorted([10, 20, 1], key=lambda n: -out[n])
    assert order_by_rank == order_by_alloc
    assert min(out.values()) > 0


def test_reservoir_duckdb_parity_unsigned_order(spark):
    """native=False cross-engine reproducibility (ADVICE r11): the
    DuckDB-parity hash is a u64 carried in an i64 column, and DuckDB
    (UBIGINT) sorts it UNSIGNED — the Spark rank order must agree with
    a live DuckDB replay without any signed-cast caveat."""
    import duckdb

    from bitfilters_spark.operators.sampling import reservoir_sample

    rows = [(i, "g") for i in range(64)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        r["rs_rank"]: r["id"]
        for r in reservoir_sample(
            df, "key", 5, "id", seed=3, native=False
        ).collect()
    }
    want = {
        rank: i
        for rank, (i,) in enumerate(
            duckdb.connect()
            .execute(
                "select i from (select unnest(range(64)) i) "
                "order by hash(cast(i + 3 as bigint)), i limit 5"
            )
            .fetchall(),
            start=1,
        )
    }
    assert got == want


def test_mine_hard_negatives_cell_local_ranking(spark):
    """#171: negatives are the anchor's most-similar same-cell
    non-positives — verified against a python cosine replay; positives/
    self never appear; exactly k per (anchor, positive) when the cell
    has enough members; neg_sim matches the true dot product."""
    import numpy as np

    from bitfilters_spark.operators.sampling import mine_hard_negatives
    from bitfilters_spark.operators.similarity import ivf_centroids

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((3, 16)) * 4
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (centers[c] + 0.5 * rng.standard_normal(16)).tolist()))
    docs = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    pairs = spark.createDataFrame(
        [(0, 3), (1, 4), (2, 5)], "id_a long, id_b long"
    )
    C = ivf_centroids(docs, n_centroids=3)
    got = mine_hard_negatives(
        docs, pairs, k_negatives=4, n_centroids=3, centroids=C
    ).collect()
    # every (anchor, positive) orientation present with exactly k rows
    from collections import Counter

    cnt = Counter((r["anchor"], r["positive"]) for r in got)
    assert set(cnt) == {(0, 3), (3, 0), (1, 4), (4, 1), (2, 5), (5, 2)}
    assert all(v == 4 for v in cnt.values())
    vecs = {i: np.array(v) / np.linalg.norm(v) for i, v in rows}
    Cn = np.asarray(C)
    cell = {i: int(np.argmax(vecs[i] @ Cn.T)) for i, _ in rows}
    pairset = {(0, 3), (3, 0), (1, 4), (4, 1), (2, 5), (5, 2)}
    for (a, p), _ in cnt.items():
        negs = sorted(
            [(r["negative"], r["neg_sim"]) for r in got
             if r["anchor"] == a and r["positive"] == p],
            key=lambda x: (-x[1], x[0]),
        )
        # replay: same-cell non-positive non-self ranked by cosine
        cands = [
            (i, float(vecs[a] @ vecs[i]))
            for i, _ in rows
            if i != a and cell[i] == cell[a] and (a, i) not in pairset
        ]
        cands.sort(key=lambda x: (-x[1], x[0]))
        assert [n for n, _ in negs] == [i for i, _ in cands[:4]], (a, p)
        for (n, s), (i, t) in zip(negs, cands[:4]):
            assert abs(s - t) < 1e-9
        assert all((a, n) not in pairset and n != a for n, _ in negs)
    import pytest as _p
    with _p.raises(ValueError, match="k_negatives"):
        mine_hard_negatives(docs, pairs, k_negatives=0)
