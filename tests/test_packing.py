"""Token-budget shard packing: the two-phase distributed prefix sum must
equal the sequential greedy assignment for any partitioning and any
(unsorted) input order."""

import random

from pyspark.sql import functions as F

from bitfilters_spark.operators.packing import pack_shards


def _expected(rows, shard_weight):
    out = {}
    prefix = 0
    for i, w in sorted(rows):
        out[i] = (w, prefix, prefix // shard_weight)
        prefix += w
    return out


def test_pack_matches_sequential_greedy(spark):
    rng = random.Random(5)
    rows = [(i, rng.randrange(0, 500)) for i in range(1000)]
    shuffled = rows[:]
    rng.shuffle(shuffled)
    df = spark.createDataFrame(shuffled, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["w"], r["prefix_weight"], r["shard"])
        for r in pack_shards(df, "doc_id", "w", 3000, n_partitions=7).collect()
    }
    assert got == _expected(rows, 3000)


def test_pack_single_partition_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5), (4, 10)], "doc_id long, w long"
    )
    got = {
        r["doc_id"]: (r["prefix_weight"], r["shard"])
        for r in pack_shards(df, "doc_id", "w", 12, n_partitions=1).collect()
    }
    # weights: 10, 0, 5, 10 -> prefixes 0, 10, 10, 15
    assert got == {1: (0, 0), 2: (10, 0), 3: (10, 0), 4: (15, 1)}


def test_pack_empty(spark):
    df = spark.createDataFrame([], "doc_id long, w long")
    assert pack_shards(df, "doc_id", "w", 100).count() == 0


def test_pack_shard_sizes_bounded(spark):
    # a doc straddling a boundary charges its whole weight to the earlier
    # shard, so every non-final shard's total is within one max-doc-weight
    # of the target on either side
    rng = random.Random(9)
    rows = [(i, rng.randrange(1, 200)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    per_shard = (
        pack_shards(df, "doc_id", "w", 5000, n_partitions=5)
        .groupBy("shard")
        .agg(F.sum("w").alias("t"))
        .collect()
    )
    last = max(r["shard"] for r in per_shard)
    for r in per_shard:
        if r["shard"] != last:
            assert 5000 - 200 < r["t"] < 5000 + 200


# ---------------------------------------------------- sequence packing ---


def test_pack_sequences_invariants(spark):
    """Every row lands in exactly one sequence, no sequence exceeds
    capacity, offsets tile each sequence without overlap, and per
    partition at most one sequence ends <= half full (the any-fit
    guarantee that bounds padding waste)."""
    from collections import defaultdict

    from bitfilters_spark.operators.packing import pack_sequences

    rows = [(i, 1 + (i * 37) % 900) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(8)
    out = pack_sequences(df, "doc_id", "n_tokens", capacity=1024).collect()
    assert len(out) == 2000
    assert {r["doc_id"] for r in out} == {i for i, _ in rows}
    by_seq = defaultdict(list)
    for r in out:
        by_seq[r["seq"]].append(r)
    half_empty_by_pid = defaultdict(int)
    for seq, members in by_seq.items():
        total = sum(r["n_tokens"] for r in members)
        assert total <= 1024
        # offsets tile the sequence: sorted offsets == running prefix
        members.sort(key=lambda r: r["offset"])
        run = 0
        for r in members:
            assert r["offset"] == run
            run += r["n_tokens"]
        if total * 2 <= 1024:
            half_empty_by_pid[seq >> 40] += 1
    assert all(v <= 1 for v in half_empty_by_pid.values()), half_empty_by_pid
    # weights survive the round trip
    w_in = dict(rows)
    assert all(r["n_tokens"] == w_in[r["doc_id"]] for r in out)


def test_pack_sequences_oversize_row_raises(spark):
    import pytest

    from bitfilters_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 10), (2, 5000)], "doc_id long, n_tokens long")
    with pytest.raises(Exception, match="chunk oversize"):
        pack_sequences(df, "doc_id", "n_tokens", capacity=1024).collect()


def test_pack_sequences_empty_and_null_weights(spark):
    from bitfilters_spark.operators.packing import pack_sequences

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(empty, "doc_id", "n_tokens", 128).count() == 0
    withnull = spark.createDataFrame(
        [(1, None), (2, 100)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: r for r in pack_sequences(withnull, "doc_id", "n_tokens", 128).collect()}
    assert out[1]["n_tokens"] == 0  # NULL counts as 0, still packed
    assert len(out) == 2


def test_pack_sequences_beats_no_packing(spark):
    """Fill-factor sanity: packed sequence count approaches the token
    lower bound instead of one-sequence-per-doc."""
    import math

    from bitfilters_spark.operators.packing import pack_sequences

    rows = [(i, 100 + (i % 5)) for i in range(1000)]  # ~100-token docs
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(4)
    out = pack_sequences(df, "doc_id", "n_tokens", capacity=2048)
    n_seqs = out.select("seq").distinct().count()
    lower = math.ceil(sum(w for _, w in rows) / 2048)
    assert n_seqs <= lower + 4  # at most one slack bin per partition


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    """Shard dirs land on disk with every row exactly once, in-shard
    document order follows the packing prefix, and the manifest's
    row/weight totals are exact."""
    from bitfilters_spark.operators.packing import pack_shards, write_training_shards

    payload = spark.createDataFrame(
        [(i, f"doc {i}", 10 + i % 5) for i in range(200)],
        "doc_id long, text string, n_tokens long",
    )
    assigned = pack_shards(payload, "doc_id", "n_tokens", shard_weight=300)
    dest = str(tmp_path / "shards")
    manifest = write_training_shards(assigned, payload, "doc_id", dest)
    back = spark.read.parquet(dest)
    assert back.count() == 200
    assert {r["doc_id"] for r in back.collect()} == set(range(200))
    # manifest totals match the assignment exactly
    want = {
        int(r["shard"]): (int(r["n"]), int(r["wt"]))
        for r in assigned.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("wt"))
        .collect()
    }
    assert {s: (m["n_rows"], m["weight"]) for s, m in manifest.items()} == want
    # every shard directory exists and holds only its own rows
    got_shards = {int(r["shard"]) for r in back.select("shard").distinct().collect()}
    assert got_shards == set(manifest)
    # no shard exceeds its budget by more than one document's weight
    for s, m in manifest.items():
        assert m["weight"] <= 300 + 14


def test_assign_row_ids_contiguous_in_order(spark):
    from bitfilters_spark.operators.packing import assign_row_ids

    import random

    keys = list(range(0, 4000, 4))
    random.Random(3).shuffle(keys)
    df = spark.createDataFrame([(k, f"p{k}") for k in keys], "k long, payload string")
    out = assign_row_ids(df, "k", n_partitions=6).collect()
    assert len(out) == 1000
    by_key = {r["k"]: r["row_id"] for r in out}
    # contiguous 0..N-1, ascending with the order column
    assert sorted(by_key.values()) == list(range(1000))
    for i, k in enumerate(sorted(by_key)):
        assert by_key[k] == i
    # payload survives
    assert all(r["payload"] == f"p{r['k']}" for r in out)


def test_assign_row_ids_rejects_duplicate_order_col(spark):
    """A duplicate order key would silently multiply rows through the
    join-back and hand out duplicate ids — must raise instead."""
    import pytest

    from bitfilters_spark.operators.packing import assign_row_ids

    df = spark.createDataFrame([(1, "a"), (2, "b"), (1, "c")], "k long, v string")
    with pytest.raises(ValueError, match="not unique"):
        assign_row_ids(df, "k").collect()


def test_materialize_sequences_round_trip(spark):
    """pack_sequences assignment + token arrays -> packed rows: docs
    concatenate in offset order with EOS separators, padding fixes the
    shape, and every token of every doc appears exactly once."""
    from pyspark.sql import functions as F

    from bitfilters_spark.operators.packing import (
        materialize_sequences,
        pack_sequences,
    )

    docs = [(i, list(range(i * 100, i * 100 + 3 + (i % 3)))) for i in range(10)]
    enc = spark.createDataFrame(
        [(i, t) for i, t in docs], "doc_id long, token_ids array<long>"
    )
    # weights include the EOS token each doc will gain
    weighted = enc.select(
        "doc_id", (F.size("token_ids") + 1).alias("n_tokens")
    )
    assignment = pack_sequences(weighted, "doc_id", "n_tokens", capacity=16)
    packed = materialize_sequences(
        assignment, enc, "doc_id", eos_id=-1, pad_to=16, pad_id=0
    ).collect()
    toks_by_doc = dict(docs)
    seen = []
    for r in packed:
        assert len(r["token_ids"]) == 16  # padded to shape
        assert r["n_tokens"] <= 16
        body = r["token_ids"][: r["n_tokens"]]
        # EOS after every doc; split and match doc bodies exactly
        parts = []
        cur = []
        for t in body:
            if t == -1:
                parts.append(cur)
                cur = []
            else:
                cur.append(t)
        assert cur == []  # body ends on an EOS
        assert len(parts) == r["n_docs"]
        seen.extend(parts)
    assert sorted(map(tuple, seen)) == sorted(
        tuple(t) for t in toks_by_doc.values()
    )


def test_pack_shards_order_cols_cluster_packing(spark):
    """order_cols packs in (cluster, id) order — the in-context
    pretraining layout: same-cluster docs adjacent, prefix sums equal to
    the sequential replay over the reordered stream, and shard
    boundaries honored."""
    from bitfilters_spark.operators.packing import pack_shards

    rows = [(i, (i * 37) % 4, 3 + (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, cluster long, n long")
    out = {
        r["doc_id"]: (r["prefix_weight"], r["shard"])
        for r in pack_shards(
            df, "doc_id", "n", 25, order_cols=["cluster"]
        ).collect()
    }
    # sequential replay in (cluster, id) order
    seq = sorted(rows, key=lambda t: (t[1], t[0]))
    run = 0
    for did, _, n in seq:
        assert out[did] == (run, run // 25), did
        run += n
    # without order_cols: plain id order (the pinned original contract)
    out2 = {
        r["doc_id"]: r["prefix_weight"]
        for r in pack_shards(df, "doc_id", "n", 25).collect()
    }
    run = 0
    for did, _, n in sorted(rows):
        assert out2[did] == run
        run += n


def test_packing_report(spark):
    """packing_report over a pack_shards run: counts/fills against a
    python replay; fill_rate with the budget; weight_col naming."""
    from bitfilters_spark.operators.packing import pack_shards, packing_report

    rows = [(i, 3 + (i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    packed = pack_shards(df, "doc_id", "n", 40)
    import pytest

    rep = packing_report(packed, "shard", "n", shard_weight=40).collect()[0]

    fills = {}
    run = 0
    for _, n in sorted(rows):
        fills[run // 40] = fills.get(run // 40, 0) + n
        run += n
    total = sum(n for _, n in rows)
    assert rep["n_shards"] == len(fills)
    assert rep["n_docs"] == 100
    assert rep["total_weight"] == total
    assert rep["min_fill"] == min(fills.values())
    assert rep["max_fill"] == max(fills.values())
    assert rep["mean_fill"] == pytest.approx(total / len(fills))
    assert rep["fill_rate"] == pytest.approx(total / (len(fills) * 40.0))
    import pytest as _p
    with _p.raises(ValueError, match="shard_weight"):
        packing_report(packed, "shard", "n", shard_weight=0)


def test_export_hf_layout_flat_deterministic(spark, tmp_path):
    """#169: flat <split>-NNNNN-of-NNNNN.parquet naming, one file per
    shard, a parseable manifest, staging dir gone, and a byte-stable
    re-export (shard bytes are a pure function of the assignment)."""
    import glob
    import json
    import os

    from bitfilters_spark.operators.packing import (
        export_hf_layout,
        pack_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "w " * (i % 9), 3 + i % 9) for i in range(40)],
        "doc_id long, text string, n_tokens int",
    )
    assigned = pack_shards(
        docs.select("doc_id", "n_tokens"), "doc_id", "n_tokens", 40
    )
    out = str(tmp_path / "hf")
    man = export_hf_layout(assigned, docs, "doc_id", out)
    files = sorted(os.path.basename(p) for p in glob.glob(f"{out}/train-*.parquet"))
    total = man["n_shards"]
    assert files == [f"train-{i:05d}-of-{total:05d}.parquet" for i in range(total)]
    assert set(man["shards"]) == set(files)
    assert not os.path.exists(f"{out}/__stage")
    disk = json.loads(open(f"{out}/train_manifest.json").read())
    assert disk == man
    # every payload row survives, exactly once, with its shard's rows
    back = spark.read.parquet(f"{out}/train-*.parquet")
    assert back.count() == 40
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == list(range(40))
    assert sum(v["n_rows"] for v in man["shards"].values()) == 40
    # deterministic bytes: re-export and byte-compare every shard file
    before = {f: open(f"{out}/{f}", "rb").read() for f in files}
    export_hf_layout(assigned, docs, "doc_id", out)
    for f in files:
        assert open(f"{out}/{f}", "rb").read() == before[f], f


def test_export_hf_layout_r13_review_fixes(spark, tmp_path):
    """r13 second review pass: (a) a re-export with FEWER shards clears
    every stale <split>-*-of-*.parquet; (b) the manifest counts only
    rows the payload actually has; (c) zero-weight ties sort by id —
    byte-deterministic even with duplicate prefix_weights."""
    import glob
    import os

    from bitfilters_spark.operators.packing import (
        export_hf_layout,
        pack_shards,
    )

    # zero-weight docs everywhere: prefix_weight ties on purpose
    docs = spark.createDataFrame(
        [(i, f"d{i}", 0 if i % 3 else 7) for i in range(30)],
        "doc_id long, text string, n_tokens int",
    )
    assigned = pack_shards(
        docs.select("doc_id", "n_tokens"), "doc_id", "n_tokens", 20
    )
    out = str(tmp_path / "hf2")
    man1 = export_hf_layout(assigned, docs, "doc_id", out)
    files1 = sorted(
        os.path.basename(p) for p in glob.glob(f"{out}/train-*.parquet")
    )
    before = {f: open(f"{out}/{f}", "rb").read() for f in files1}
    export_hf_layout(assigned, docs, "doc_id", out)
    for f in files1:  # zero-weight ties byte-stable across re-exports
        assert open(f"{out}/{f}", "rb").read() == before[f], f
    # re-export with FEWER shards: no stale files survive the glob
    assigned2 = pack_shards(
        docs.select("doc_id", "n_tokens"), "doc_id", "n_tokens", 1000
    )
    man2 = export_hf_layout(assigned2, docs, "doc_id", out)
    files2 = sorted(
        os.path.basename(p) for p in glob.glob(f"{out}/train-*.parquet")
    )
    assert man2["n_shards"] < man1["n_shards"]
    assert files2 == [
        f"train-{i:05d}-of-{man2['n_shards']:05d}.parquet"
        for i in range(man2["n_shards"])
    ]
    assert spark.read.parquet(f"{out}/train-*.parquet").count() == 30
    # manifest counts only ids the payload actually has
    man3 = export_hf_layout(
        assigned2, docs.where("doc_id < 20"), "doc_id", out
    )
    assert sum(v["n_rows"] for v in man3["shards"].values()) == 20
    assert spark.read.parquet(f"{out}/train-*.parquet").count() == 20


def test_export_hf_layout_crash_safety(spark, tmp_path, monkeypatch):
    """r14 (VERDICT r13 "what's wrong" #1): the publish order is
    rename-first / manifest-as-commit-point / sweep-last, so a crash at
    ANY stage of a re-export leaves a manifest on disk whose named
    files ALL exist and read back complete — never a manifest pointing
    at deleted files. Simulated by interrupting (a) mid-renames and
    (b) just before the manifest write, then healing by re-running."""
    import glob
    import json
    import os

    from bitfilters_spark.operators.packing import (
        export_hf_layout,
        pack_shards,
    )
    from bitfilters_spark.streaming import state_io

    docs = spark.createDataFrame(
        [(i, f"d{i}", 0 if i % 3 else 7) for i in range(30)],
        "doc_id long, text string, n_tokens int",
    )
    one_shard = pack_shards(
        docs.select("doc_id", "n_tokens"), "doc_id", "n_tokens", 1000
    )
    two_shards = pack_shards(
        docs.select("doc_id", "n_tokens"), "doc_id", "n_tokens", 40
    )
    out = str(tmp_path / "hf_crash")

    def readable():
        """The reader contract: every manifest-named file exists and
        the manifest-described split reads back in full."""
        man = json.loads(open(f"{out}/train_manifest.json").read())
        total_rows = 0
        for f in man["shards"]:
            assert os.path.exists(f"{out}/{f}"), f"manifest names missing {f}"
            total_rows += spark.read.parquet(f"{out}/{f}").count()
        assert total_rows == sum(v["n_rows"] for v in man["shards"].values())
        return man

    man1 = export_hf_layout(one_shard, docs, "doc_id", out)
    assert man1["n_shards"] == 1 and readable() == man1

    # (a) crash mid-renames of a DIFFERENT-total re-export: the second
    # rename dies after the first new file landed; the OLD export must
    # still be fully readable (no collisions -> nothing was deleted)
    real_rename = state_io.rename
    calls = {"n": 0}

    def boom_rename(src, dst, spark_=None):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash mid-renames")
        return real_rename(src, dst, spark_)

    monkeypatch.setattr(state_io, "rename", boom_rename)
    try:
        export_hf_layout(two_shards, docs, "doc_id", out)
        raise AssertionError("simulated crash did not fire")
    except RuntimeError as e:
        assert "simulated crash" in str(e)
    monkeypatch.setattr(state_io, "rename", real_rename)
    assert readable() == man1  # old export intact, old manifest valid

    # heal: re-running the same export completes and sweeps stale files
    man2 = export_hf_layout(two_shards, docs, "doc_id", out)
    assert man2["n_shards"] == 2 and readable() == man2
    on_disk = sorted(
        os.path.basename(p) for p in glob.glob(f"{out}/train-*.parquet")
    )
    assert on_disk == sorted(man2["shards"])  # stale 1-shard file swept

    # (b) crash between the renames and the manifest write: new files
    # are in place but the OLD manifest is still the commit point and
    # all its files still exist (different totals -> no collisions)
    real_write = state_io.write_bytes

    def boom_write(path, data, spark_=None):
        raise RuntimeError("simulated crash before manifest")

    monkeypatch.setattr(state_io, "write_bytes", boom_write)
    try:
        export_hf_layout(one_shard, docs, "doc_id", out)
        raise AssertionError("simulated crash did not fire")
    except RuntimeError as e:
        assert "simulated crash" in str(e)
    monkeypatch.setattr(state_io, "write_bytes", real_write)
    assert readable() == man2  # the 2-shard export is still committed

    # heal again: the 1-shard export commits and the glob is clean
    man3 = export_hf_layout(one_shard, docs, "doc_id", out)
    assert readable() == man3
    on_disk = sorted(
        os.path.basename(p) for p in glob.glob(f"{out}/train-*.parquet")
    )
    assert on_disk == sorted(man3["shards"])
