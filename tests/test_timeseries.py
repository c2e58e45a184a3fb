import datetime as dt

from pyspark.sql import functions as F

from bitfilters_spark.operators.timeseries import asof_join, session_stats, sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap_boundary(spark):
    # gaps: 10 min (same session), exactly 30 min (same — strict >), 31 min (new)
    rows = [
        (1, 1, _ts(0)),
        (2, 1, _ts(10)),
        (3, 1, _ts(40)),   # 30:00 after event 2 -> same session
        (4, 1, _ts(11)),   # out-of-order input; sorts between 2 and 3
        (5, 1, _ts(59)),   # within 30 min of 3
        (6, 2, _ts(0)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, "user_id", "ts", "event_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6}

    rows31 = [(1, 1, _ts(0)), (2, 1, _ts(31))]
    df31 = spark.createDataFrame(rows31, "event_id long, user_id long, ts timestamp")
    got31 = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df31, "user_id", "ts", "event_id").collect()
    }
    assert got31 == {1: 1, 2: 2}


def test_session_stats(spark):
    rows = [(1, 1, _ts(0)), (2, 1, _ts(5)), (3, 1, _ts(50)), (4, 2, _ts(1))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in session_stats(df, "user_id").collect()
    }
    assert got == {(1, 1): 2, (1, 3): 1, (2, 4): 1}


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(20)), (4, 2, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 7.0), (1, _ts(15), 9.0)],
        "user_id long, ts timestamp, v double",
    )
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(left, right, ["user_id"], ["v"]).collect()
    }
    # event 1: before any right row -> NULL; event 2: ts == right ts -> 7.0
    # event 3: latest <= 20:00 is 9.0; event 4: other user -> NULL
    assert got == {1: None, 2: 7.0, 3: 9.0, 4: None}


def test_asof_join_rejects_collisions(spark):
    left = spark.createDataFrame([(1, 1, _ts(0), 1.0)], "event_id long, user_id long, ts timestamp, v double")
    right = spark.createDataFrame([(1, _ts(0), 2.0)], "user_id long, ts timestamp, v double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["user_id"], ["v"])


def test_range_join_edges(spark):
    from bitfilters_spark.operators.timeseries import range_join

    pts = spark.createDataFrame(
        [(1, 0.0), (2, 4.999), (3, 5.0), (4, 10.0), (5, 7.3)],
        "pid long, v double",
    )
    iv = spark.createDataFrame(
        [(10, 0.0, 5.0), (11, 5.0, 10.0), (12, 7.0, 8.0), (13, 9.0, 9.0)],
        "iid long, lo double, hi double",
    )  # 13 is empty (lo == hi): must emit nothing, not descend
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, "v", bucket_width=2.0).collect()
    )
    # hi exclusive: v=5.0 not in [0,5), but in [5,10); 7.3 in both 11 and 12
    assert got == [(1, 10), (2, 10), (3, 11), (5, 11), (5, 12)]


def test_range_join_matches_nested_loop(spark):
    import random

    from bitfilters_spark.operators.timeseries import range_join

    rng = random.Random(3)
    pts = spark.createDataFrame(
        [(i, rng.uniform(0, 50)) for i in range(300)], "pid long, v double"
    )
    iv = spark.createDataFrame(
        [(j, lo := rng.uniform(0, 45), lo + rng.uniform(0, 8)) for j in range(30)],
        "iid long, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, "v", bucket_width=3.0).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(
            iv, (F.col("lo") <= F.col("v")) & (F.col("v") < F.col("hi"))
        ).collect()
    )
    assert got == want


def test_asof_join_multiple_right_cols(spark):
    import datetime as dt

    _t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, 1, _t(10)), (2, 1, _t(30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t(5), 7.0, "a"), (1, _t(20), 9.0, "b")],
        "user_id long, ts timestamp, v double, tag string",
    )
    got = {
        r["event_id"]: (r["v"], r["tag"])
        for r in asof_join(left, right, ["user_id"], ["v", "tag"]).collect()
    }
    assert got == {1: (7.0, "a"), 2: (9.0, "b")}
