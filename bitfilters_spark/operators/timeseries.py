"""Time-series operators: sessionization and as-of join.

Standard event-pipeline operators the reference's engine (DuckDB) gets
from SQL window functions / ASOF JOIN; here each is ONE hash shuffle on
the entity key followed by JVM window functions — no UDFs, no per-key
driver work, so the plan survives arbitrary scale-up as long as a single
entity's history fits a task (salt mega-entities upstream if not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def ts_micros(df: DataFrame, ts_col: str) -> Column:
    """Microseconds-since-epoch for a timestamp column of either flavor.

    ``unix_micros`` only accepts TIMESTAMP (with local tz); the test data's
    parquet reads as TIMESTAMP_NTZ. Cast NTZ through TIMESTAMP first —
    with a fixed session timezone (tests pin UTC) this is exact, and gap
    arithmetic only ever uses differences, where any constant offset
    cancels."""
    c = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        c = c.cast("timestamp")
    return F.unix_micros(c)


def sessionize(
    df: DataFrame,
    by: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign each row a session id: a new session starts when the gap to
    the entity's previous event exceeds ``gap_minutes``. The session id is
    the min ``id_col`` of the session (stable, join-able back to rows).

    lag + cumulative-sum over one (by)-partitioned window: a single
    shuffle, whole-stage-codegen window exec.
    """
    w = Window.partitionBy(by).orderBy(ts_col, id_col)
    gap_us = int(gap_minutes * 60_000_000)
    us = ts_micros(df, ts_col)
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_n = df.withColumn("__sess_n", F.sum(is_new).over(wcum))
    wsess = Window.partitionBy(by, "__sess_n")
    return (
        with_n.withColumn("session_id", F.min(id_col).over(wsess))
        .drop("__sess_n")
    )


def session_stats(
    df: DataFrame,
    by: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup: (by, session_id, n_events, start/end)."""
    s = sessionize(df, by, ts_col, id_col, gap_minutes)
    return s.groupBy(by, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
) -> DataFrame:
    """Point-in-interval join (``lo <= point < hi``) via bucketed blocking.

    Spark plans a raw inequality join as BroadcastNestedLoop (small side)
    or a cartesian per key — quadratic at scale. Bucketing makes it an
    EQUI-join: each interval replicates to every ``bucket_width``-wide
    bucket it overlaps, each point maps to one bucket, the join key is the
    bucket id, and the exact range predicate re-checks candidates.
    Replication factor = avg interval length / bucket_width + 1; pick
    ``bucket_width`` near the typical interval length.
    """
    pb = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    lo_b = F.floor(F.col(lo_col) / bucket_width).cast("long")
    hi_b_raw = F.floor(F.col(hi_col) / bucket_width).cast("long")
    # hi is exclusive: an interval ending exactly on a bucket edge does not
    # reach into that bucket
    hi_b = F.when(
        F.col(hi_col) == hi_b_raw.cast("double") * bucket_width, hi_b_raw - 1
    ).otherwise(hi_b_raw)
    # guard: sequence(a, b) DESCENDS for b < a (Spark 4), which would
    # fabricate buckets for empty intervals — emit no buckets instead
    buckets = F.when(hi_b >= lo_b, F.sequence(lo_b, hi_b)).otherwise(
        F.array().cast("array<long>")
    )
    ib = intervals.withColumn("__bucket", F.explode(buckets))
    return (
        pb.join(ib, "__bucket")
        .where((F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list,
    right_cols: list,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Left as-of join: attach, to every left row, ``right_cols`` from the
    LATEST right row with ``right.ts <= left.ts`` within the same ``by``
    group (NULLs where no right row precedes).

    Union-window realization: tag and union both sides, sort each group by
    (ts, right-before-left), and carry right values forward with
    ``last(ignorenulls)``. ONE shuffle on the group key — versus a range
    join's per-key quadratic candidate set. Right rows should be unique
    per (by, ts); pre-aggregate if not (ties would be resolved by sort
    order, not semantics).
    """
    by = list(by)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols {sorted(clash)} collide with left columns; rename first")
    l_tagged = left.withColumn("__is_left", F.lit(1))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *by, F.col(right_ts).alias(left_ts), *right_cols
    ).withColumn("__is_left", F.lit(0))
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(l_tagged.dtypes)[c]))
    combined = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    w = (
        Window.partitionBy(*by)
        .orderBy(left_ts, "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in right_cols:
        combined = combined.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return combined.where(F.col("__is_left") == 1).drop("__is_left")
