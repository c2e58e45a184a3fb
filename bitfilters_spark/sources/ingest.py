"""Robust semi-structured ingest: read crawl-scale JSONL/CSV where SOME
records are broken, without losing either the good rows or the evidence.

At 100 TB a malformed record is a certainty, and the two failure modes
both lose data: FAILFAST kills the job on the first bad byte,
DROPMALFORMED silently discards rows with no trace. This module keeps
Spark's PERMISSIVE path (scan-speed, schema-pruned) and makes the
corrupt-record column a first-class output: good rows come back clean,
bad rows are COUNTED and optionally QUARANTINED (raw text + source file
+ reason) for replay after the parser/schema is fixed — the standard
dead-letter pattern.

Each branch is its own scan definition (see split_corrupt for why the
analyzer forces that); both prune independently, so the good path reads
only the requested columns and the quarantine pass is the only extra
cost (∝ bad rows, which are parsed but never widened).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def robust_read(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    quarantine_path: str | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Good rows of a JSONL/CSV dataset under an explicit ``schema``
    (DDL string — explicit because schema inference both costs an extra
    scan and hides drift). Malformed records are dropped from the
    result; with ``quarantine_path`` they are first written there as
    (raw record, source file, format) parquet for later replay.

    Returns the clean DataFrame; attach `.bad_count` semantics via
    :func:`ingest_report` when the caller wants the numbers."""
    good, bad = split_corrupt(spark, path, schema, fmt, options)
    if quarantine_path is not None:
        bad.write.mode("append").parquet(quarantine_path)
    return good


def split_corrupt(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    options: dict | None = None,
) -> tuple:
    """(good, bad): good = parsed rows with the declared columns; bad =
    (raw, source_file, fmt) rows that failed to parse. Two independent
    scan definitions over the same files (DROPMALFORMED for good,
    PERMISSIVE + corrupt column for bad) — required because Spark's
    analyzer rejects any plan whose pruned scan schema is corrupt-only,
    which a shared-scan split hits as soon as either branch is counted.
    Each branch still prunes independently; a consumer that only reads
    the good side never parses or carries the corrupt column at all.

    CAVEAT: bad rows downstream of the ``raw`` projection must keep
    referencing ``raw`` (e.g. ``agg(count("raw"))``, not ``count()``)
    for the same analyzer reason; the quarantine write does."""
    if fmt not in ("json", "csv"):
        raise ValueError(f"fmt must be json|csv, got {fmt!r}")

    def make_reader(mode: str, with_corrupt: bool):
        sch = f"{schema}, {CORRUPT_COL} STRING" if with_corrupt else schema
        reader = spark.read.format(fmt).schema(sch).option("mode", mode)
        if with_corrupt:
            reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return reader.load(path)

    # good branch: DROPMALFORMED with NO corrupt column — Spark's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN analyzer rule rejects any plan
    # whose pruned scan schema is corrupt-only (count() over a
    # corrupt-filtered frame prunes down to exactly that), so the good
    # branch must never reference the corrupt column at all
    good = make_reader("DROPMALFORMED", with_corrupt=False)
    df = make_reader("PERMISSIVE", with_corrupt=True)
    # Spark disallows queries whose only source reference is the corrupt
    # column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the lazy per-column
    # parse would otherwise never attempt the real columns). Referencing
    # a real column in the filter keeps the parse honest without caching
    # the scan; only bad rows ever materialize downstream of it.
    first_col = df.columns[0]
    bad = (
        df.where(F.col(CORRUPT_COL).isNotNull())
        .select(
            # coalesce keeps a REAL column in the pruned scan schema (a
            # where-clause or fold-away reference gets pruned back to
            # corrupt-only and re-trips the analyzer); for bad rows the
            # corrupt column is non-null, so the value is always `raw`.
            F.coalesce(
                F.col(CORRUPT_COL), F.col(first_col).cast("string")
            ).alias("raw"),
            F.input_file_name().alias("source_file"),
            F.lit(fmt).alias("fmt"),
        )
    )
    return good, bad


def ingest_report(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    options: dict | None = None,
) -> dict:
    """{'good': n, 'bad': n, 'bad_files': {file: n_bad}} — the ingest
    health check a pipeline gate runs before committing a crawl batch.
    One scan per branch; bad_files maps each offending file to its bad
    count (metadata-scale) so operators know what to re-fetch first.
    The bad-side aggregates count ``raw`` (never bare ``count(*)``) so
    the pruned scan schema keeps a real column — see split_corrupt."""
    good, bad = split_corrupt(spark, path, schema, fmt, options)
    per_file = {
        r["source_file"]: r["n"]
        for r in bad.groupBy("source_file").agg(F.count("raw").alias("n")).collect()
    }
    return {
        "good": good.count(),
        "bad": sum(per_file.values()),
        "bad_files": dict(sorted(per_file.items())),
    }


def streaming_robust_ingest(
    stream: DataFrame,
    schema: str,
    out_path: str,
    quarantine_path: str,
    line_col: str = "value",
):
    """Streaming dead-letter ingest: a TEXT stream of JSONL (e.g.
    ``spark.readStream.text(dir)``) splits per micro-batch into parsed
    rows (appended to ``out_path``) and unparseable lines (appended to
    ``quarantine_path`` as (raw, batch_id)). Parsing uses ``from_json``
    over the text column — a null parse of a non-null line IS the
    corrupt signal, so the batch path's corrupt-column analyzer
    restriction never applies and both branches are plain filters.

    Returns a ``writeStream``-ready object::

        q = streaming_robust_ingest(spark.readStream.text(d), sch,
                                    good_dir, bad_dir) \\
            .option("checkpointLocation", ckpt).start()

    Replay caveat: plain appends — pair with an upstream exactly-once
    source or a batch-id marker when re-delivered batches must not
    duplicate (same contract as ``streaming_indexed_sink``)."""

    full_schema = f"{schema}, {CORRUPT_COL} STRING"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # from_json PERMISSIVE yields a struct of NULL FIELDS for a bad
        # line (not a null struct), so the corrupt-record column inside
        # the struct schema is the reliable signal
        parsed = batch_df.select(
            F.col(line_col).alias("__raw"),
            F.from_json(
                F.col(line_col),
                full_schema,
                {"columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("__p"),
        ).where(F.trim("__raw") != "")
        good = (
            parsed.where(F.col(f"__p.{CORRUPT_COL}").isNull())
            .select("__p.*")
            .drop(CORRUPT_COL)
        )
        bad = parsed.where(F.col(f"__p.{CORRUPT_COL}").isNotNull()).select(
            F.col("__raw").alias("raw"), F.lit(batch_id).alias("batch_id")
        )
        good.write.mode("append").parquet(out_path)
        bad.write.mode("append").parquet(quarantine_path)

    return stream.writeStream.foreachBatch(fold).outputMode("append")
