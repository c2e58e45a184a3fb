"""Generic source/sink helpers.

The reference rides DuckDB's readers (parquet/csv/json); the Spark-native
equivalents keep everything declarative so Catalyst retains pushdown and
pruning on formats that support it. Format is inferred from the path
extension unless given explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
}


def infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    raise ValueError(f"cannot infer source format from {path!r}; pass format=")


def read_any(
    spark: SparkSession,
    path: str,
    format: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Read any supported source declaratively (no driver materialization).
    CSV defaults to header+inferSchema unless a schema is given; JSON is
    line-delimited by default (Spark semantics)."""
    fmt = format or infer_format(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        if path.rstrip("/").endswith(".tsv"):
            options.setdefault("sep", "\t")
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)


def write_any(
    df: DataFrame,
    path: str,
    format: str | None = None,
    mode: str = "overwrite",
    partition_by: list | None = None,
    **options,
) -> None:
    """Write to any supported sink. ``partition_by`` maps to directory
    partitioning (the scan-pruning lever for downstream readers)."""
    fmt = format or infer_format(path)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
