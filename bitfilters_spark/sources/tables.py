"""Test-data table loading (TPC-H-ish star schema + events/documents/embeddings).

Plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown, column
pruning and partition pruning — never pre-collect or pre-transform here.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession

_SHIPPED: set = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``bitfilters_spark`` importable on Spark's Python workers even
    when the driver process wasn't launched from the repo directory (UDF
    closures reference package modules by name, so workers must be able to
    import them). Zips the package once per SparkContext and addPyFile()s
    it — a no-op for the common repo-cwd case beyond the first call."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(tempfile.gettempdir(), "bitfilters_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ship_package(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table with a schema-adaptive ``ts`` column.

    Some generations of the test data store ``ts`` as TIMESTAMP(NANOS),
    which Spark's vectorized parquet reader only accepts via the
    ``spark.sql.legacy.parquet.nanosAsLong`` read option (yielding a
    LongType of nanoseconds); newer generations store ``timestamp[us]``,
    which Spark reads natively. Branch on the dtype actually read rather
    than assuming either encoding — and never mutate session-wide conf."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    path = os.path.join(sf_dir, "events.parquet")
    try:
        df = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) without the legacy option raises on read.
        df = None
    if df is None or isinstance(df.schema["ts"].dataType, LongType):
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = False) -> dict:
    out = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            out[t] = spark.read.parquet(path)
            if register_views:
                out[t].createOrReplaceTempView(t)
    return out
