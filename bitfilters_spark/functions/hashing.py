"""Spark-facing hash functions.

* ``spark_hash64(*cols)`` — the engine's recommended native hash: Spark's
  built-in ``xxhash64`` (JVM-side, whole-stage-codegen, zero Python cost).
  Use it for own filters when cross-engine hash parity isn't required —
  this is the 100 TB hot path.
* ``duckdb_hash(version, *cols)`` — the reference's
  ``bitfilters_duckdb_hash(version, value, ...)``
  (``bitfilters_duckdb_bloom_filter.cpp:283-303``): bit-exact DuckDB hash
  for a pinned version, multi-column via CombineHash. Arrow-batched pandas
  UDF over the numpy kernels (wrapping u64 arithmetic can't live in ANSI
  Column expressions). Returns the u64 hash as its two's-complement i64.

Null semantics match DuckDB's HashVectorTyped: NULL hashes to 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..core import hashing as H


def spark_hash64(*cols) -> Column:
    """Native JVM xxhash64 over one or more columns (codegen fast path)."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def _hash_series(s: pd.Series, version: str) -> np.ndarray:
    dt = s.dtype
    if pd.api.types.is_bool_dtype(dt):
        return H.hash_int_narrow(s.fillna(False).to_numpy(dtype=np.int64))
    if pd.api.types.is_integer_dtype(dt):
        arr = s.to_numpy()
        if arr.dtype.itemsize <= 4:
            return H.hash_int_narrow(arr)
        return H.hash_int64(arr)
    if dt == np.float32:
        return H.hash_float32(s.to_numpy(dtype=np.float32))
    if pd.api.types.is_float_dtype(dt):
        return H.hash_float64(s.to_numpy(dtype=np.float64))
    if pd.api.types.is_datetime64_any_dtype(dt):
        ns = s.to_numpy(dtype="datetime64[ns]").view(np.int64)
        return H.hash_int64(ns // 1000)  # DuckDB TIMESTAMP hashes its micros
    # strings / binary arrive as object series
    data = [
        None if v is None or (isinstance(v, float) and np.isnan(v))
        else (v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8"))
        for v in s
    ]
    return H.hash_bytes(data, version=version)


def duckdb_hash(version: str, *cols) -> Column:
    """DuckDB-version-exact hash of one or more columns, as signed i64."""
    H._string_algo(version)  # validate version eagerly (bind-time, like the reference)
    if not cols:
        raise ValueError("duckdb_hash requires at least one value column")

    @pandas_udf(LongType())
    def _h(*series: pd.Series) -> pd.Series:
        out = _hash_series(series[0], version)
        for s in series[1:]:
            out = H.combine_hash(out, _hash_series(s, version))
        return pd.Series(out.view(np.int64))

    return _h(*[F.col(c) if isinstance(c, str) else c for c in cols])
