"""Spark surface for the bottom-k hash sample sketch (``core/bksample``):
a mergeable uniform row sample with payload per group, plus plug-in
quantile probes.

Build is the sketch family's two-phase shape (the 100 TB path): one
``mapInPandas`` pass folds per-partition partial sketches per group —
so the shuffle carries #partitions × #groups blobs of at most
``12 + 16k`` bytes, never rows — then a per-group merge reduces them.
``merge(build(A), build(B)) == build(A ∪ B)`` byte-exact, so sketches
also roll up hierarchies (per-file → partition → global) via
``bks_merge`` without rescanning.

Use it where a 100 TB group needs a reproducible value profile without
a sort: corpus length distributions, per-domain date ranges, "show me
50 uniform example rows of this group".  Deterministic: an external
engine reproduces the sample (rank rows by the same key hash) and the
nearest-rank quantiles exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from ..core import bksample as BK


def _to_u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64).astype(np.uint64)


def bottomk_sample(
    df: DataFrame,
    group_cols: list,
    hash_col: str,
    value_col: str,
    k: int = 128,
    filter_col: str = "sample",
) -> DataFrame:
    """One BKS1 blob per group: the ``(hash, value)`` pairs whose key
    hash ranks in the group's k smallest.  ``hash_col`` must be i64
    (two's-complement u64, e.g. ``spark_hash64`` / ``duckdb_hash`` of a
    UNIQUE row key), ``value_col`` any integer-castable payload.  Rows
    with a NULL hash or value are skipped (aggregate NULL semantics).
    ``group_cols=[]`` builds one global sketch."""
    dummy = not group_cols
    if dummy:
        df = df.withColumn("__g", F.lit(0))
        group_cols = ["__g"]
    proj = df.select(
        *group_cols,
        F.col(hash_col).cast("long").alias("__h"),
        F.col(value_col).cast("long").alias("__v"),
    ).where(F.col("__h").isNotNull() & F.col("__v").isNotNull())
    gfields = [proj.schema[c] for c in group_cols]
    out_schema = StructType(gfields + [StructField(filter_col, BinaryType())])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            codes, uniq = pd.factorize(
                pd.Series(zip(*[pdf[c] for c in group_cols]))
                if len(group_cols) > 1
                else pdf[group_cols[0]]
            )
            hs = _to_u64(pdf["__h"])
            vs = pdf["__v"].to_numpy(dtype=np.int64)
            for code in range(len(uniq)):
                m = codes == code
                key = uniq[code]
                kk = tuple(key) if isinstance(key, tuple) else (key,)
                h, v = BK._reduce(hs[m], vs[m], k)
                prev = acc.get(kk)
                if prev is not None:
                    h, v = BK._reduce(
                        np.concatenate([prev[0], h]),
                        np.concatenate([prev[1], v]),
                        k,
                    )
                acc[kk] = (h, v)
        rows = [
            (*kk, BK.bks_serialize(k, h, v)) for kk, (h, v) in acc.items()
        ]
        yield pd.DataFrame(rows, columns=group_cols + [filter_col])

    partial_df = proj.mapInPandas(partials, schema=out_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = BK.bks_merge([bytes(b) for b in pdf[filter_col]])
        return pd.DataFrame(
            [(*[pdf[c].iloc[0] for c in group_cols], blob)],
            columns=group_cols + [filter_col],
        )

    out = partial_df.groupBy(*group_cols).applyInPandas(merge, schema=out_schema)
    return out.drop("__g") if dummy else out


def bks_quantile_col(filter_col, q: float) -> Column:
    """Nearest-rank quantile of a sketch column's sampled values (long,
    null for an empty sketch)."""

    @F.pandas_udf("long")
    def probe(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None else BK.bks_quantile(bytes(b), q)
                for b in blobs
            ],
            dtype="Int64",
        )

    return probe(F.col(filter_col) if isinstance(filter_col, str) else filter_col)


def bks_sample_size_col(filter_col) -> Column:
    """Number of kept rows m (long)."""

    @F.pandas_udf("long")
    def probe(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if b is None
                else len(BK.bks_deserialize(bytes(b))[2])
                for b in blobs
            ],
            dtype="Int64",
        )

    return probe(F.col(filter_col) if isinstance(filter_col, str) else filter_col)
