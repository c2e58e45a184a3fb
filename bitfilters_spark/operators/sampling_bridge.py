"""Tiny indirection so dedup.py can hash-sample without importing the
sampling module at module-import time (sampling imports text, text is
imported by dedup — keep the cycle surface minimal and explicit)."""

from pyspark.sql import DataFrame


def hash_sample_rows(
    df: DataFrame, key_col: str, threshold: int, mask: int
) -> DataFrame:
    from .sampling import hash_sample

    return hash_sample(df, key_col, threshold, mask)
