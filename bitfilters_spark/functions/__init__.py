from .filters import (  # noqa: F401
    binary_fuse8_filter_contains,
    binary_fuse16_filter_contains,
    bloom_filter_contains,
    build_filter,
    build_filters_multi,
    duckdb_bloom_probe,
    filter_contains,
    filter_describe,
    probe_filter,
    quotient_filter_contains,
    quotient_filter_remove,
    quotient_filter_resize,
    xor8_filter_contains,
    xor16_filter_contains,
)
from .hashing import duckdb_hash, spark_hash64  # noqa: F401
