from .dedup import (
    streaming_dedup_bloom,
    streaming_dedup_exact,
    streaming_window_counts,
)
from .filter_join import streaming_filter_join

__all__ = [
    "streaming_dedup_bloom",
    "streaming_dedup_exact",
    "streaming_filter_join",
    "streaming_window_counts",
]
