from .dedup import (
    streaming_dedup_bloom,
    streaming_dedup_exact,
    streaming_window_counts,
)

__all__ = [
    "streaming_dedup_bloom",
    "streaming_dedup_exact",
    "streaming_window_counts",
]
