from .filter_join import bloom_prefiltered_join, semijoin_filter
from .skew import salted_join, shuffle_report, skew_report

__all__ = ["bloom_prefiltered_join", "salted_join", "semijoin_filter", "shuffle_report", "skew_report"]
