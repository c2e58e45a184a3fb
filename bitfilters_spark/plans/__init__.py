from .advisor import join_plan_report
from .filter_join import bloom_prefiltered_join, semijoin_filter
from .skew import salted_join, shuffle_report, skew_report

__all__ = ["bloom_prefiltered_join", "join_plan_report", "salted_join", "semijoin_filter", "shuffle_report", "skew_report"]
