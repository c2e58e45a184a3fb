from .filter_join import bloom_prefiltered_join, semijoin_filter

__all__ = ["bloom_prefiltered_join", "semijoin_filter"]
