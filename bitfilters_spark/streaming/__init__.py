from .asof import streaming_asof_enrich, streaming_asof_join
from .cdc import (
    cdc_stats_fold,
    compact_cdc_stats,
    streaming_cdc_dup_report,
    streaming_cdc_stats,
    streaming_chunk_counts,
)
from .dsir import (
    load_dsir_counts,
    streaming_dsir_counts,
    streaming_dsir_model,
)
from .dedup import (
    streaming_dedup_bloom,
    streaming_dedup_exact,
    streaming_window_counts,
)
from .filter_build import (
    load_filter_blob,
    streaming_filter_build,
    streaming_indexed_sink,
)
from .filter_join import streaming_filter_join
from .neardup import streaming_neardup_dedup
from .pipeline import make_prep_pipeline_fold, streaming_prep_pipeline
from .frontier import streaming_frontier
from .index_maintenance import (
    ann_maintenance_fold,
    sig_maintenance_fold,
    streaming_sig_index,
    bm25_maintenance_fold,
    ivfpq_maintenance_fold,
    phrase_maintenance_fold,
    streaming_ann_index,
    streaming_bm25_index,
    streaming_ivfpq_index,
    streaming_phrase_index,
)
from .lm import (
    compact_kn_state,
    kn_stats_fold,
    streaming_kn_model,
    streaming_kn_stats,
)
from .preference import (
    preference_stats_fold,
    streaming_preference_report,
    streaming_preference_stats,
)
from .sessions import streaming_sessionize
from .tokenizer import (
    compact_word_stats,
    streaming_bpe_model,
    streaming_unigram_model,
    streaming_word_frequencies,
    streaming_word_stats,
    word_stats_fold,
)
from .sketches import (
    streaming_cms_counts,
    streaming_distinct_counts,
    streaming_drift,
    streaming_quantiles,
    streaming_topk,
)

__all__ = [
    "streaming_asof_enrich",
    "streaming_asof_join",
    "streaming_dedup_bloom",
    "streaming_cms_counts",
    "streaming_dedup_exact",
    "streaming_distinct_counts",
    "streaming_drift",
    "load_dsir_counts",
    "streaming_dsir_counts",
    "streaming_dsir_model",
    "streaming_filter_build",
    "streaming_filter_join",
    "streaming_indexed_sink",
    "make_prep_pipeline_fold",
    "streaming_prep_pipeline",
    "streaming_neardup_dedup",
    "streaming_preference_stats",
    "preference_stats_fold",
    "streaming_preference_report",
    "cdc_stats_fold",
    "streaming_cdc_stats",
    "streaming_chunk_counts",
    "streaming_cdc_dup_report",
    "compact_cdc_stats",
    "streaming_word_stats",
    "word_stats_fold",
    "streaming_word_frequencies",
    "streaming_bpe_model",
    "streaming_unigram_model",
    "compact_word_stats",
    "streaming_quantiles",
    "streaming_frontier",
    "ann_maintenance_fold",
    "bm25_maintenance_fold",
    "ivfpq_maintenance_fold",
    "streaming_ann_index",
    "streaming_bm25_index",
    "streaming_ivfpq_index",
    "sig_maintenance_fold",
    "streaming_sig_index",
    "streaming_sessionize",
    "streaming_topk",
    "streaming_window_counts",
]
