from . import (  # noqa: F401
    clustering,
    dedup,
    multimodal,
    neardup_index,
    packing,
    sampling,
    similarity,
    substring,
    text,
    timeseries,
    web,
)
