from . import (  # noqa: F401
    clustering,
    dedup,
    multimodal,
    packing,
    sampling,
    similarity,
    substring,
    text,
    timeseries,
)
