from . import clustering, dedup, multimodal, sampling, similarity, text  # noqa: F401
