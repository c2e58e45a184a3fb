"""bitfilters_spark — PySpark-native probabilistic-filter analytics engine.

Spark-first re-expression of the capabilities of the Query-farm/bitfilters
DuckDB extension (quotient / XOR / binary-fuse / bloom membership filters as
group aggregates + row probes), plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.3.0"

from . import functions, operators, plans, sources, sql, streaming  # noqa: E402,F401
from .session import make_session  # noqa: E402,F401
