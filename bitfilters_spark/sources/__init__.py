from .io import infer_format, read_any, rebalance_scan, write_any  # noqa: F401
from .tables import DEFAULT_SF_DIR, TABLES, load_table, load_tables  # noqa: F401
