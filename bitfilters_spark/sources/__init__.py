from .tables import DEFAULT_SF_DIR, TABLES, load_table, load_tables  # noqa: F401
