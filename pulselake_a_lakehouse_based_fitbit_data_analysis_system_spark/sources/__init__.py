from .bucketed import ingest_bucketed, read_bucketed
from .tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "TABLE_NAMES",
    "ingest_bucketed",
    "load_table",
    "load_tables",
    "read_bucketed",
    "register_views",
]
