from ..tables import DEFAULT_SF_DIR, TABLE_NAMES, load_table, load_tables, register_views
from .text_files import read_tsv, write_tsv

__all__ = [
    "DEFAULT_SF_DIR",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_tsv",
    "write_tsv",
]
