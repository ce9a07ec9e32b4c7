from .catalog import TABLES, load_table, load_tables, tags_long_table

__all__ = ["TABLES", "load_table", "load_tables", "tags_long_table"]
