from .catalog import TABLES, load_table, load_tables, wildcard_scan

__all__ = ["TABLES", "load_table", "load_tables", "wildcard_scan"]
