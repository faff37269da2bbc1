from .readers import load_table, load_tables, read_semicolon_csv, read_ga_csv

__all__ = ["load_table", "load_tables", "read_semicolon_csv", "read_ga_csv"]
