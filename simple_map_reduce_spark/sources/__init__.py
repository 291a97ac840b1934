from .readers import load_table, load_tables, lines_view

__all__ = ["load_table", "load_tables", "lines_view"]
