from .io import read_table, tables, token_table_ref

__all__ = ["read_table", "tables", "token_table_ref"]
