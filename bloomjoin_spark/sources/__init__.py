from .io import iceberg_session_conf, read_table, tables, token_table_ref

__all__ = ["iceberg_session_conf", "read_table", "tables", "token_table_ref"]
