from .tables import TPCH_TABLES, load_table, load_tables, register_views

__all__ = ["TPCH_TABLES", "load_table", "load_tables", "register_views"]
