from .catalog import Catalog, SCHEMAS, TABLES, load_table

__all__ = ["Catalog", "SCHEMAS", "TABLES", "load_table"]
