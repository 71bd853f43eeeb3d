"""Source helpers for the synthetic star schema + event stream tables."""

from reflinkcep_spark.sources.tables import TABLES, load_table, load_tables, register_views, spread

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "spread"]
