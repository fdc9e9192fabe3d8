"""Sinks: partitioned catalog-table export — the reference's actual
target shape (partitioned Hive tables), beyond plain directory writes."""

from hive_export_spark.sinks.catalog_table import export_to_catalog_table

__all__ = ["export_to_catalog_table"]
