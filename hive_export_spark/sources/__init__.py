"""Source readers: batch parquet/ORC/CSV/JSON/JDBC and streaming variants.

The reference's only source is the VoltDB export wire protocol
(HiveExportClient.java:176-187, one serialized row at a time). In Spark the
source is declarative: ``spark.read`` applies the schema and Catalyst pushes
filters/projections into the scan, so "decode" costs nothing extra.
"""

from hive_export_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    read_stream_from_table,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "read_stream_from_table"]
