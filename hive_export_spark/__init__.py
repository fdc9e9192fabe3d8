"""hive_export_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the VoltDB Hive Export
Conduit (reference: /root/reference, MIT) as idiomatic PySpark:

- typed ingest with a fixed, schema-first type system
  (reference: PartitionedJsonDecoder.java:163-253)
- row -> JSON encoding in schema order
  (reference: PartitionedJsonDecoder.java:109-129)
- partition-key extraction with null/blank token substitution
  (reference: PartitionedJsonDecoder.java:217-232, HiveEndPointFactory.java:88-101)
- partition-routed, transactional partitioned table writes
  (reference: HivePartitionStream.java:141-174, HiveSink.java:67-106)
- micro-batch streaming delivery with replay semantics
  (reference: HiveExportClient.java:171-196) -> Structured Streaming

plus the committed extension surface (SURVEY.md section 2.2): the full
relational operator set, streaming windows/watermarks, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is DataFrame-first: operators are ``DataFrame -> DataFrame``
functions that Catalyst can optimize end to end. No RDDs. Pandas UDFs only
where no native expression exists.
"""

from hive_export_spark.config import ExportConfig, UNSPECIFIED_TOKEN
from hive_export_spark.engine import ExportEngine, ExportError
from hive_export_spark.session import get_spark

__all__ = ["ExportConfig", "ExportEngine", "ExportError", "UNSPECIFIED_TOKEN", "get_spark"]
__version__ = "0.1.0"
