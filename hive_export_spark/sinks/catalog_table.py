"""Catalog-table sink: the full reference endpoint semantics
(HiveEndPointFactory + HivePartitionStream + HiveSink) as one declarative
write into a partitioned catalog table.

Reference behaviors carried over:
- endpoint validation: db/table non-empty, table must have a partition
  spec (HiveEndPointFactory.java:42-63; ExportConfig fixes the two latent
  bugs — SURVEY.md section 1.5);
- partition values non-null/non-blank via token substitution
  (HiveEndPointFactory.java:88-101);
- dynamic partition creation on first write to a new partition value
  (HivePartitionStream newConnection(true), :62-75);
- append semantics with atomic per-write commits (the Hive tx-batch
  analog, :141-174).

Works against ANY Spark catalog: the session's default catalog (driver
sessions included) or a real Hive metastore (enableHiveSupport) — the
code is identical, which is the point of going through the catalog API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_export_spark.config import ExportConfig
from hive_export_spark.operators.parity import export_pipeline, route_partitions


def export_to_catalog_table(
    df: DataFrame,
    config: ExportConfig,
    table_name: str | None = None,
    fmt: str = "orc",
) -> str:
    """Run the export pipeline and append into ``<db>.<table>`` as a
    partitioned catalog table (created on demand, like Hive partitions).

    ``table_name`` is the logical source-table name used to look up the
    partition spec in the config (defaults to config.table). Returns the
    fully-qualified table identifier. ORC by default — the reference's
    required streaming format (README.md:69-74).
    """
    spark: SparkSession = df.sparkSession
    table = table_name or config.table
    partition_cols = config.partition_cols_for(table)
    config.validate_against_schema(
        table, {f.name: f.dataType.simpleString() for f in df.schema.fields}
    )
    # resolve config's uppercased partition columns to the frame's ACTUAL
    # casing — a lowercase assumption would leave e.g. EVENT_TYPE inside
    # the JSON payload (to_partitioned_json excludes by exact name)
    by_upper = {c.upper(): c for c in df.columns}
    pcols = [by_upper[c] for c in partition_cols]

    routed = export_pipeline(df, pcols, config.unspecified_token,
                             timezone=config.timezone,
                             camel_case_field_names=config.camel_case_field_names)
    routed = route_partitions(routed, pcols)

    fq = f"{config.db}.{table}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {config.db}")
    writer = (
        routed.write.mode("append")
        .format(fmt)
        .partitionBy(*pcols)
    )
    writer.saveAsTable(fq)
    return fq
