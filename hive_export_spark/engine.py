"""Engine facade: the reference's user contract, Spark-native.

A VoltDB/hive-export user supplies flat properties (hive.uri / hive.db /
hive.table / hive.partition.columns / timezone) and gets a running conduit
(HiveExportClient.configure, HiveExportClient.java:66-112). This facade is
the drop-in equivalent:

    engine = ExportEngine.from_properties({
        "hive.uri": "thrift://metastore:9083",
        "hive.db": "analytics",
        "hive.table": "alerts",
        "hive.partition.columns": "ALERTS:EVENT_TYPE",
    })
    engine.export_batch(df, "/warehouse/alerts")           # batch export
    q = engine.export_stream(stream_df, out_path, ckpt)    # continuous
    engine.export_to_catalog(df)                           # db.table

plus ExportError — the analog of HiveExportException's %-safe formatting
(HiveExportException.java: message formatting must never itself throw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from hive_export_spark.config import ExportConfig
from hive_export_spark.operators.parity import export_pipeline, write_partitioned
from hive_export_spark.sinks import export_to_catalog_table
from hive_export_spark.streaming.pipeline import streaming_export


class ExportError(RuntimeError):
    """Export failure with format-safe message construction: a bad format
    string degrades to the raw template + args instead of raising
    (HiveExportException.java's safe printf semantics)."""

    def __init__(self, template: str, *args: object) -> None:
        try:
            message = template % args if args else template
        except (TypeError, ValueError):
            message = f"{template} {args!r}"
        super().__init__(message)


class ExportEngine:
    """One configured export target; stateless between calls (Spark owns
    all execution state — no connection pool to manage, R10 is N/A)."""

    def __init__(self, config: ExportConfig) -> None:
        self.config = config

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> "ExportEngine":
        return cls(ExportConfig.from_properties(props))

    def _partition_cols(self, df: DataFrame, table: str | None) -> list[str]:
        cols = self.config.partition_cols_for(table or self.config.table)
        self.config.validate_against_schema(
            table or self.config.table,
            {f.name: f.dataType.simpleString() for f in df.schema.fields},
        )
        # resolve to the frame's actual casing
        by_upper = {c.upper(): c for c in df.columns}
        return [by_upper[c] for c in cols]

    def transform(self, df: DataFrame, table: str | None = None) -> DataFrame:
        """The pure dataflow (R2-R6): returns the routed frame
        (json_payload + token-substituted partition columns)."""
        pcols = self._partition_cols(df, table)
        return export_pipeline(
            df, pcols, self.config.unspecified_token,
            timezone=self.config.timezone,
        )

    def export_batch(
        self, df: DataFrame, path: str, table: str | None = None,
        fmt: str = "orc",
    ) -> None:
        """One-shot batch export into a partitioned directory (R9)."""
        pcols = self._partition_cols(df, table)
        routed = export_pipeline(
            df, pcols, self.config.unspecified_token,
            timezone=self.config.timezone,
        )
        write_partitioned(routed, path, pcols, fmt=fmt)

    def export_stream(
        self, stream_df: DataFrame, out_path: str, checkpoint_path: str,
        table: str | None = None, fmt: str = "parquet",
        available_now: bool = True,
    ) -> StreamingQuery:
        """Continuous export with checkpointed replay (R1-R11)."""
        pcols = self._partition_cols(stream_df, table)
        return streaming_export(
            stream_df, out_path, checkpoint_path, pcols,
            self.config.unspecified_token, fmt=fmt, available_now=available_now,
            timezone=self.config.timezone,
        )

    def export_to_catalog(
        self, df: DataFrame, table: str | None = None, fmt: str = "orc"
    ) -> str:
        """Export into the ``<db>.<table>`` partitioned catalog table."""
        return export_to_catalog_table(df, self.config, table, fmt=fmt)
