"""Reference-parity queries (R1-R9) registered for the correctness gate.

Each query exercises one operator from SURVEY.md section 2.1 on the
``events`` fixture and has a DuckDB oracle twin. Timestamp format, base64,
token substitution and JSON field order follow the reference exactly
(PartitionedJsonDecoder.java:163-253, HiveEndPointFactory.java:88-101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_export_spark.config import UNSPECIFIED_TOKEN
from hive_export_spark.operators import parity
from hive_export_spark.registry import register
from hive_export_spark.sources import load_table

TOKEN_SQL = UNSPECIFIED_TOKEN


@register(
    "parity_skip_internal_fields",
    oracle="SELECT user_id, event_type, value FROM events",
    doc="R2: leading-metadata-column projection (HiveExportClient.java:155)",
)
def parity_skip_internal_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events has no VoltDB metadata columns; model the skip by treating its
    # first 2 columns (event_id, ts) as the internal prefix.
    df = load_table(spark, "events", sf_dir)
    return parity.skip_internal_fields(df, n_internal=2).select(
        "user_id", "event_type", "value"
    )


@register(
    "parity_timestamp_format",
    oracle=(
        "SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS ts_str FROM events"
    ),
    doc="R3a: microsecond timestamp -> ms-precision ODBC string "
    "(PartitionedJsonDecoder.java:201-214)",
)
def parity_timestamp_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    return df.select(
        "event_id", F.date_format("ts", parity.TIMESTAMP_FORMAT).alias("ts_str")
    )


@register(
    "parity_base64_encode",
    oracle=(
        "SELECT event_id, to_base64(encode(event_type)) AS b64 FROM events"
    ),
    doc="R3b: varbinary -> base64 (PartitionedJsonDecoder.java:235-247)",
)
def parity_base64_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    return df.select(
        "event_id", F.base64(F.encode("event_type", "UTF-8")).alias("b64")
    )


@register(
    "parity_partition_token",
    oracle=(
        "SELECT event_id, CASE WHEN event_type IS NULL OR trim(event_type, '\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f\x20') = '' "
        f"THEN '{TOKEN_SQL}' ELSE event_type END AS event_type FROM events"
    ),
    doc="R4: null/blank partition value -> unspecified token "
    "(HiveEndPointFactory.java:88-93, PartitionedJsonDecoder.java:262)",
)
def parity_partition_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir).select("event_id", "event_type")
    return parity.partition_token_substitute(df, ["event_type"])


@register(
    "parity_json_encode",
    oracle=(
        "SELECT CAST(to_json(struct_pack("
        "event_id := event_id, "
        "ts := strftime(ts, '%Y-%m-%d %H:%M:%S.%g'), "
        "user_id := user_id, "
        "value := value, "
        "props := props"
        ")) AS VARCHAR) AS json_payload, "
        f"CASE WHEN event_type IS NULL OR trim(event_type, '\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f\x20') = '' THEN '{TOKEN_SQL}' "
        "ELSE event_type END AS event_type "
        "FROM events"
    ),
    doc="R5+R4: schema-ordered JSON payload with partition column diverted "
    "out of the payload (PartitionedJsonDecoder.java:109-129)",
)
def parity_json_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    return parity.export_pipeline(df, ["event_type"])


@register(
    "parity_partition_routing",
    oracle=(
        "SELECT "
        f"CASE WHEN event_type IS NULL OR trim(event_type, '\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f\x20') = '' THEN '{TOKEN_SQL}' "
        "ELSE event_type END AS event_type, "
        "count(*) AS n_rows FROM events GROUP BY 1"
    ),
    doc="R6/R8: rows grouped by partition key — the shuffle that feeds the "
    "partitioned write (StreamingHiveDecoder.java:44-54, HiveSink.java:68)",
)
def parity_partition_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    routed = parity.partition_token_substitute(df, ["event_type"])
    return routed.groupBy("event_type").agg(F.count("*").alias("n_rows"))


@register(
    "parity_partitioned_write",
    oracle=(
        "SELECT "
        f"CASE WHEN event_type IS NULL OR trim(event_type, '\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f\x20') = '' THEN '{TOKEN_SQL}' "
        "ELSE event_type END AS event_type, "
        "count(*) AS n_rows FROM events GROUP BY 1"
    ),
    doc="R9: dynamic-partition write + read-back verification "
    "(HivePartitionStream.java:141-174)",
)
def parity_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    df = load_table(spark, "events", sf_dir)
    routed = parity.export_pipeline(df, ["event_type"])
    out = tempfile.mkdtemp(prefix="hive_export_write_")
    parity.write_partitioned(routed, out, ["event_type"], mode="overwrite")
    # explicit read-back schema: a day-zero (empty) partitioned write
    # leaves no data files to infer from (round-8 day-zero sweep)
    written = spark.read.schema(routed.schema).parquet(out)
    return written.groupBy("event_type").agg(F.count("*").alias("n_rows"))
