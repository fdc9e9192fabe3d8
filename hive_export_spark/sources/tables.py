"""Fixture-table loaders (batch + streaming).

At cluster scale these would be catalog tables / object-store prefixes; the
API takes a directory so tests can point at any scale factor. Reads are
plain ``spark.read.parquet`` — schema comes from the parquet footer, filters
and column pruning push into the scan (verify with .explain: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-zoned microsecond TimestampType
    regardless of how the fixture encodes it. Fixture generations have
    shipped it as parquet TIMESTAMP(NANOS) (read as a long under
    nanosAsLong — integer-divide to µs, double division would lose
    precision above 2^53) and as TIMESTAMP(MICROS) isAdjustedToUTC=false
    (reads as TIMESTAMP_NTZ — cast reinterprets the wall-clock in the UTC
    session zone, identical values). VoltDB timestamps are microseconds too
    (PartitionedJsonDecoder.java:201-214), so µs is the reference-faithful
    precision."""
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one fixture table as a DataFrame (``events.ts`` normalized to
    microsecond TimestampType — see :func:`_normalize_event_ts`)."""
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    # The caller may hand us a session it built itself (the driver does);
    # timestamp semantics must not depend on that session's defaults.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return _normalize_event_ts(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load several fixture tables at once."""
    return {n: load_table(spark, n, sf_dir) for n in names}


def read_stream_from_table(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming read over the same parquet data.

    Models the reference's continuous export delivery
    (HiveExportClient.java:171-196): each micro-batch is the analog of one
    export block. The schema is taken from a batch read of the same path —
    streaming file sources require an explicit schema.
    """
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    # the file-stream source requires a directory; point it at the sf dir
    # with a glob filter selecting this table's file
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    if name == "events":
        # same ts normalization as the batch loader
        stream = _normalize_event_ts(stream)
    return stream
