"""applyInPandasWithState: custom per-key state across micro-batches."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from hive_export_spark.sources import load_table, read_stream_from_table
from hive_export_spark.streaming.stateful import has_tws_runtime, running_user_totals


def test_running_totals_match_batch(spark, sf_dir):
    stream = read_stream_from_table(spark, "events", sf_dir).select(
        "user_id", "value"
    )
    name = f"totals_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last update per user = final running state
    streamed = spark.sql(
        f"""
        SELECT user_id, n_events, total_value, max_value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM {name}
        ) WHERE rn = 1
        """
    ).collect()
    expected = {
        r.user_id: (r.n, r.mx)
        for r in load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    got = {r.user_id: (r.n_events, r.max_value) for r in streamed}
    assert got == expected
    # running sums agree within float tolerance
    expected_sums = {
        r.user_id: r.s
        for r in load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"))
        .collect()
    }
    for r in streamed:
        assert abs(r.total_value - expected_sums[r.user_id]) < 1e-6


# conditionally DEFINED, not skipped: a permanent skip in the default run
# is dead weight — this coverage self-activates the moment the environment
# gains google.protobuf (the transformWithState worker protocol needs it),
# exactly like the conditionally-registered stream_stateful_totals_tws query
def _test_transform_with_state_totals(spark, sf_dir):
    import shutil

    from hive_export_spark.streaming.stateful import running_type_totals_tws

    src = "/tmp/tws_pytest_src"
    shutil.rmtree(src, ignore_errors=True)
    load_table(spark, "events", sf_dir).select(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100).cast("double").alias("value"),
    ).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        running_type_totals_tws(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: r.n
        for r in spark.sql(
            f"SELECT event_type, max(n_events) AS n FROM {name} GROUP BY 1"
        ).collect()
    }
    expected = {
        r.event_type: r.n
        for r in load_table(spark, "events", sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected


if has_tws_runtime():
    test_transform_with_state_totals = _test_transform_with_state_totals
