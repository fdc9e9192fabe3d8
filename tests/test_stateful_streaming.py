"""applyInPandasWithState: custom per-key state across micro-batches."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from hive_export_spark.sources import load_table, read_stream_from_table
from hive_export_spark.streaming.stateful import running_user_totals


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
