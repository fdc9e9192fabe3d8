"""Stream-stream joins and streaming upsert sinks — the remaining
streaming-surface capabilities (watermarked two-stream equi-join with a
time-bound predicate; foreachBatch + cdc.upsert as a MERGE sink)."""

from __future__ import annotations

import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_export_spark.operators.cdc import upsert
from hive_export_spark.sources import load_table, read_stream_from_table


def test_stream_stream_interval_join(spark, sf_dir):
    # click stream joined to purchase stream per user within +/- 1h —
    # both sides watermarked so join state is bounded
    ev = read_stream_from_table(spark, "events", sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id"))
        .withWatermark("click_ts", "2 hours")
    )
    ev2 = read_stream_from_table(spark, "events", sf_dir)
    purchases = (
        ev2.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
                F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.sql(f"SELECT click_id, p_id FROM {name}")

    # batch equivalent
    bev = load_table(spark, "events", sf_dir)
    bc = bev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    bp = bev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    expected = bc.join(
        bp,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("click_id", "p_id")
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want and len(want) > 0


def test_streaming_upsert_sink(spark, sf_dir, tmp_path):
    # foreachBatch + cdc.upsert = streaming MERGE INTO: the sink keeps the
    # LATEST event per user (last-write-wins on event_id as version order)
    out = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = read_stream_from_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "event_type", "value"
    )

    def merge_batch(batch_df, batch_id):
        latest = (
            batch_df.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        try:
            target = batch_df.sparkSession.read.parquet(out)
            merged = upsert(target, latest, "user_id")
        except Exception:  # first batch: no target yet
            merged = latest
        merged.write.mode("overwrite").parquet(out + "_tmp")
        batch_df.sparkSession.read.parquet(out + "_tmp").write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final = spark.read.parquet(out)
    expected = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.max("event_id").alias("event_id"))
    )
    got = {(r.user_id, r.event_id) for r in final.collect()}
    want = {(r.user_id, r.event_id) for r in expected.collect()}
    assert got == want
