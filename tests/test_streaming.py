"""Real streaming-mode tests: the same operators the correctness gate runs
in batch mode, executed as Structured Streaming queries with watermarks,
checkpoints, and replay (the reference's block-redelivery semantics,
HiveExportClient.java:159-162, 190-196)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from hive_export_spark.sources import load_table, read_stream_from_table
from hive_export_spark.streaming import (
    streaming_dedup,
    streaming_export,
    tumbling_window_agg,
)


def _memory_sink(df, name, mode="complete"):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    batch = tumbling_window_agg(load_table(spark, "events", sf_dir))
    stream_in = read_stream_from_table(spark, "events", sf_dir)
    name = f"tumbling_{uuid.uuid4().hex[:8]}"
    q = _memory_sink(
        tumbling_window_agg(stream_in, watermark="1 day"), name
    )
    q.awaitTermination(120)
    streamed = spark.sql(f"SELECT * FROM {name}")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in streamed.collect()}
    assert b == s and len(b) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    # duplicate event_ids across two files -> exactly one survivor per key
    src = tmp_path / "dup_src"
    rows = [(1, "2024-01-01 00:00:00", 10.0), (2, "2024-01-01 00:05:00", 20.0)]
    dup = [(1, "2024-01-01 00:01:00", 99.0), (3, "2024-01-01 00:06:00", 30.0)]
    cols = ["event_id", "ts", "value"]
    for i, batch in enumerate([rows, dup]):
        (
            spark.createDataFrame(batch, cols)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("append" if i else "overwrite")
            .parquet(str(src))
        )
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(src)
    )
    deduped = streaming_dedup(stream, keys=("event_id",), watermark="1 hour")
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(f"SELECT event_id FROM {name}").collect()
    ids = sorted(r.event_id for r in out)
    assert ids == [1, 2, 3]


def test_streaming_export_exactly_once_on_restart(spark, sf_dir, tmp_path):
    # Replay with the same checkpoint must not duplicate rows — the
    # exactly-once analog of the reference's Hive tx-batch atomicity
    # (HivePartitionStream.java:152-154).
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n_src = load_table(spark, "events", sf_dir).count()

    for _ in range(2):  # second run: checkpoint says everything is processed
        stream = read_stream_from_table(spark, "events", sf_dir)
        q = streaming_export(stream, out, ckpt, ["event_type"])
        q.awaitTermination(120)

    written = spark.read.parquet(out)
    assert written.count() == n_src
    # partition directories exist (dynamic partition creation)
    assert written.select("event_type").distinct().count() >= 5


def test_transactional_export_replaces_failed_attempt(spark, sf_dir, tmp_path):
    # R11 replay: attempt 1 writes its batch output then dies before the
    # checkpoint commits; the restarted query's batch-id-keyed overwrite
    # must REPLACE the orphaned files, not append to them
    from hive_export_spark.streaming import transactional_streaming_export

    out = str(tmp_path / "txout")
    ckpt = str(tmp_path / "txckpt")
    n_src = load_table(spark, "events", sf_dir).count()

    def boom(batch_id):
        raise RuntimeError("injected")

    q = transactional_streaming_export(
        read_stream_from_table(spark, "events", sf_dir), out, ckpt,
        ["event_type"], batch_hook=boom,
    )
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    else:
        # outside the except so the guard can actually fire (an
        # AssertionError inside the try would be self-swallowed)
        raise AssertionError("injected failure did not surface")
    # the failed attempt's files exist (written before the hook fired)
    assert spark.read.parquet(out).count() == n_src

    q2 = transactional_streaming_export(
        read_stream_from_table(spark, "events", sf_dir), out, ckpt,
        ["event_type"],
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_src  # replaced, not doubled


def test_streaming_late_data_dropped(spark, tmp_path):
    # Watermark guarantee (probed empirically): once a window has been
    # FINALIZED AND EMITTED in append mode, a late row targeting it is
    # dropped — emitted windows are immutable and never re-emitted.
    # (The row-level drop filter lags the reported watermark by one batch,
    # so the assertion is on the emitted-window guarantee, which is the
    # one Spark actually makes.)
    import glob
    import os
    import shutil
    import time

    src = tmp_path / "late_src"
    src.mkdir()
    batches = [
        [(1, "2024-01-01 10:00:00", "a", 1.0), (2, "2024-01-01 12:00:00", "a", 1.0)],
        [(3, "2024-01-01 14:00:00", "a", 1.0)],  # advances wm to 13:00
        [(4, "2024-01-01 10:30:00", "a", 1.0)],  # late: window already emitted
    ]
    cols = ["event_id", "ts", "event_type", "value"]
    # the file source orders batches by modification time: pin mtimes so
    # arrival order is deterministic
    now = time.time()
    for i, batch in enumerate(batches):
        staging = tmp_path / f"staging_{i}"
        (
            spark.createDataFrame(batch, cols)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(staging))
        )
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        dest = str(src / f"{i}_batch.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (now + i * 30, now + i * 30))
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(src)
    )
    agg = tumbling_window_agg(stream, duration="1 hour", keys=("event_type",),
                              watermark="1 hour")
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append emits only finalized (closed) windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    finalized = spark.sql(f"SELECT * FROM {name}").collect()
    ten_oclock = [r for r in finalized if r.window_start.hour == 10]
    # exactly one emission, and the late row (event 4) is NOT in its count
    assert len(ten_oclock) == 1
    assert ten_oclock[0].n_events == 1
