"""Small-file compaction and streaming progress monitoring (R12 analog)."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F

from hive_export_spark.operators.maintenance import compact_partitioned_table
from hive_export_spark.sources import load_table, read_stream_from_table
from hive_export_spark.streaming.monitoring import ProgressRecorder, RateLimitedLog


def test_compaction_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir)
    path = str(tmp_path / "fragmented")
    # simulate many micro-batch writes: 40 files per partition
    (
        ev.repartition(40)
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    )
    before_rows = {tuple(r) for r in spark.read.parquet(path).collect()}
    stats = compact_partitioned_table(spark, path, ["event_type"])
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 10  # ~1 file per partition at this size
    after = spark.read.parquet(path)
    assert {tuple(r) for r in after.collect()} == before_rows
    # partition layout preserved
    assert (tmp_path / "fragmented" / "event_type=click").exists()


def test_rate_limited_log_suppression():
    log = RateLimitedLog(window_s=10.0)
    t = 1000.0
    assert log.log("err A", now=t)
    assert not log.log("err A", now=t + 1)  # suppressed inside window
    assert log.log("err B", now=t + 1)      # different message passes
    assert log.log("err A", now=t + 11)     # window elapsed
    assert log.suppressed == 1
    assert log.emitted == ["err A", "err B", "err A"]


def test_progress_recorder_captures_batches(spark, sf_dir):
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        stream = read_stream_from_table(spark, "events", sf_dir)
        name = f"mon_{uuid.uuid4().hex[:8]}"
        q = (
            stream.groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline and name not in rec.metrics:
            time.sleep(0.5)
        assert name in rec.metrics
        total_rows = sum(m.num_input_rows for m in rec.metrics[name])
        assert total_rows == load_table(spark, "events", sf_dir).count()
    finally:
        spark.streams.removeListener(rec)


def test_compaction_accepts_file_uri(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).limit(200)
    path = str(tmp_path / "uri_table")
    ev.repartition(8).write.mode("overwrite").partitionBy("event_type").parquet(path)
    before_rows = {tuple(r) for r in spark.read.parquet(path).collect()}
    stats = compact_partitioned_table(spark, f"file://{path}", ["event_type"])
    assert stats["files_after"] < stats["files_before"]
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before_rows


def test_compaction_accepts_single_slash_file_uri(spark, sf_dir, tmp_path):
    # Spark commonly prints the single-slash form 'file:/path'; it must
    # normalize like 'file:///path', not fall through to os.walk as a
    # literal (which saw 0 files and failed only after the full rewrite)
    ev = load_table(spark, "events", sf_dir).limit(200)
    path = str(tmp_path / "uri1_table")
    ev.repartition(4).write.mode("overwrite").partitionBy("event_type").parquet(path)
    stats = compact_partitioned_table(spark, f"file:{path}", ["event_type"])
    assert stats["files_before"] > 0
    assert stats["files_after"] < stats["files_before"]


def test_compaction_missing_path_is_noop(spark, tmp_path):
    # a sink that has not produced its first batch: the Hadoop-FS
    # existence gate answers before any load/listing is attempted
    stats = compact_partitioned_table(
        spark, str(tmp_path / "never_written"), ["p"]
    )
    assert stats == {"files_before": 0, "files_after": 0}


def test_compaction_stale_backup_raises(spark, sf_dir, tmp_path):
    # an interrupted prior compaction leaves .pre_compact; compacting
    # again must refuse loudly instead of deleting the only good copy
    ev = load_table(spark, "events", sf_dir).limit(50)
    path = str(tmp_path / "tbl")
    ev.write.partitionBy("event_type").parquet(path)
    (tmp_path / "tbl.pre_compact").mkdir()
    import pytest

    with pytest.raises(RuntimeError, match="stale backup"):
        compact_partitioned_table(spark, path, ["event_type"])


def test_compaction_swap_exception_restores_backup(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The second swap rename can THROW (HDFS safemode, permissions, s3a
    transport errors via Py4J), not just return False — and at that point
    the live table is already moved aside to .pre_compact. The exception
    path must restore the original before propagating (r10 advisory #2);
    round 10's code only restored on a False return."""
    import pytest

    import hive_export_spark.operators.maintenance as maint

    ev = load_table(spark, "events", sf_dir).limit(50)
    path = str(tmp_path / "swapfail")
    ev.write.partitionBy("event_type").parquet(path)
    before_rows = {tuple(r) for r in spark.read.parquet(path).collect()}

    real_fs_for = maint._fs_for

    class ThrowOnSwapIn:
        """Delegating FS proxy: the staging -> table rename raises, every
        other call passes through to the real Hadoop FileSystem."""

        def __init__(self, fs):
            self._fs = fs

        def rename(self, src, dst):
            if src.toString().endswith(".compacting"):
                raise RuntimeError("injected IOException during swap")
            return self._fs.rename(src, dst)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    def patched(spark_, p):
        fs, jp = real_fs_for(spark_, p)
        return ThrowOnSwapIn(fs), jp

    monkeypatch.setattr(maint, "_fs_for", patched)
    with pytest.raises(RuntimeError, match="injected"):
        compact_partitioned_table(spark, path, ["event_type"])
    # the original table is back at its path, byte-for-byte readable,
    # and the backup slot is free for the next attempt
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before_rows
    assert not (tmp_path / "swapfail.pre_compact").exists()


def test_compaction_partition_subtree_bounds_copy_window(spark, sf_dir, tmp_path):
    """The documented object-store escape hatch (maintenance.py scale
    notes): on rename-as-copy filesystems, compact ONE partition subtree
    through the same swap machinery so the non-atomic copy window is
    bounded to that partition, not the whole table. file:// stands in
    for s3a — the call path (Hadoop FileSystem dispatch, staging write,
    swap, backup delete) is scheme-agnostic (r10 verdict ask #4)."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(4))
    )
    path = str(tmp_path / "subtree")
    (
        ev.repartition(20)
        .write.mode("overwrite")
        .partitionBy("event_type", "bucket")
        .parquet(path)
    )
    whole_before = {
        tuple(r) for r in spark.read.parquet(path).collect()
    }
    # snapshot the OTHER partitions' physical files — they must not move
    untouched = sorted(
        str(p)
        for p in (tmp_path / "subtree").rglob("*.parquet")
        if "event_type=click" not in str(p)
    )

    stats = compact_partitioned_table(
        spark, path + "/event_type=click", ["bucket"]
    )
    assert stats["files_after"] < stats["files_before"]

    # other partitions' files untouched: the copy window was bounded to
    # the one subtree
    assert (
        sorted(
            str(p)
            for p in (tmp_path / "subtree").rglob("*.parquet")
            if "event_type=click" not in str(p)
        )
        == untouched
    )
    # the WHOLE table still reads identically through partition discovery
    whole_after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert whole_after == whole_before
