"""Engine facade: the reference's properties-in, conduit-out contract."""

from __future__ import annotations

import json

import pytest

from hive_export_spark.config import ConfigError
from hive_export_spark.engine import ExportEngine, ExportError
from hive_export_spark.sources import load_table, read_stream_from_table

PROPS = {
    "hive.uri": "thrift://metastore:9083",
    "hive.db": "analytics",
    "hive.table": "alerts",
    "hive.partition.columns": "ALERTS:EVENT_TYPE",
}


def test_engine_batch_export(spark, sf_dir, tmp_path):
    engine = ExportEngine.from_properties(PROPS)
    ev = load_table(spark, "events", sf_dir)
    out = str(tmp_path / "batch_out")
    engine.export_batch(ev, out, table="alerts", fmt="parquet")
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert set(back.columns) == {"json_payload", "event_type"}
    payload = json.loads(back.limit(1).collect()[0].json_payload)
    assert "event_type" not in payload  # diverted out of the payload


def test_engine_stream_export(spark, sf_dir, tmp_path):
    engine = ExportEngine.from_properties(PROPS)
    stream = read_stream_from_table(spark, "events", sf_dir)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = engine.export_stream(stream, out, ckpt, table="alerts")
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == load_table(
        spark, "events", sf_dir
    ).count()


def test_engine_rejects_unlisted_table(spark, sf_dir, tmp_path):
    engine = ExportEngine.from_properties(PROPS)
    ev = load_table(spark, "events", sf_dir)
    with pytest.raises(ConfigError):
        engine.export_batch(ev, str(tmp_path / "x"), table="unlisted")


def test_export_error_format_safety():
    assert str(ExportError("failed on %s", "alerts")) == "failed on alerts"
    # bad template must not raise while constructing the error
    e = ExportError("failed %d", "not-a-number")
    assert "failed %d" in str(e)
    assert "not-a-number" in str(e)
