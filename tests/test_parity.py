"""Unit tests for reference-parity operators (SURVEY.md section 2.1), covering
the decoder-visitor edge cases: null/blank partition values
(PartitionedJsonDecoder.java:220-228), null-safe timestamp/base64 encode
(:201-214, :235-247), JSON null emission, and schema-order field output."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_export_spark.config import UNSPECIFIED_TOKEN
from hive_export_spark.operators import parity


def test_partition_token_substitution(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("",), ("   ",), ("\t\n",), (" x ",)], ["p"]
    )
    out = parity.partition_token_substitute(df, ["p"]).collect()
    vals = [r.p for r in out]
    assert vals == ["a", UNSPECIFIED_TOKEN, UNSPECIFIED_TOKEN, UNSPECIFIED_TOKEN,
                    UNSPECIFIED_TOKEN, " x "]


def test_typed_encode_timestamp_ms_truncation(spark):
    # µs precision in, ms-precision string out (asApproximateJavaDate analog,
    # PartitionedJsonDecoder.java:209)
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123999)
    df = spark.createDataFrame([(ts,), (None,)], T.StructType(
        [T.StructField("t", T.TimestampType())]))
    out = parity.typed_encode(df).collect()
    assert out[0].t == "2024-03-01 12:30:45.123"
    assert out[1].t is None


def test_typed_encode_binary_base64(spark):
    df = spark.createDataFrame([(bytearray(b"hello"),), (None,)], T.StructType(
        [T.StructField("b", T.BinaryType())]))
    out = parity.typed_encode(df).collect()
    assert out[0].b == "aGVsbG8="
    assert out[1].b is None


def test_typed_encode_passthrough(spark):
    df = spark.createDataFrame([(1, 2.5, "s")], ["i", "d", "s"])
    out = parity.typed_encode(df).collect()[0]
    assert (out.i, out.d, out.s) == (1, 2.5, "s")


def test_json_payload_schema_order_and_nulls(spark):
    # Field order = schema order (LinkedHashMap semantics,
    # PartitionedJsonDecoder.java:136); nulls EMITTED, not dropped.
    df = spark.createDataFrame(
        [(1, None, "x", "p1"), (2, 7, None, None)],
        ["a", "b", "c", "pcol"],
    )
    out = parity.to_partitioned_json(df, ["pcol"]).collect()
    payload0 = out[0].json_payload
    assert payload0 == '{"a":1,"b":null,"c":"x"}'
    assert list(json.loads(payload0).keys()) == ["a", "b", "c"]
    assert out[0].pcol == "p1"
    assert out[1].json_payload == '{"a":2,"b":7,"c":null}'
    assert out[1].pcol == UNSPECIFIED_TOKEN


def test_partition_cols_not_in_payload(spark):
    # Partition columns are diverted OUT of the JSON payload
    # (PartitionedJsonDecoder.java:217-232)
    df = spark.createDataFrame([(1, "eu", "de")], ["id", "continent", "country"])
    out = parity.to_partitioned_json(df, ["continent", "country"]).collect()[0]
    assert json.loads(out.json_payload) == {"id": 1}
    assert (out.continent, out.country) == ("eu", "de")


def test_skip_internal_fields(spark):
    cols = [f"m{i}" for i in range(6)] + ["user_a", "user_b"]
    df = spark.createDataFrame([tuple(range(8))], cols)
    out = parity.skip_internal_fields(df)
    assert out.columns == ["user_a", "user_b"]


def test_write_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", "eu"), (2, "y", None), (3, "z", "eu")],
        ["id", "msg", "continent"],
    )
    routed = parity.export_pipeline(df, ["continent"])
    parity.write_partitioned(routed, str(tmp_path / "out"), ["continent"],
                             mode="overwrite")
    back = spark.read.parquet(str(tmp_path / "out"))
    rows = {(r.continent, r.json_payload) for r in back.collect()}
    assert {"eu", UNSPECIFIED_TOKEN} == {c for c, _ in rows}
    assert len(rows) == 3
    # dynamic partition directories created on demand
    # (HivePartitionStream newConnection(true), HivePartitionStream.java:62-75)
    assert (tmp_path / "out" / "continent=eu").exists()


def test_export_pipeline_on_events(spark, sf_dir):
    from hive_export_spark.sources import load_table

    df = load_table(spark, "events", sf_dir)
    out = parity.export_pipeline(df, ["event_type"])
    assert out.columns == ["json_payload", "event_type"]
    assert out.count() == df.count()
    sample = json.loads(out.limit(1).collect()[0].json_payload)
    assert list(sample.keys()) == ["event_id", "ts", "user_id", "value", "props"]


def test_camel_case_name_transform():
    # Guava UPPER_UNDERSCORE -> LOWER_CAMEL over the upper-cased name
    # (camelCaseNameLowerFirst, PartitionedJsonDecoder.java:300-307)
    assert parity.camel_case_name_lower_first("EVENT_TYPE") == "eventType"
    assert parity.camel_case_name_lower_first("event_type") == "eventType"
    assert parity.camel_case_name_lower_first("TS") == "ts"
    assert parity.camel_case_name_lower_first("USER_ID_V2") == "userIdV2"


def test_camel_case_field_names_knob(spark):
    import json

    df = spark.createDataFrame(
        [(1, "click", "NA")], ["EVENT_ID", "EVENT_TYPE", "REGION_CODE"]
    )
    # default off: raw schema names in the payload (production path,
    # HiveExportClient.java:152)
    raw = parity.to_partitioned_json(df, ["REGION_CODE"]).collect()[0]
    assert list(json.loads(raw.json_payload)) == ["EVENT_ID", "EVENT_TYPE"]
    # knob on: lowerCamelCase payload keys, values unchanged
    camel = parity.to_partitioned_json(
        df, ["REGION_CODE"], camel_case_field_names=True
    ).collect()[0]
    assert json.loads(camel.json_payload) == {"eventId": 1, "eventType": "click"}
    assert camel.REGION_CODE == "NA"


def test_camel_case_config_properties_roundtrip():
    from hive_export_spark.config import ExportConfig

    cfg = ExportConfig.from_properties(
        {
            "hive.uri": "thrift://m:9083",
            "hive.db": "d",
            "hive.table": "t",
            "hive.partition.columns": "t:c",
            "camelcase.fieldnames": "true",
        }
    )
    assert cfg.camel_case_field_names is True
    # default matches the reference's hardcoded false
    assert ExportConfig(uri="thrift://m:9083", db="d", table="t",
                        allow_unpartitioned=True).camel_case_field_names is False


def test_camel_case_collision_raises(spark):
    import pytest

    # USER_ID and USER__ID are distinct column names but both map to
    # lowerCamelCase key 'userId' (the empty segment contributes nothing)
    df = spark.createDataFrame([(1, 2, "NA")], ["USER_ID", "USER__ID", "REGION"])
    with pytest.raises(ValueError, match="collision"):
        parity.to_partitioned_json(df, ["REGION"], camel_case_field_names=True)
