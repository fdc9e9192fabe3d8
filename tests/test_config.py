"""Config grammar + validation semantics (reference: HiveExportClient.java:66-112,
HiveEndPointFactory.java:42-63; bug fixes per SURVEY.md section 1.5)."""

import pytest

from hive_export_spark.config import (
    ConfigError,
    ExportConfig,
    UNSPECIFIED_TOKEN,
    parse_partition_spec,
)


def test_parse_spec_basic():
    assert parse_partition_spec("ALERTS:CONTINENT|COUNTRY") == {
        "ALERTS": ["CONTINENT", "COUNTRY"]
    }


def test_parse_spec_multi_table_and_case():
    # uppercasing both sides mirrors HiveExportClient.java:92
    assert parse_partition_spec("alerts:continent, metrics:region|zone") == {
        "ALERTS": ["CONTINENT"],
        "METRICS": ["REGION", "ZONE"],
    }


def test_parse_spec_empty():
    assert parse_partition_spec("") == {}


@pytest.mark.parametrize("bad", ["ALERTS", "ALERTS:", ":COL", "A:B,A:C"])
def test_parse_spec_malformed(bad):
    with pytest.raises(ConfigError):
        parse_partition_spec(bad)


def test_uri_validation():
    with pytest.raises(ConfigError):
        ExportConfig(uri="", db="d", table="t")
    with pytest.raises(ConfigError):
        ExportConfig(uri="http://x", db="d", table="t")
    ExportConfig(uri="thrift://metastore:9083", db="d", table="t")


def test_empty_db_table():
    with pytest.raises(ConfigError):
        ExportConfig(uri="thrift://x", db=" ", table="t")
    with pytest.raises(ConfigError):
        ExportConfig(uri="thrift://x", db="d", table="")


def test_unlisted_table_fails_loudly():
    # Fixes reference bug #1: dead guard at HiveExportClient.java:142-146
    # let unlisted tables export unpartitioned silently.
    cfg = ExportConfig(
        uri="thrift://x", db="d", table="t",
        partition_columns={"alerts": ["continent"]},
    )
    assert cfg.partition_cols_for("ALERTS") == ["CONTINENT"]
    with pytest.raises(ConfigError):
        cfg.partition_cols_for("OTHER")
    cfg2 = ExportConfig(
        uri="thrift://x", db="d", table="t",
        partition_columns={}, allow_unpartitioned=True,
    )
    assert cfg2.partition_cols_for("OTHER") == []


def test_multi_table_equal_counts_ok():
    # Fixes reference bug #2: spurious failure for >=2 tables with equal
    # partition-column counts (HiveExportClient.java:97-111).
    cfg = ExportConfig(
        uri="thrift://x", db="d", table="t",
        partition_columns={"a": ["c1", "c2"], "b": ["c3", "c4"]},
    )
    assert cfg.partition_cols_for("A") == ["C1", "C2"]
    assert cfg.partition_cols_for("B") == ["C3", "C4"]


def test_schema_validation():
    cfg = ExportConfig(
        uri="thrift://x", db="d", table="t",
        partition_columns={"t": ["part_col"]},
    )
    cfg.validate_against_schema("t", {"part_col": "string", "x": "int"})
    with pytest.raises(ConfigError):  # missing column (PartitionedJsonDecoder.java:72-76)
        cfg.validate_against_schema("t", {"x": "int"})
    with pytest.raises(ConfigError):  # non-string (PartitionedJsonDecoder.java:77-84)
        cfg.validate_against_schema("t", {"part_col": "int"})


def test_from_properties():
    cfg = ExportConfig.from_properties(
        {
            "hive.uri": "thrift://h:9083",
            "hive.db": "db",
            "hive.table": "alerts",
            "hive.partition.columns": "ALERTS:CONTINENT|COUNTRY",
        }
    )
    assert cfg.partition_cols_for("alerts") == ["CONTINENT", "COUNTRY"]
    assert cfg.unspecified_token == UNSPECIFIED_TOKEN
