"""Catalog-table sink: endpoint validation, dynamic partition creation,
append (tx-batch) semantics — against the session catalog, plus a
subprocess test against a REAL Hive metastore (derby) proving the same
code path works under enableHiveSupport."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

from hive_export_spark.config import ConfigError, ExportConfig, UNSPECIFIED_TOKEN
from hive_export_spark.sinks import export_to_catalog_table
from hive_export_spark.sources import load_table


@pytest.fixture()
def cfg():
    return ExportConfig(
        uri="thrift://metastore:9083",
        db="exportdb",
        table="alerts",
        partition_columns={"alerts": ["event_type"]},
    )


def test_catalog_export_roundtrip(spark, sf_dir, cfg):
    ev = load_table(spark, "events", sf_dir)
    try:
        fq = export_to_catalog_table(ev, cfg, fmt="parquet")
        assert fq == "exportdb.alerts"
        back = spark.table(fq)
        assert back.count() == ev.count()
        # dynamic partition creation: one catalog partition per event_type
        parts = {r.partition for r in spark.sql(f"SHOW PARTITIONS {fq}").collect()}
        assert {"event_type=click", "event_type=error"} <= parts
        # append semantics: second export doubles the rows (tx-batch analog)
        export_to_catalog_table(ev, cfg, fmt="parquet")
        assert spark.table(fq).count() == 2 * ev.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS exportdb.alerts")
        spark.sql("DROP DATABASE IF EXISTS exportdb")


def test_catalog_export_validates_endpoint(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    # unlisted table fails loudly (reference bug #1 fixed)
    cfg = ExportConfig(uri="thrift://m:9083", db="d", table="other_table")
    with pytest.raises(ConfigError):
        export_to_catalog_table(ev, cfg)
    # non-string partition column rejected (PartitionedJsonDecoder.java:77-84)
    cfg2 = ExportConfig(
        uri="thrift://m:9083", db="d", table="alerts",
        partition_columns={"alerts": ["value"]},
    )
    with pytest.raises(ConfigError):
        export_to_catalog_table(ev, cfg2)


HIVE_SUBPROCESS = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from hive_export_spark.config import ExportConfig
    from hive_export_spark.sinks import export_to_catalog_table
    from hive_export_spark.sources import load_table

    wd = tempfile.mkdtemp()
    spark = (SparkSession.builder.master("local[4]")
             .appName("hive-sink-test")
             .config("spark.sql.warehouse.dir", os.path.join(wd, "warehouse"))
             .config("spark.ui.enabled", "false")
             .config("javax.jdo.option.ConnectionURL",
                     f"jdbc:derby:;databaseName={wd}/metastore_db;create=true")
             .enableHiveSupport()
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    cfg = ExportConfig(uri="thrift://metastore:9083", db="exportdb",
                       table="alerts",
                       partition_columns={"alerts": ["event_type"]})
    fq = export_to_catalog_table(ev, cfg, fmt="orc")  # ORC: reference-required
    n = spark.table(fq).count()
    parts = spark.sql(f"SHOW PARTITIONS {fq}").count()
    fmt_ok = "OrcSerde" in str(
        spark.sql(f"DESCRIBE TABLE EXTENDED {fq}").collect()
    ) or "orc" in str(
        spark.sql(f"DESCRIBE TABLE EXTENDED {fq}").collect()).lower()
    print(f"RESULT rows={n} partitions={parts} orc={fmt_ok}")
    """
)


def test_catalog_export_against_real_hive_metastore(sf_dir):
    # separate process: enableHiveSupport must be set before the first
    # session is created, and the shared test session is not Hive-enabled
    proc = subprocess.run(
        [sys.executable, "-c", HIVE_SUBPROCESS],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
    assert result, proc.stdout[-2000:]
    assert "rows=1000" in result[0]
    assert "partitions=5" in result[0]
    assert "orc=True" in result[0]


def test_catalog_export_table_name_override(spark, sf_dir):
    """table_name selects BOTH the partition spec and the target table —
    a mismatch would validate one table while appending into another."""
    ev = load_table(spark, "events", sf_dir).limit(100)
    cfg = ExportConfig(
        uri="thrift://metastore:9083",
        db="exportdb",
        table="alerts",
        partition_columns={"alerts": ["event_type"], "audit": ["event_type"]},
    )
    try:
        fq = export_to_catalog_table(ev, cfg, table_name="audit", fmt="parquet")
        assert fq == "exportdb.audit"
        assert spark.table("exportdb.audit").count() == 100
        assert not spark.catalog.tableExists("exportdb.alerts")
    finally:
        spark.sql("DROP TABLE IF EXISTS exportdb.audit")
        spark.sql("DROP TABLE IF EXISTS exportdb.alerts")
        spark.sql("DROP DATABASE IF EXISTS exportdb")
