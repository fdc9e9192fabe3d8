"""Round-trip tests for every supported sink/source format, including the
reference's required ORC sink (README.md:69-74) and partitioned variants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_export_spark.operators.parity import export_pipeline
from hive_export_spark.sources import load_table
from hive_export_spark.sources.files import read_table, write_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, "customer", sf_dir)
    path = str(tmp_path / fmt)
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=src.schema)
    assert back.count() == src.count()
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_partitioned_write_roundtrip(spark, sf_dir, tmp_path, fmt):
    # the reference's R9: routed write into a partitioned columnar table,
    # with dynamic partition creation
    ev = load_table(spark, "events", sf_dir)
    routed = export_pipeline(ev, ["event_type"])
    path = str(tmp_path / f"routed_{fmt}")
    write_table(routed, path, fmt=fmt, partition_by=["event_type"])
    back = read_table(spark, path, fmt=fmt)
    assert back.count() == ev.count()
    # partition pruning: reading one partition touches only its directory
    one = read_table(spark, path, fmt=fmt).filter(F.col("event_type") == "click")
    assert 0 < one.count() < ev.count()
    assert (tmp_path / f"routed_{fmt}" / "event_type=click").exists()


def test_csv_schema_explicit_read(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 2.5)], ["i", "s", "d"])
    path = str(tmp_path / "csv_explicit")
    write_table(df, path, fmt="csv")
    back = read_table(spark, path, fmt="csv", schema=df.schema)
    assert back.schema == df.schema
    assert back.collect() == df.collect()


def test_json_preserves_nested(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"k": 5}, ["x", "y"])],
        "id int, m map<string,int>, arr array<string>",
    )
    path = str(tmp_path / "json_nested")
    write_table(df, path, fmt="json")
    back = read_table(spark, path, fmt="json", schema=df.schema)
    assert back.collect() == df.collect()


def test_sf_scratch_dir_keys_on_full_path(tmp_path):
    # two fixture roots with the SAME leaf name must get distinct scratch
    # dirs (basename keying silently reused stale cached data across roots)
    from hive_export_spark.queries.connector_queries import sf_scratch_dir

    a = tmp_path / "a" / "sf1"
    b = tmp_path / "b" / "sf1"
    da, db = sf_scratch_dir("probe", str(a)), sf_scratch_dir("probe", str(b))
    assert da != db
    # stable for the same root (the cache must still hit within a process)
    assert da == sf_scratch_dir("probe", str(a))
    # trailing-slash and relative-path spellings of one root agree
    assert db == sf_scratch_dir("probe", str(b) + "/")
