"""JDBC round-trip against embedded Derby (bundled with Spark): write,
single-stream read, range-partitioned parallel read, predicate pushdown."""

from __future__ import annotations

import pytest

from hive_export_spark.sources import load_table
from hive_export_spark.sources.jdbc import read_jdbc_partitioned, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_roundtrip(spark, sf_dir, derby_url):
    src = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_jdbc(src, derby_url, "customer_jdbc", mode="overwrite", driver=DRIVER)
    back = read_jdbc_partitioned(spark, derby_url, "customer_jdbc", driver=DRIVER)
    assert back.count() == src.count()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_jdbc_partitioned_parallel_read(spark, sf_dir, derby_url):
    src = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_jdbc(src, derby_url, "orders_jdbc", mode="overwrite", driver=DRIVER)
    lo, hi = 0, src.count() * 10
    back = read_jdbc_partitioned(
        spark,
        derby_url,
        "orders_jdbc",
        partition_column="o_orderkey",
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=4,
        driver=DRIVER,
    )
    # the read really is split into 4 range partitions
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == src.count()


def test_jdbc_predicate_pushed_to_source(spark, sf_dir, derby_url):
    src = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    write_jdbc(src, derby_url, "orders_pred_jdbc", mode="overwrite", driver=DRIVER)
    back = read_jdbc_partitioned(
        spark,
        derby_url,
        "orders_pred_jdbc",
        # predicate is remote-dialect SQL: Derby needs quoted identifiers
        # for the case-sensitive column names Spark created
        predicate='"o_totalprice" > 200000',
        driver=DRIVER,
    )
    expected = src.filter("o_totalprice > 200000").count()
    assert back.count() == expected > 0


def test_jdbc_partitioned_requires_bounds(spark, derby_url):
    with pytest.raises(ValueError):
        read_jdbc_partitioned(
            spark, derby_url, "t", partition_column="x", driver=DRIVER
        )


def test_jdbc_auto_stride(spark, sf_dir, derby_url):
    from hive_export_spark.sources.jdbc import read_jdbc_auto

    src = load_table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    write_jdbc(src, derby_url, "cust_auto_jdbc", mode="overwrite", driver=DRIVER)
    back = read_jdbc_auto(
        spark, derby_url, "cust_auto_jdbc", "c_custkey",
        num_partitions=4, driver=DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == src.count()
