"""Accuracy tests for aggregations that cannot be oracle-hash-checked."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_export_spark.queries.stats_queries import agg_approx_count_distinct
from hive_export_spark.sources import load_table


def test_approx_count_distinct_accuracy(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r.o_orderstatus: r.approx_cust
        for r in agg_approx_count_distinct(spark, sf_dir).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05  # HLL++ default rsd


def test_moments_match_builtin_within_fp(spark, sf_dir):
    # the decimal-power-sum derivation must agree with Spark's built-in
    # stddev to floating-point tolerance (it is the same statistic)
    from hive_export_spark.queries.stats_queries import agg_stats_moments

    ours = {
        r.c_mktsegment: r.stddev_bal for r in agg_stats_moments(spark, sf_dir).collect()
    }
    builtin = {
        r.c_mktsegment: r.s
        for r in load_table(spark, "customer", sf_dir)
        .groupBy("c_mktsegment")
        .agg(F.stddev("c_acctbal").alias("s"))
        .collect()
    }
    for k in builtin:
        assert abs(ours[k] - builtin[k]) < 1e-6 * abs(builtin[k])


def test_approx_percentile_accuracy(spark, sf_dir):
    from hive_export_spark.queries.stats_queries import agg_approx_quantile_sketch

    li = load_table(spark, "lineitem", sf_dir)
    exact = {
        r.l_returnflag: (r.p50, r.p99)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5D)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.99D)").alias("p99"),
        )
        .collect()
    }
    approx = {
        r.l_returnflag: (r.p50_approx, r.p99_approx)
        for r in agg_approx_quantile_sketch(spark, sf_dir).collect()
    }
    for k, (p50, p99) in exact.items():
        assert abs(approx[k][0] - p50) / p50 < 0.05
        assert abs(approx[k][1] - p99) / p99 < 0.05
