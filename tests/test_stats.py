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
    rows = agg_approx_count_distinct(spark, sf_dir).collect()
    got = {r.o_orderstatus: (r.exact_cust, r.approx_ok) for r in rows}
    for k, n in exact.items():
        assert got[k][0] == n  # exact side of the oracle-able formulation
        assert got[k][1]  # HLL landed within 3x rsd (15%)


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
    rows = agg_approx_quantile_sketch(spark, sf_dir).collect()
    got = {r.l_returnflag: r for r in rows}
    for k, (p50, p99) in exact.items():
        assert got[k].p50_exact == p50 and got[k].p99_exact == p99
        assert got[k].p50_ok and got[k].p99_ok  # sketch within 2% relative
