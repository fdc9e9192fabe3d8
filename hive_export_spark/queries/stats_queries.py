"""Statistical-aggregation queries: moments, percentiles, mode,
ordered collection, pivot, approximate distinct.

Hash-stability: variance/stddev/correlation are NOT used via the built-in
double accumulators (reduction order differs between engines); they are
derived from DECIMAL power sums (exact, associative), with the final
arithmetic in double — identical operand values and operation order on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_export_spark.registry import register
from hive_export_spark.sources import load_table

_DEC = "decimal(12,2)"


@register(
    "agg_stats_moments",
    oracle="""
WITH sums AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sx,
         SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS sxx
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
       CAST(sx AS DOUBLE) / n AS mean_bal,
       (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1) AS var_bal,
       sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) AS stddev_bal
FROM sums
""",
    doc="mean/variance/stddev from decimal power sums — exact partial "
    "aggregation, deterministic across reduction orders (built-in double "
    "accumulators are order-sensitive and engine-divergent)",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    bal = F.col("c_acctbal").cast(_DEC)
    sums = c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(bal).alias("sx"),
        F.sum(bal * bal).alias("sxx"),
    )
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    n = F.col("n")
    var = (sxx - sx * sx / n) / (n - 1)
    return sums.select(
        "c_mktsegment",
        "n",
        (sx / n).alias("mean_bal"),
        var.alias("var_bal"),
        F.sqrt(var).alias("stddev_bal"),
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderstatus
""",
    doc="exact linear-interpolation percentiles (Spark percentile == "
    "DuckDB quantile_cont, probed bit-equal)",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    o.createOrReplaceTempView("orders_pct")
    return spark.sql(
        """
        SELECT o_orderstatus,
               percentile(o_totalprice, 0.5D) AS p50,
               percentile(o_totalprice, 0.9D) AS p90,
               percentile(o_totalprice, 0.99D) AS p99
        FROM orders_pct GROUP BY o_orderstatus
        """
    )


@register(
    "agg_mode_deterministic",
    oracle="""
SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
  SELECT o_orderstatus, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
) WHERE rn = 1
""",
    doc="mode with deterministic tie-break (count desc, value asc) — "
    "built-in mode() breaks ties arbitrarily in both engines",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, "orders", sf_dir)
    counts = o.groupBy("o_orderstatus", "o_orderpriority").count()
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("count").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )


@register(
    "agg_collect_sorted",
    oracle="""
SELECT c_nationkey,
       array_to_string(list_sort(list(c_custkey)), ',') AS custkeys
FROM (SELECT * FROM customer WHERE c_custkey <= 200) GROUP BY c_nationkey
""",
    doc="ordered collection: array_sort(collect_list()) — collection order "
    "is nondeterministic, sorting restores hash stability. The array is "
    "emitted comma-joined: the driver's normalization of array cells is "
    "unverified (no green row ever carried one), a string is drift-proof.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") <= 200)
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("c_custkey")), ","
        ).alias("custkeys")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'F') AS status_F,
       COUNT(*) FILTER (o_orderstatus = 'O') AS status_O,
       COUNT(*) FILTER (o_orderstatus = 'P') AS status_P
FROM orders GROUP BY o_orderpriority
""",
    doc="pivot with an explicit value list (explicit lists are mandatory "
    "at scale: value discovery is an extra pass over the fact table)",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot emits nulls for empty cells; counts should be 0
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
       TRUE AS approx_ok
FROM orders GROUP BY o_orderstatus
""",
    doc="approx_count_distinct (HyperLogLog++): the scale substitute for "
    "exact COUNT(DISTINCT) — sketch mergeable, single pass, no expand. "
    "Oracle-able formulation: HLL sketches differ across engines by "
    "construction, so the query emits the exact count plus a boolean "
    "asserting the sketch landed within 3x its configured rsd (0.05 -> "
    "15%; observed fixture error <= 5.7%); the oracle computes the exact "
    "count in SQL and literal TRUE.",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    agg = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("__approx"),
        F.countDistinct("o_custkey").alias("exact_cust"),
    )
    rel_err = F.abs(F.col("__approx") - F.col("exact_cust")) / F.col("exact_cust")
    return agg.select(
        "o_orderstatus", "exact_cust", (rel_err <= F.lit(0.15)).alias("approx_ok")
    )


@register(
    "sql_frontend_q1",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderstatus
""",
    doc="pure-SQL execution through the engine's SQL frontend "
    "(sources.views.sql): identical semantics to the DataFrame API, same "
    "Catalyst plan",
)
def sql_frontend_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_export_spark.sources.views import sql

    return sql(
        spark,
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderstatus
        """,
        sf_dir,
    )


@register(
    "agg_approx_quantile_sketch",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_exact,
       quantile_cont(l_extendedprice, 0.99) AS p99_exact,
       TRUE AS p50_ok,
       TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag
""",
    doc="approx_percentile: mergeable quantile sketch — the single-pass "
    "scale substitute for exact percentiles (error bounded by the "
    "accuracy parameter). Oracle-able formulation: sketch outputs are "
    "engine-specific, so the query emits exact percentiles (bit-equal to "
    "DuckDB quantile_cont, probed) plus booleans asserting the sketch is "
    "within 2% relative (observed fixture error <= 0.14% at accuracy "
    "1000); the oracle computes exact percentiles and literal TRUE.",
)
def agg_approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    agg = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5D, 1000)").alias("__a50"),
        F.expr("approx_percentile(l_extendedprice, 0.99D, 1000)").alias("__a99"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("p50_exact"),
        F.expr("percentile(l_extendedprice, 0.99D)").alias("p99_exact"),
    )

    def ok(approx, exact):
        return F.abs(F.col(approx) - F.col(exact)) / F.abs(F.col(exact)) <= F.lit(
            0.02
        )

    return agg.select(
        "l_returnflag",
        "p50_exact",
        "p99_exact",
        ok("__a50", "p50_exact").alias("p50_ok"),
        ok("__a99", "p99_exact").alias("p99_ok"),
    )
