"""Statistical-aggregation queries: moments, percentiles, mode,
ordered collection, pivot, approximate distinct.

Hash-stability: variance/stddev/correlation are NOT used via the built-in
double accumulators (reduction order differs between engines); they are
derived from DECIMAL power sums (exact, associative), with the final
arithmetic in double — identical operand values and operation order on
both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
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
SELECT c_mktsegment, n, mean_bal, var_bal,
       -- NULL-preserving zero clamp: a constant segment's variance can
       -- float-cancel to a TINY NEGATIVE (sxx and sx^2/n round apart in
       -- double) — DuckDB sqrt raises where Spark yields NaN (round-10
       -- constant sweep, fresh driver fixture). CASE, not greatest():
       -- greatest(NULL, 0) is 0 on Spark but NULL here.
       sqrt(CASE WHEN var_bal < 0 THEN 0 ELSE var_bal END) AS stddev_bal
FROM (
  SELECT c_mktsegment, n,
         CAST(sx AS DOUBLE) / n AS mean_bal,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
           / (n - 1) AS var_bal
  FROM sums
)
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
    # try_divide: a single-customer segment has n-1 = 0; ANSI Spark
    # raises where DuckDB yields NULL (round-6 hostile sweep)
    var = F.try_divide(sxx - sx * sx / n, (n - 1).cast("double"))
    # NULL-preserving zero clamp under the sqrt: a constant segment's
    # variance can float-cancel to a tiny negative (round-10 constant
    # sweep) — sqrt(negative) is a DuckDB crash and a Spark NaN. CASE,
    # not F.greatest (greatest ignores NULLs: the n=1 NULL variance
    # would clamp to 0 instead of staying NULL).
    var0 = F.when(var < 0, F.lit(0.0)).otherwise(var)
    return sums.select(
        "c_mktsegment",
        "n",
        (sx / n).alias("mean_bal"),
        var.alias("var_bal"),
        F.sqrt(var0).alias("stddev_bal"),
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
    # try_divide + vacuous-ok: a status group whose only orders are
    # guest checkouts (all-NULL custkey — the wave-7 class, one unique
    # status value away) has countDistinct = 0 with a non-NULL
    # numerator — ANSI crash, probed with a receipt round 8. Zero
    # distinct values estimated as zero is a correct sketch, so the
    # boolean stays TRUE (the oracle's literal) instead of NULL.
    rel_err = F.try_divide(
        F.abs(F.col("__approx") - F.col("exact_cust")), F.col("exact_cust")
    )
    # coalesce(False): exact 0 with a NON-zero estimate leaves rel_err
    # NULL (try_divide) and the vacuous clause false — a misestimating
    # sketch on an empty group must read as a clean FALSE, not a
    # tri-state NULL (r8 driver advisory #3)
    approx_ok = F.coalesce(
        ((F.col("exact_cust") == 0) & (F.col("__approx") == 0))
        | (rel_err <= F.lit(0.15)),
        F.lit(False),
    )
    return agg.select("o_orderstatus", "exact_cust", approx_ok.alias("approx_ok"))


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
        # vacuous-ok + try_divide + coalesce(False) (round-9 all-NULL
        # sweep): a group with no values has NULL exact AND NULL sketch
        # (both engines' aggregates skip NULLs) — that reads TRUE; an
        # exact of 0 divides safely via the equality short-circuit; any
        # residual NULL reads as a clean FALSE
        return F.coalesce(
            F.when(F.col(exact).isNull(), F.col(approx).isNull()).otherwise(
                (F.col(approx) == F.col(exact))
                | (
                    F.try_divide(
                        F.abs(F.col(approx) - F.col(exact)),
                        F.abs(F.col(exact)),
                    )
                    <= F.lit(0.02)
                )
            ),
            F.lit(False),
        )

    return agg.select(
        "l_returnflag",
        "p50_exact",
        "p99_exact",
        ok("__a50", "p50_exact").alias("p50_ok"),
        ok("__a99", "p99_exact").alias("p99_ok"),
    )


@register(
    "agg_hll_sketch_union",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS sketch_ok
FROM lineitem GROUP BY l_returnflag
""",
    doc="mergeable DataSketches HLL rollup (hll_sketch_agg / "
    "hll_union_agg): per-(flag, orderkey-parity) partial sketches are "
    "built first, then UNIONED to flag level without re-scanning rows — "
    "the sketch algebra that makes 100 TB distinct-count rollups "
    "incremental (sketch per day/partition, merge on demand; re-scan "
    "never). Oracle-able formulation: sketch bits are engine-specific, "
    "so the query emits the exact distinct count plus a boolean pinning "
    "the merged estimate within 5% (observed <=2%, lgConfigK=12 rse "
    "~1.6%); the oracle computes the exact count and literal TRUE.",
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    partials = (
        li.withColumn("__half", (F.col("l_orderkey") % 2).cast("int"))
        .groupBy("l_returnflag", "__half")
        .agg(F.hll_sketch_agg("l_partkey").alias("__sk"))
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    # try_divide + vacuous-ok (same class as agg_approx_count_distinct,
    # round-8 receipt): a flag group whose lineitems all carry NULL
    # partkey makes the exact count 0 (ANSI crash on the bare divide)
    # and the all-NULL sketch estimate NULL — zero-as-zero is a correct
    # sketch, pinned TRUE to match the oracle's literal.
    rel_err = F.try_divide(
        F.abs(F.col("__est") - F.col("exact_parts")), F.col("exact_parts")
    )
    # coalesce(False): same advisory-#3 tri-state guard as
    # agg_approx_count_distinct — exact 0 + non-zero estimate must read
    # FALSE, not NULL
    sketch_ok = F.coalesce(
        (
            (F.col("exact_parts") == 0)
            & (F.coalesce(F.col("__est"), F.lit(0.0)) == 0)
        )
        | (rel_err <= F.lit(0.05)),
        F.lit(False),
    )
    # null-safe join: an all-NULL-flag corpus forms a NULL pseudo-group
    # that GROUP BY keeps on both engines but a plain equi-join silently
    # drops (wave-7 doctrine, re-hit by the round-9 all-NULL sweep)
    return (
        exact.alias("e")
        .join(
            merged.alias("m"),
            F.col("e.l_returnflag").eqNullSafe(F.col("m.l_returnflag")),
        )
        .select(
            F.col("e.l_returnflag").alias("l_returnflag"),
            "exact_parts",
            sketch_ok.alias("sketch_ok"),
        )
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
FROM orders GROUP BY o_orderstatus
""",
    doc="EXACT mergeable distinct count via RoaringBitmap-style bitmaps "
    "(bitmap_construct_agg / bitmap_or_agg / bitmap_count): per-(status, "
    "custkey-parity) partial bitmaps OR-merged to status level — unlike "
    "HLL this is exact AND mergeable, the warehouse pattern for "
    "distinct-count rollups over bounded-cardinality integer keys "
    "(bitmap bytes ~ key range / 8, merge is bitwise OR). No tolerance "
    "boolean needed: the merged bitmap_count equals COUNT(DISTINCT).",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    # the general unbounded-key-range shape: one bitmap per 32k-value
    # bucket (bitmap_bucket_number), OR-merge partials within a bucket,
    # then SUM per-bucket cardinalities — buckets partition the key
    # space, so the sum is exact
    partials = (
        o.withColumn("__half", (F.col("o_custkey") % 2).cast("int"))
        .withColumn("__bucket", F.expr("bitmap_bucket_number(o_custkey)"))
        .groupBy("o_orderstatus", "__bucket", "__half")
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
                "__bm"
            )
        )
    )
    per_bucket = partials.groupBy("o_orderstatus", "__bucket").agg(
        F.expr("bitmap_count(bitmap_or_agg(__bm))").alias("__c")
    )
    return per_bucket.groupBy("o_orderstatus").agg(
        F.sum("__c").cast("bigint").alias("n_cust")
    )


@register(
    "agg_theta_sketch_intersect",
    oracle="""
SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST((SELECT COUNT(DISTINCT c.user_id)
             FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') c
             JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') p
               ON c.user_id = p.user_id) AS BIGINT) AS n_both,
       TRUE AS sketch_ok
""",
    doc="theta sketch set algebra (theta_sketch_agg / "
    "theta_intersection): audience-overlap distinct counting — |clickers "
    "INTERSECT purchasers| estimated from two independently-built "
    "sketches, no joint scan. At 100 TB the sketches are built per "
    "segment/day and intersected on demand (HLL can union but never "
    "intersect; theta is the sketch family with full set algebra). "
    "Oracle-able formulation: the query emits exact counts plus a "
    "boolean pinning each estimate within 5%; the oracle computes the "
    "exact counts and literal TRUE.",
)
def agg_theta_sketch_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sk = ev.filter(F.col("event_type").isin("click", "purchase")).groupBy(
        "event_type"
    ).agg(F.expr("theta_sketch_agg(user_id)").alias("__sk"))
    exact = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("n_click"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_purchase"),
    )
    exact_both = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .join(
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id")
            .distinct(),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    # each sketch leg is a global no-key AGGREGATE (first over 0-or-1
    # sketch rows), never a filter/select: a filter leg has ZERO rows on
    # a day-zero (empty) corpus and annihilates the whole crossJoin
    # chain, where the oracle's scalar subqueries still emit their 1-row
    # summary (round-8 day-zero sweep). The intersection uses the SCALAR
    # theta_intersection over the two legs — theta_intersection_agg
    # raises ("infinite set") when aggregated over ZERO sketches, even
    # under an output guard, while the scalar form NULL-propagates a
    # missing side (probed round 8). coalesce pins every missing-side
    # estimate to 0 = the exact count on an empty/one-sided corpus, so
    # sketch_ok stays TRUE vacuously; all no-ops on a two-sided corpus.
    est = (
        sk.filter(F.col("event_type") == "click")
        .agg(F.first("__sk").alias("__sk_click"))
        # bounded: 1-row first-sketch aggregate on each side
        .crossJoin(
            sk.filter(F.col("event_type") == "purchase").agg(
                F.first("__sk").alias("__sk_purchase")
            )
        )
        .select(
            F.coalesce(
                F.expr("theta_sketch_estimate(__sk_click)"), F.lit(0.0)
            ).alias("__e_click"),
            F.coalesce(
                F.expr("theta_sketch_estimate(__sk_purchase)"), F.lit(0.0)
            ).alias("__e_purchase"),
            F.coalesce(
                F.expr(
                    "theta_sketch_estimate("
                    "theta_intersection(__sk_click, __sk_purchase))"
                ),
                F.lit(0.0),
            ).alias("__e_both"),
        )
    )
    rel = lambda e, x: F.abs(e - x) / F.greatest(x, F.lit(1))  # noqa: E731
    return (
        # bounded: 1-row exact count aggregates
        exact.crossJoin(exact_both)
        # bounded: 1-row sketch-estimate frame
        .crossJoin(est)
        .select(
            "n_click",
            "n_purchase",
            "n_both",
            (
                (rel(F.col("__e_click"), F.col("n_click")) <= 0.05)
                & (rel(F.col("__e_purchase"), F.col("n_purchase")) <= 0.05)
                & (rel(F.col("__e_both"), F.col("n_both")) <= 0.05)
            ).alias("sketch_ok"),
        )
    )


@register(
    "agg_kll_quantile_merge",
    oracle="""
SELECT l_returnflag,
       CAST(__p AS DOUBLE) AS exact_p50,
       TRUE AS sketch_ok
FROM (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS __p,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY CAST(l_extendedprice AS DECIMAL(12,2))) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
) WHERE rn = CAST(FLOOR((n + 1) / 2) AS BIGINT)
""",
    doc="mergeable KLL quantile sketches (kll_sketch_agg_double / "
    "kll_sketch_merge_double): per-(flag, orderkey-parity) partial "
    "sketches merged to flag level, median read off the merged sketch — "
    "the percentile analog of the HLL rollup (exact percentiles don't "
    "merge; KLL partials do, which is what makes p50/p99 dashboards "
    "incremental at 100 TB). The query emits the exact discrete median "
    "plus a boolean pinning the merged-sketch estimate within 2% "
    "rank-tolerance-adjusted value error. The exact median is pinned to "
    "ONE convention on both sides — the lower-middle element, "
    "rank = floor((n+1)/2) of the value-ordered group, picked with "
    "ROW_NUMBER — because engine quantile builtins disagree on the "
    "even-count discrete-median element (Spark approx_percentile vs "
    "DuckDB quantile_disc), which would make the hash brittle to "
    "fixture regeneration; the oracle computes the identical pick and "
    "literal TRUE.",
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).withColumn(
        "__p", F.col("l_extendedprice").cast("decimal(12,2)").cast("double")
    )
    partials = (
        li.withColumn("__half", (F.col("l_orderkey") % 2).cast("int"))
        .groupBy("l_returnflag", "__half")
        .agg(F.expr("kll_sketch_agg_double(__p, 200)").alias("__sk"))
    )
    # kll_sketch_merge_double is a scalar two-sketch merge (not an agg):
    # pivot the two partials side by side and merge pairwise — the same
    # associative merge a tree-reduction over N partials would run
    merged = (
        partials.groupBy("l_returnflag")
        .pivot("__half", [0, 1])
        .agg(F.first("__sk"))
        .select("l_returnflag", F.col("`0`").alias("__sk0"),
                F.col("`1`").alias("__sk1"))
    )
    from pyspark.sql.window import Window

    # exact discrete median, SAME convention as the oracle: lower-middle
    # element at rank floor((n+1)/2) of the value-ordered group (builtin
    # discrete-quantile rank conventions differ between engines for
    # even-count groups, so neither side uses one).
    # Round-14 (guide §2.3 "aggregate before you shuffle"): the rank is
    # computed over VALUE COUNTS, not rows — one partial-mergeable
    # (flag, __p) count aggregation replaces the full-row shuffle, and
    # the per-group sort runs over distinct prices instead of every
    # lineitem row. The picked element is identical: the old ROW_NUMBER
    # walked rows in (__p ASC NULLS FIRST) order and took rank r =
    # floor((n+1)/2); here the distinct value whose cumulative-count
    # interval [cum - c, cum) contains r is by construction the value of
    # that same rank-r row (ties share a value; the NULL pseudo-group
    # sorts first in both framings, so an all-NULL-prefix median still
    # lands on NULL exactly as before).
    w_ord = (
        Window.partitionBy("l_returnflag")
        .orderBy("__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    # ONE (flag, value) count aggregation feeds BOTH exact legs
    # (round-14, guide §1.2 "remove passes"): the discrete median walks
    # the cumulative counts, and the continuous median uses percentile's
    # FREQUENCY argument over the same counts — the builtin's exact
    # per-value count semantics, so the interpolated result is
    # bit-identical to percentile(__p, 0.5, 1) over the raw rows
    # (asserted row-for-row on the fixture before adoption; NULL
    # handling agrees — percentile ignores NULL values in both
    # framings, so an all-NULL group yields NULL either way). This
    # removes one full lineitem scan + one row-fed aggregation; the
    # identical counts subtrees collapse into one Exchange via reuse.
    counts = li.groupBy("l_returnflag", "__p").agg(
        F.count(F.lit(1)).alias("__c")
    )
    exact_disc = (
        counts
        .withColumn("__cum", F.sum("__c").over(w_ord))
        .withColumn("__n", F.sum("__c").over(w_all))
        .withColumn("__r", F.floor((F.col("__n") + 1) / 2))
        .filter(
            (F.col("__cum") - F.col("__c") < F.col("__r"))
            & (F.col("__r") <= F.col("__cum"))
        )
        .select("l_returnflag", F.col("__p").alias("exact_p50"))
    )
    # null-safe joins: keep the NULL pseudo-group a GROUP BY emits on
    # both engines (wave-7 doctrine, round-9 all-NULL sweep)
    exact_cont = counts.groupBy("l_returnflag").agg(
        F.expr("percentile(__p, 0.5, __c)").alias("__exact_cont"),
    )
    exact = (
        exact_cont.alias("c")
        .join(
            exact_disc.alias("d"),
            F.col("c.l_returnflag").eqNullSafe(F.col("d.l_returnflag")),
        )
        .select(F.col("c.l_returnflag").alias("l_returnflag"),
                "__exact_cont", "exact_p50")
    )
    # the merge + quantile read runs AFTER the join, guarded on the
    # group actually having a non-NULL value: kll_sketch_agg_double over
    # an all-NULL group returns a non-NULL EMPTY buffer whose
    # get_quantile raises KLL_INVALID_INPUT_SKETCH_BUFFER (round-9
    # all-NULL sweep probe); __exact_cont is NULL for exactly those
    # groups, and scalar CASE WHEN is lazy, so the read never runs.
    # coalesce fallback: a day-one group whose rows all land in ONE
    # orderkey-half pivots the other half to NULL, and
    # kll_sketch_merge_double NULL-propagates (probed round 8) — fall
    # back to whichever single partial exists
    est = F.when(
        F.col("__exact_cont").isNotNull(),
        F.expr(
            "kll_sketch_get_quantile_double("
            "  coalesce(kll_sketch_merge_double(__sk0, __sk1),"
            "           __sk0, __sk1),"
            "  0.5)"
        ),
    )
    return (
        exact.alias("e")
        .join(
            merged.alias("m"),
            F.col("e.l_returnflag").eqNullSafe(F.col("m.l_returnflag")),
        )
        .select(
            F.col("e.l_returnflag").alias("l_returnflag"),
            F.col("exact_p50").cast("double").alias("exact_p50"),
            # vacuous-ok: a group with no values has no median to
            # misestimate (the oracle emits its literal TRUE there);
            # coalesce(False) keeps the boolean two-state otherwise
            F.coalesce(
                F.when(F.col("__exact_cont").isNull(), F.lit(True)).otherwise(
                    F.abs(est - F.col("__exact_cont"))
                    / F.greatest(F.abs(F.col("__exact_cont")), F.lit(1.0))
                    <= 0.02
                ),
                F.lit(False),
            ).alias("sketch_ok"),
        )
    )


@register(
    "agg_corr_regression",
    oracle="""
SELECT l_returnflag,
       CAST(round(corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 6) + 0 AS DOUBLE) AS corr_qty_price,
       CAST(round(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 4) + 0 AS DOUBLE) AS slope_price_on_qty,
       CAST(round(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2) + 0 AS DOUBLE) AS intercept_price_on_qty,
       CAST(regr_count(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) AS BIGINT) AS n_pairs
FROM lineitem GROUP BY l_returnflag
""",
    doc="correlation / linear-regression aggregate family (corr, "
    "regr_slope, regr_intercept, regr_count): the two-column statistical "
    "aggregates, all single-pass partial-mergeable (sum of products "
    "co-moments) — distributed as cheaply as SUM. Outputs rounded "
    "(corr@6, slope@4, intercept@2) so partial-merge accumulation-order "
    "float noise cannot flip the cross-engine hash while every rounded "
    "digit is still load-bearing.",
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("q"),
        F.col("l_extendedprice").cast("double").alias("p"),
    )
    # corr is the ONE two-column builtin with no zero-variance guard in
    # ANSI Spark: a constant series (stuck sensor, single-SKU day) makes
    # it RAISE DIVIDE_BY_ZERO where DuckDB yields NULL (round-9
    # constant-series sweep receipt; regr_slope/regr_intercept carry
    # internal guards and already mirror DuckDB: 0.0/intercept on a
    # constant y, NULL on a constant x). Same co-moment accumulators,
    # composed with try_divide: NULL on every degenerate shape, equal to
    # the builtin at round(6) elsewhere.
    corr = F.try_divide(
        F.covar_samp("q", "p"), F.stddev_samp("q") * F.stddev_samp("p")
    )
    return li.groupBy("l_returnflag").agg(
        F.round(corr, 6).cast("double").alias("corr_qty_price"),
        F.round(F.regr_slope("p", "q"), 4).cast("double").alias("slope_price_on_qty"),
        F.round(F.regr_intercept("p", "q"), 2)
        .cast("double")
        .alias("intercept_price_on_qty"),
        F.regr_count("p", "q").cast("bigint").alias("n_pairs"),
    )


@register(
    "agg_bool_family",
    oracle="""
SELECT l_returnflag,
       COUNT(*) FILTER (l_quantity > 45) AS n_large,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_deep_discount,
       bool_and(l_extendedprice >= 900) AS all_pricey
FROM lineitem GROUP BY l_returnflag
""",
    doc="boolean aggregate family (count_if, every/bool_and, "
    "any/bool_or): predicate rollups — the assertion layer of data "
    "quality monitors (\"all rows positive\", \"any outlier present\") "
    "as single-pass partial-mergeable aggregates.",
)
def agg_bool_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 45).alias("n_large"),
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.every(F.col("l_extendedprice") >= 900).alias("all_pricey"),
    )


@register(
    "agg_approx_top_k",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_exact, TRUE AS topk_ok
FROM orders GROUP BY o_orderpriority
""",
    doc="approximate heavy hitters (approx_top_k, Spark 4): single-pass "
    "mergeable top-k item/count sketch — the scale substitute for a full "
    "GROUP BY + ORDER BY when only the head of the distribution matters "
    "(trending tokens, hot keys, top URLs over 100 TB without "
    "materializing the tail). Oracle-able formulation: sketch internals "
    "are engine-specific, so the query emits each item's exact count "
    "plus a boolean asserting the sketch found the item with the exact "
    "count (k=16 exceeds the 5-value priority domain, so the sketch "
    "admits no collision error here); the oracle computes the exact "
    "counts and literal TRUE.",
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    o.createOrReplaceTempView("__atk_orders")
    sketch = spark.sql(
        "SELECT approx_top_k(o_orderpriority, 16) AS tk FROM __atk_orders"
    ).select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("o_orderpriority"),
        F.col("e.count").alias("__est"),
    )
    exact = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_exact"))
    return exact.join(sketch, "o_orderpriority", "left").select(
        "o_orderpriority",
        "n_exact",
        # the NULL item is vacuously ok: approx_top_k skips NULLs by
        # aggregate-function contract (same as COUNT(DISTINCT)), so the
        # sketch CANNOT hold an entry for the NULL pseudo-group the
        # exact GROUP BY reports (round-9 all-NULL sweep)
        F.when(F.col("o_orderpriority").isNull(), F.lit(True))
        .otherwise(
            F.coalesce(F.col("__est"), F.lit(-1)) == F.col("n_exact")
        )
        .alias("topk_ok"),
    )


@register(
    "agg_listagg_strings",
    oracle="""
SELECT n_name,
       string_agg(s_name, ',' ORDER BY s_name) AS suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
    doc="ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP, "
    "Spark 4): per-nation supplier roster concatenated in deterministic "
    "sort order — the ordered-concat shape reporting layers need. The "
    "WITHIN GROUP ordering is what makes the result hash-stable; a bare "
    "collect_list/concat would be partition-order-dependent.",
)
def agg_listagg_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    # bounded: nation dim — 25 rows at any TPC-H scale factor
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    j.createOrReplaceTempView("__la_sn")
    return spark.sql(
        """
        SELECT n_name,
               listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)
                 AS suppliers
        FROM __la_sn GROUP BY n_name
        """
    )


@register(
    "agg_histogram_equiwidth",
    oracle="""
SELECT CAST(LEAST(FLOOR(o_totalprice / 50000), 11) AS BIGINT) AS bin,
       CAST(LEAST(FLOOR(o_totalprice / 50000), 11) AS BIGINT) * 50000
         AS bin_lo,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2
""",
    doc="equi-width histogram (12 fixed 50k bins over order value, top "
    "bin clamped open-ended): integer floor arithmetic on both engines, "
    "map-side combinable — one scan + one tiny-key shuffle at any "
    "scale. Fixed literal bin edges keep the result engine-exact; "
    "data-driven edges would need a (bounded, 2-value) min/max "
    "broadcast first.",
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    bin_ = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(11)).cast(
        "long"
    )
    return (
        o.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bin", (F.col("bin") * 50000).alias("bin_lo"), "n")
    )


@register(
    "stats_zscore_outliers",
    oracle="""
WITH sums AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(12,2))) AS sx,
         SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS sxx
  FROM events GROUP BY event_type
), stats AS (
  -- zero clamp under sqrt: constant series float-cancel to tiny
  -- negative population variance (DuckDB sqrt raises, Spark NaN —
  -- round-10 constant sweep); sd 0 then NULLs every z via /0
  SELECT event_type, mean_v,
         sqrt(CASE WHEN pvar < 0 THEN 0 ELSE pvar END) AS sd_v
  FROM (
    SELECT event_type,
           CAST(sx AS DOUBLE) / n AS mean_v,
           (CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n AS pvar
    FROM sums
  )
)
SELECT e.event_id, e.event_type, e.value,
       CAST(round((CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) - s.mean_v) / s.sd_v, 6)
            AS DOUBLE) AS z_r
FROM events e JOIN stats s USING (event_type)
WHERE abs((CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) - s.mean_v) / s.sd_v) > 2.5
""",
    doc="z-score anomaly detection: per-series population mean/stddev "
    "from EXACT decimal power sums (order-insensitive partial "
    "aggregation — the only way both engines' reduction orders can "
    "yield bit-identical moments), broadcast back onto the stream, "
    "flag |z| > 2.5. Two scans fused by Catalyst into one shuffle-light "
    "plan: the per-type stats table is series-cardinality-sized and "
    "broadcast, so the fact side never shuffles — at 100 TB this is a "
    "map-only scoring pass after one partial-agg exchange. The "
    "selection predicate compares bit-identical doubles, so the outlier "
    "SET is exact; round(6) guards only the reported z.",
)
def stats_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = F.col("value").cast(_DEC)
    sums = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sx"),
        F.sum(v * v).alias("sxx"),
    )
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    n = F.col("n")
    # zero clamp under sqrt (round-10 constant sweep — see the oracle's
    # twin comment); CASE keeps an all-NULL group's NULL variance NULL
    pvar = (sxx - sx * sx / n) / n
    stats = sums.select(
        "event_type",
        (sx / n).alias("mean_v"),
        F.sqrt(F.when(pvar < 0, F.lit(0.0)).otherwise(pvar)).alias("sd_v"),
    )
    # try_divide: a singleton series has sd 0; DuckDB yields NULL and the
    # |z| predicate drops the row — ANSI Spark must not crash instead
    z = F.try_divide(v.cast("double") - F.col("mean_v"), F.col("sd_v"))
    return (
        # bounded: per-event-type moment aggregates — one row per event type
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).cast("double").alias("z_r"),
        )
    )


@register(
    "agg_histogram_equidepth",
    oracle="""
WITH binned AS (
  SELECT l_extendedprice,
         ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS bin
  FROM lineitem
)
SELECT bin, COUNT(*) AS n,
       MIN(l_extendedprice) AS bin_lo,
       MAX(l_extendedprice) AS bin_hi
FROM binned GROUP BY bin
""",
    doc="equi-depth (equi-height) histogram via ntile(10): the "
    "quantile-binned companion to agg_histogram_equiwidth, the shape "
    "optimizers and data-profiling pipelines store as column stats. "
    "Deterministic through a total order ((price, orderkey, "
    "linenumber) tiebreak) so both engines cut identical bins; bounds "
    "are raw column values (comparisons, no arithmetic). The fixture-"
    "scale plan is a global-sort window; at 100 TB the same result "
    "shape comes from approx_percentile cut points + a map-side "
    "bucketizer — documented in SCALING.md, with this exact variant as "
    "the correctness oracle for that rewrite.",
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        li.select("l_extendedprice", F.ntile(10).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("bin_lo"),
            F.max("l_extendedprice").alias("bin_hi"),
        )
    )


@register(
    "stats_mad_outliers",
    oracle="""
WITH v AS (
  SELECT event_id, event_type, value,
         CAST(value AS DECIMAL(12,2)) AS vd,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(value AS DECIMAL(12,2)), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
), med AS (
  SELECT event_type, vd AS med FROM v WHERE rn = (n + 1) // 2
), dev AS (
  SELECT v.event_id, v.event_type, v.value, v.vd, m.med,
         abs(v.vd - m.med) AS ad,
         ROW_NUMBER() OVER (PARTITION BY v.event_type
                            ORDER BY abs(v.vd - m.med), v.event_id) AS rn2,
         COUNT(*) OVER (PARTITION BY v.event_type) AS n2
  FROM v JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, ad AS mad FROM dev WHERE rn2 = (n2 + 1) // 2
)
SELECT d.event_id, d.event_type, d.value,
       CAST(d.med AS DOUBLE) AS med, CAST(md.mad AS DOUBLE) AS mad
FROM dev d JOIN mad md USING (event_type)
WHERE d.ad > 3 * md.mad
""",
    doc="robust outlier detection via median absolute deviation: flag "
    "rows with |v - median| > 3 * MAD per series — the estimator that "
    "survives the very outliers it hunts (z-scores inflate their own "
    "stddev). Medians are the PINNED discrete convention from "
    "agg_kll_quantile_merge: the ((n+1) div 2)-th element under a "
    "(value, event_id) total order, picked identically by both engines "
    "via ROW_NUMBER — engine quantile builtins disagree on even-count "
    "rank conventions, and NULL measurements are dropped at the scan "
    "on both sides (they would shift every rank: Spark sorts NULLs "
    "first, DuckDB last; NULL-wave hostile sweep). All arithmetic is "
    "decimal-exact, so the outlier SET is bit-deterministic. Shape: two (series)-keyed sort windows "
    "reusing one Exchange + two broadcast joins of series-cardinality "
    "tables; the fact stream shuffles once.",
)
def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    vd = F.col("value").cast(_DEC)
    w_n = Window.partitionBy("event_type")
    w_rn = Window.partitionBy("event_type").orderBy(vd, "event_id")
    v = ev.select(
        "event_id", "event_type", "value", vd.alias("vd"),
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    med = v.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select("event_type", F.col("vd").alias("med"))
    # bounded: per-event-type medians — one row per event type
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("vd") - F.col("med"))
    )
    w_rn2 = Window.partitionBy("event_type").orderBy("ad", "event_id")
    dev = dev.withColumn("rn2", F.row_number().over(w_rn2)).withColumn(
        "n2", F.count(F.lit(1)).over(w_n)
    )
    mad = dev.filter(
        F.col("rn2") == F.expr("(n2 + 1) div 2")
    ).select("event_type", F.col("ad").alias("mad"))
    return (
        # bounded: per-event-type MAD — one row per event type
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("ad") > F.lit(3) * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.col("med").cast("double").alias("med"),
            F.col("mad").cast("double").alias("mad"),
        )
    )


@register(
    "stats_chi2_independence",
    oracle="""
WITH cells AS (
  SELECT event_type,
         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS INTEGER)
           AS hod,
         COUNT(*) AS o
  FROM events GROUP BY 1, 2
), margins AS (
  SELECT c.event_type, c.hod, c.o,
         SUM(c.o) OVER (PARTITION BY c.event_type) AS r,
         SUM(c.o) OVER (PARTITION BY c.hod) AS col_t,
         SUM(c.o) OVER () AS n
  FROM cells c
), terms AS (
  SELECT CAST(round(
           CAST((o * n - r * col_t) AS DOUBLE)
           * (o * n - r * col_t) / (r * col_t * n) * 1000000
         ) AS BIGINT) AS term_micro,
         n
  FROM margins
)
SELECT CAST(round(SUM(term_micro) / 1000000.0, 4) AS DOUBLE) AS chi2,
       CAST((SELECT (COUNT(DISTINCT event_type) - 1)
                    * (COUNT(DISTINCT CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS INTEGER)) - 1)
             FROM events) AS BIGINT) AS dof,
       CAST(MAX(n) AS BIGINT) AS n
FROM terms
""",
    doc="chi-square test of independence (event type x hour-of-day "
    "contingency table): the classic data-profiling dependence probe. "
    "Observed/expected arithmetic is kept in EXACT integers "
    "((O*N - R*C)^2 / (R*C*N), no expected-count division), each "
    "cell's statistic is quantized to integer micro-units before the "
    "cross-cell sum — the pinned-quantization convention again — so "
    "accumulation order cannot drift the hash. Shape: one (type, hod) "
    "aggregation (cells = types x 24), margins via windows over that "
    "tiny table, one scalar reduce.",
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hod = (
        (F.floor(F.unix_timestamp("ts")).cast("long") / F.lit(3600)).cast("long") % 24
    ).cast("int")
    cells = (
        ev.select("event_type", hod.alias("hod"))
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    w_r = Window.partitionBy("event_type")
    w_c = Window.partitionBy("hod")
    w_n = Window.partitionBy()
    margins = cells.select(
        "o",
        F.sum("o").over(w_r).alias("r"),
        F.sum("o").over(w_c).alias("col_t"),
        F.sum("o").over(w_n).alias("n"),
    )
    diff = F.col("o") * F.col("n") - F.col("r") * F.col("col_t")
    term = F.round(
        diff.cast("double") * diff / (F.col("r") * F.col("col_t") * F.col("n"))
        * 1000000
    ).cast("bigint")
    dims = cells.agg(
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("hod") - 1)
        ).cast("bigint").alias("dof")
    )
    return (
        margins.select(term.alias("term_micro"), "n")
        .agg(
            F.round(F.sum("term_micro") / 1000000.0, 4)
            .cast("double")
            .alias("chi2"),
            F.max("n").cast("bigint").alias("n"),
        )
        # bounded: dims is a 1-row aggregate (contingency-table dimensions)
        .crossJoin(F.broadcast(dims))
        .select("chi2", "dof", "n")
    )


@register(
    "stats_ks_drift",
    oracle="""
WITH vals AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_b
  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL
), per_value AS (
  SELECT v, SUM(is_a) AS a_cnt, SUM(is_b) AS b_cnt
  FROM vals GROUP BY v
), tot AS (
  SELECT SUM(a_cnt) AS na, SUM(b_cnt) AS nb FROM per_value
), cdf AS (
  SELECT SUM(a_cnt) OVER (ORDER BY v) AS ca,
         SUM(b_cnt) OVER (ORDER BY v) AS cb
  FROM per_value
)
SELECT CAST(MAX(abs(ca * t.nb - cb * t.na)) AS BIGINT) AS d_scaled,
       CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
       CAST(round(CAST(MAX(abs(ca * t.nb - cb * t.na)) AS DOUBLE)
                  / (t.na * t.nb), 6) AS DOUBLE) AS d_stat
FROM cdf CROSS JOIN tot t GROUP BY t.na, t.nb
""",
    doc="two-sample Kolmogorov-Smirnov drift statistic between the "
    "'click' and 'view' value distributions: D = max |F_a - F_b| — the "
    "standard training-data drift detector run between corpus "
    "snapshots. Computed SCALE-FREE of division: the running CDFs stay "
    "integer counts and the max is over |ca*nb - cb*na| (exact BIGINT), "
    "so the argmax and d_scaled are bit-deterministic; the single "
    "normalizing division happens once on the final row. Shape: one "
    "value-grid aggregation (cardinality = distinct values, far below "
    "rows; pre-bucket values to a fixed grid at 100 TB), one ordered "
    "window over that grid, one scalar reduce.",
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL measurements are dropped at the scan on both sides: a NULL
    # value grid-cell would take the two engines' cumulative sums
    # through different orders (NULL-wave hostile sweep)
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("click", "view")
        & F.col("value").isNotNull()
    )
    vals = ev.select(
        (F.col("value").cast(_DEC) * 100).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_b"),
    )
    per_value = vals.groupBy("v").agg(
        F.sum("is_a").alias("a_cnt"), F.sum("is_b").alias("b_cnt")
    )
    tot = per_value.agg(
        F.sum("a_cnt").alias("na"), F.sum("b_cnt").alias("nb")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = per_value.select(
        F.sum("a_cnt").over(w).alias("ca"),
        F.sum("b_cnt").over(w).alias("cb"),
    )
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    return (
        # bounded: tot is a 1-row aggregate (per-sample totals na, nb)
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(F.max(gap).cast("bigint").alias("d_scaled"))
        .select(
            "d_scaled",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.round(
                F.col("d_scaled").cast("double") / (F.col("na") * F.col("nb")), 6
            ).cast("double").alias("d_stat"),
        )
    )


@register(
    "stats_ab_proportion_z",
    oracle="""
WITH users AS (
  SELECT user_id,
         CAST(user_id % 2 AS INTEGER) AS arm,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
), arms AS (
  SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
  FROM users GROUP BY arm
), wide AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 0 THEN conv END) AS c0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 1 THEN conv END) AS c1
  FROM arms
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(c0 AS BIGINT) AS c0,
       CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
       CAST(round(CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1, 6) + 0
            AS DOUBLE) AS rate_diff,
       CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
            ELSE CAST(round(
              (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
              / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                     * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                     * (1.0 / n0 + 1.0 / n1)),
              6) + 0 AS DOUBLE) END AS z_stat
FROM wide
""",
    doc="two-proportion z-test (A/B experiment readout): users split "
    "into arms by id parity, conversion = 14+ purchases, pooled-"
    "variance z statistic — the experimentation primitive run over "
    "exported event streams. Counts are exact integers from one "
    "user-keyed aggregation + one arm rollup; every float expression "
    "runs on bit-identical inputs, round(6)-guarded. Deterministic "
    "arm assignment (id parity, not RNG) keeps the readout "
    "reproducible across engines and reruns.",
)
def stats_ab_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    users = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("arm"), "converted"
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    n0 = F.col("n0")
    c0 = F.col("c0")
    n1 = F.col("n1")
    c1 = F.col("c1")
    p0 = c0.cast("double") / n0
    p1 = c1.cast("double") / n1
    pp = (c0 + c1).cast("double") / (n0 + n1)
    z = F.when(
        ((c0 + c1) == 0) | ((c0 + c1) == (n0 + n1)), F.lit(None)
    ).otherwise(
        (p0 - p1)
        / F.sqrt(pp * (1 - pp) * (F.lit(1.0) / n0 + F.lit(1.0) / n1))
    )
    return wide.select(
        n0.cast("bigint").alias("n0"),
        c0.cast("bigint").alias("c0"),
        n1.cast("bigint").alias("n1"),
        c1.cast("bigint").alias("c1"),
        F.round(p0 - p1, 6).cast("double").alias("rate_diff"),
        F.round(z, 6).cast("double").alias("z_stat"),
    )


@register(
    "agg_skew_kurtosis",
    oracle="""
WITH typed AS (
  -- v2 is DECIMAL(19,4) here vs Spark's (18,4): DuckDB's 18-digit
  -- decimals are int64-backed and its multiply rescales in-width
  -- (runtime overflow at fixture magnitudes), while 19 digits forces
  -- hugeint arithmetic; Spark conversely must stay at 18 so the
  -- product's bound width 18+18+1 <= 38 avoids the silent scale-6
  -- re-type. Same exact VALUES either way — only the declared widths
  -- differ, and the moments compare as doubles.
  SELECT event_type,
         CAST(value AS DECIMAL(9,2)) AS v,
         CAST(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))
              AS DECIMAL(19,4)) AS v2
  FROM events
), sums AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(v) AS s1,
         SUM(v2) AS s2,
         SUM(CAST(v2 * v AS DECIMAL(28,6))) AS s3,
         SUM(CAST(v2 * v2 AS DECIMAL(37,8))) AS s4
  FROM typed GROUP BY event_type
), mom AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS m1,
         CAST(s2 AS DOUBLE) / n AS m2r,
         CAST(s3 AS DOUBLE) / n AS m3r,
         CAST(s4 AS DOUBLE) / n AS m4r
  FROM sums
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(round((m3r - 3 * m1 * m2r + 2 * m1 * m1 * m1)
                  / pow(m2r - m1 * m1, 1.5), 6) + 0 AS DOUBLE) AS skewness,
       CAST(round((m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * m1 * m1 * m1 * m1)
                  / ((m2r - m1 * m1) * (m2r - m1 * m1)) - 3, 6) + 0 AS DOUBLE)
         AS excess_kurtosis
FROM mom
""",
    doc="skewness and excess kurtosis per series from EXACT decimal "
    "power sums through the 4th moment — extends the decimal-moments "
    "discipline (agg_stats_moments) to the shape statistics "
    "distribution-drift monitors track. Raw moments are partial-"
    "mergeable (one shuffle to series cardinality); the central-moment "
    "expansion runs on bit-identical doubles on both engines, "
    "round(6)-guarded. Built-in skewness()/kurtosis() are double "
    "accumulators — order-dependent and engine-divergent — so this is "
    "also the only hash-stable formulation. Precisions sized so the "
    "4th-power product stays under Spark's 38-digit cap (round-9 "
    "day-one receipt: an overflowing multiply silently re-types to "
    "scale 6, and the rounded s4 makes zero-variance singletons emit "
    "engine-DIFFERENT garbage).",
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # precision budget (round-9 day-one receipt): with v at decimal(10,2)
    # the 4th-power product v2*v2 was decimal(41,8) — past Spark's
    # 38-digit cap, so the multiply SILENTLY re-typed to decimal(38,6),
    # rounding s4 at scale 6 (1840.62450625 -> 1840.624506 for v=6.55)
    # while DuckDB's explicit cast kept all 8 decimals. On real series
    # the final round(6) hides the 2.5e-7 error; a zero-variance
    # singleton divides it by var^2 ~ 5e-29 and the engines emit
    # DIFFERENT garbage. decimal(9,2) (7 integer digits — the value
    # domain tops out at 1e5 even laced) keeps every product exact:
    # v2 (18,4), v3 (28,6), v4 (37,8) all within 38 digits, so both
    # engines cast identical exact decimals to identical doubles.
    v = F.col("value").cast("decimal(9,2)")
    v2 = (v * v).cast("decimal(18,4)")
    typed = ev.select("event_type", v.alias("v"), v2.alias("v2"))
    sums = typed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum("v2").alias("s2"),
        F.sum((F.col("v2") * F.col("v")).cast("decimal(28,6)")).alias("s3"),
        F.sum((F.col("v2") * F.col("v2")).cast("decimal(37,8)")).alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    m2r = F.col("s2").cast("double") / n
    m3r = F.col("s3").cast("double") / n
    m4r = F.col("s4").cast("double") / n
    var = m2r - m1 * m1
    # try_divide: a singleton or constant series has zero variance; ANSI
    # Spark raises where DuckDB yields NULL (round-6 hostile sweep)
    skew = F.try_divide(
        m3r - 3 * m1 * m2r + 2 * m1 * m1 * m1, F.pow(var, 1.5)
    )
    kurt = F.try_divide(
        m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * m1 * m1 * m1 * m1,
        var * var,
    ) - 3
    return sums.select(
        "event_type",
        n.cast("bigint").alias("n"),
        F.round(skew, 6).cast("double").alias("skewness"),
        F.round(kurt, 6).cast("double").alias("excess_kurtosis"),
    )


@register(
    "stats_gini_concentration",
    oracle="""
WITH vals AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         event_id
  FROM events WHERE value >= 0
), ranked AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, event_id)
           AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(x) OVER (PARTITION BY event_type) AS sx
  FROM vals
), agg AS (
  SELECT event_type, MAX(n) AS n, MAX(sx) AS sx,
         SUM(i * x) AS sixr
  FROM ranked GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(round(CAST(2 * sixr AS DOUBLE) / (n * CAST(sx AS DOUBLE))
                  - CAST(n + 1 AS DOUBLE) / n, 6) AS DOUBLE) AS gini
FROM agg
""",
    doc="Gini concentration coefficient per series (rank-weighted "
    "formula G = 2*sum(i*x_(i))/(n*sum(x)) - (n+1)/n): the inequality "
    "metric data curators use to spot source/user dominance before it "
    "skews a training mix. Values scale to exact integer cents, the "
    "rank weighting is a (series)-keyed sort window with a total-order "
    "tiebreak, and every sum is exact integer — only the final two "
    "divisions are float, on bit-identical inputs. One shuffle.",
)
def stats_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("value") >= 0)
    vals = ev.select(
        "event_type",
        (F.col("value").cast(_DEC) * 100).cast("bigint").alias("x"),
        "event_id",
    )
    w_rank = Window.partitionBy("event_type").orderBy("x", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = vals.select(
        "event_type",
        "x",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("sx"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("sx").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("sixr"),
    )
    n = F.col("n")
    # try_divide: a constant-ZERO series (a frozen sensor emitting 0.0 —
    # the combined-adversity fixture's 'frozen' class) passes the
    # value >= 0 filter with sx = 0; Gini over zero mass is undefined —
    # NULL on both engines (DuckDB's /0 is NULL; ANSI `/` would crash)
    gini = F.try_divide(
        (2 * F.col("sixr")).cast("double"), n * F.col("sx").cast("double")
    ) - (n + 1).cast("double") / n
    return agg.select(
        "event_type",
        n.cast("bigint").alias("n"),
        F.round(gini, 6).cast("double").alias("gini"),
    )


@register(
    "stats_welch_ttest",
    oracle="""
WITH g AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(12,2))) AS sx,
         SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS sxx
  FROM events WHERE event_type IN ('click', 'error') GROUP BY event_type
), m AS (
  SELECT event_type, n,
         CAST(sx AS DOUBLE) / n AS mean_v,
         (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
           / (n - 1) AS var_v
  FROM g
), p AS (
  SELECT
    (SELECT n FROM m WHERE event_type = 'click') AS n_a,
    (SELECT n FROM m WHERE event_type = 'error') AS n_b,
    (SELECT mean_v FROM m WHERE event_type = 'click') AS ma,
    (SELECT mean_v FROM m WHERE event_type = 'error') AS mb,
    (SELECT var_v FROM m WHERE event_type = 'click') AS va,
    (SELECT var_v FROM m WHERE event_type = 'error') AS vb
)
SELECT n_a, n_b,
       -- zero clamp under sqrt: constant arms float-cancel to tiny
       -- negative variances (round-10 constant sweep); the clamped 0
       -- then NULLs t via /0 on both engines
       CAST(round((ma - mb)
         / sqrt(CASE WHEN va / n_a + vb / n_b < 0 THEN 0
                     ELSE va / n_a + vb / n_b END), 6) + 0 AS DOUBLE) AS t_r,
       CAST(round(
         (va / n_a + vb / n_b) * (va / n_a + vb / n_b)
           / ((va / n_a) * (va / n_a) / (n_a - 1)
              + (vb / n_b) * (vb / n_b) / (n_b - 1)), 3) AS DOUBLE) AS df_r
FROM p
""",
    doc="Welch two-sample t-test (unequal variances) between two event "
    "series: sample means/variances from EXACT decimal power sums (the "
    "order-insensitive reduction both engines agree on bit-for-bit), "
    "then the t statistic and Welch-Satterthwaite degrees of freedom in "
    "double with identical operand order on both sides. Scale shape: "
    "one partial-agg exchange over a 2-row group key; everything after "
    "the agg is constant-size driver-free arithmetic — at 100 TB this "
    "is a single map-side-combined scan.",
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).where(
        F.col("event_type").isin("click", "error")
    )
    v = F.col("value").cast(_DEC)
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(v).alias("sx"), F.sum(v * v).alias("sxx")
    )
    m = g.select(
        "event_type",
        "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mean_v"),
        # try_divide: a day-one n=1 group makes the sample variance
        # undefined (divisor n-1 = 0) — DuckDB's / yields NULL there,
        # ANSI Spark crashes (round-8 single-row sweep)
        F.try_divide(
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n")
            ),
            F.col("n") - 1,
        ).alias("var_v"),
    )
    a = F.col("event_type") == "click"
    p = m.agg(
        F.max(F.when(a, F.col("n"))).alias("n_a"),
        F.max(F.when(~a, F.col("n"))).alias("n_b"),
        F.max(F.when(a, F.col("mean_v"))).alias("ma"),
        F.max(F.when(~a, F.col("mean_v"))).alias("mb"),
        F.max(F.when(a, F.col("var_v"))).alias("va"),
        F.max(F.when(~a, F.col("var_v"))).alias("vb"),
    )
    se2 = F.col("va") / F.col("n_a") + F.col("vb") / F.col("n_b")
    # try_divide on t and df: two constant series make se2 = 0 (and the
    # Welch-Satterthwaite denominator 0) with non-NULL numerators —
    # DuckDB / yields NULL, ANSI Spark crashes. The inner /(n-1) terms
    # stay plain: a non-NULL variance implies n >= 2. The zero clamp
    # under the sqrt guards the float-cancelled tiny-NEGATIVE se2
    # (round-10 constant sweep: DuckDB sqrt raises, Spark NaN); CASE
    # keeps a missing arm's NULL se2 NULL.
    se2_0 = F.when(se2 < 0, F.lit(0.0)).otherwise(se2)
    t = F.try_divide(F.col("ma") - F.col("mb"), F.sqrt(se2_0))
    df = F.try_divide(
        se2 * se2,
        (F.col("va") / F.col("n_a")) * (F.col("va") / F.col("n_a"))
        / (F.col("n_a") - 1)
        + (F.col("vb") / F.col("n_b")) * (F.col("vb") / F.col("n_b"))
        / (F.col("n_b") - 1),
    )
    return p.select(
        "n_a",
        "n_b",
        F.round(t, 6).cast("double").alias("t_r"),
        F.round(df, 3).cast("double").alias("df_r"),
    )


@register(
    "stats_mann_whitney_u",
    oracle="""
WITH s AS (
  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE event_type IN ('view', 'purchase')
    AND value IS NOT NULL
), r AS (
  SELECT event_type, v,
         RANK() OVER (ORDER BY v) AS rmin,
         COUNT(*) OVER (PARTITION BY v) AS c
  FROM s
), agg AS (
  SELECT
    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_a,
    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_b,
    SUM(CASE WHEN event_type = 'view' THEN 2 * rmin + (c - 1) ELSE 0 END) AS r2_a
  FROM r
), ties AS (
  SELECT SUM(c * c * c - c) AS tie_term
  FROM (SELECT v, COUNT(*) AS c FROM s GROUP BY v)
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       -- zero clamp under sqrt: an ALL-TIED corpus (constant series on
       -- both arms) drives the tie-corrected variance to exactly 0 (or
       -- float-cancels it tiny-negative) — sqrt must not raise, and the
       -- /0 then NULLs z on both engines (round-10 constant sweep). The
       -- tie ratio's own /0 (n_a + n_b = 1) NULL-propagates here and
       -- ANSI-guards on the Spark side.
       CAST(round(
         (CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2
            - CAST(n_a AS DOUBLE) * n_b / 2)
           / sqrt(CASE WHEN mw_var < 0 THEN 0 ELSE mw_var END), 6) + 0
         AS DOUBLE) AS z_r
FROM (
  SELECT n_a, n_b, r2_a,
         CAST(n_a AS DOUBLE) * n_b / 12
           * ((n_a + n_b + 1)
              - CAST(tie_term AS DOUBLE)
                / ((n_a + n_b) * (n_a + n_b - 1))) AS mw_var
  FROM agg, ties
)
""",
    doc="Mann-Whitney U rank-sum test between two event series with the "
    "EXACT tie correction: average ranks come from min-rank + tie-count "
    "(2*rank + c - 1 keeps the half-integers in integer space), the "
    "tie term sums c^3 - c over the per-value histogram, and only the "
    "final z is computed in double (identical operand order both "
    "sides). Scale shape: Spark side NEVER sorts the raw rows — it "
    "folds to the per-value histogram first (one shuffle on value), "
    "then runs the cumulative min-rank window over that "
    "distinct-values-sized table; the oracle deliberately uses the "
    "naive all-rows RANK formulation, so a histogram-vs-rank "
    "disagreement would hash-mismatch.",
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL measurements dropped at the scan on both sides — a NULL
    # would enter the rank at engine-dependent positions (NULL-wave)
    ev = load_table(spark, "events", sf_dir).where(
        F.col("event_type").isin("view", "purchase")
        & F.col("value").isNotNull()
    )
    s = ev.select("event_type", F.col("value").cast(_DEC).alias("v"))
    is_a = F.col("event_type") == "view"
    h = s.groupBy("v").agg(
        F.count("*").alias("c"),
        F.sum(F.when(is_a, 1).otherwise(0)).alias("ca"),
    )
    cum = F.sum("c").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    )
    r = h.select(
        "v",
        "c",
        "ca",
        (cum - F.col("c") + 1).alias("rmin"),
    )
    agg = r.agg(
        F.sum("ca").alias("n_a"),
        F.sum(F.col("c") - F.col("ca")).alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("rmin") + (F.col("c") - 1))
        ).alias("r2_a"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tie_term"),
    )
    j = agg
    n_a, n_b = F.col("n_a"), F.col("n_b")
    u2_a = F.col("r2_a") - n_a * (n_a + 1)
    n = n_a + n_b
    # try_divide on the tie ratio (a 1-row corpus has n(n-1) = 0) and on
    # z itself (an ALL-TIED corpus has exactly-zero variance); the CASE
    # clamp under the sqrt guards the float-cancelled tiny-negative
    # (round-10 constant sweep; DuckDB mirrors via /0-NULL + CASE)
    mw_var = (
        n_a.cast("double")
        * n_b
        / 12
        * (
            (n + 1)
            - F.try_divide(
                F.col("tie_term").cast("double"), (n * (n - 1)).cast("double")
            )
        )
    )
    z = F.try_divide(
        u2_a.cast("double") / 2 - n_a.cast("double") * n_b / 2,
        F.sqrt(F.when(mw_var < 0, F.lit(0.0)).otherwise(mw_var)),
    )
    return j.select(
        "n_a",
        "n_b",
        u2_a.alias("u2_a"),
        F.round(z, 6).cast("double").alias("z_r"),
    )


@register(
    "stats_benford_first_digit",
    oracle="""
WITH d AS (
  SELECT CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
              '[1-9]', 0) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
), c AS (
  SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit
), t AS (SELECT SUM(n_obs) AS n_total FROM c)
SELECT digit, n_obs,
       CAST(round(CAST(n_obs AS DOUBLE) / n_total, 6) AS DOUBLE) AS p_obs,
       CAST(round(log10(1 + CAST(1 AS DOUBLE) / digit), 6) AS DOUBLE) AS p_benford
FROM c, t
ORDER BY digit
""",
    doc="Benford's-law first-digit profile of order totals — the "
    "classic fraud/data-quality screen. The leading SIGNIFICANT digit "
    "is the first [1-9] char of the DECIMAL's canonical string form "
    "(identical regex on both engines; a plain first-char substr "
    "returns 0 for sub-unit values like 0.01 and then 1/digit "
    "divides by zero — round-6 hostile sweep), then observed shares "
    "vs log10(1+1/d) expectations. Scale shape: map-side digit "
    "projection + a 9-group aggregate with the 1-row total broadcast "
    "back — a single-scan, constant-output profile at any corpus size.",
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).where(F.col("o_totalprice") > 0)
    digit = F.regexp_extract(
        F.col("o_totalprice").cast(_DEC).cast("string"), "[1-9]", 0
    ).cast("bigint")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n_obs")
    )
    t = c.agg(F.sum("n_obs").alias("n_total"))
    return (
        # bounded: t is a 1-row total-count aggregate
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n_total"), 6)
            .cast("double")
            .alias("p_obs"),
            F.round(F.log10(1 + F.lit(1.0) / F.col("digit")), 6)
            .cast("double")
            .alias("p_benford"),
        )
        .orderBy("digit")
    )


@register(
    "stats_winsorize",
    oracle="""
WITH s AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE value IS NOT NULL
), h AS (
  SELECT event_type, v, COUNT(*) AS c FROM s GROUP BY event_type, v
), w AS (
  SELECT event_type, v,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
), q AS (
  SELECT event_type,
         MIN(CASE WHEN cum >= floor(0.05 * (n - 1)) + 1 THEN v END) AS p05,
         MIN(CASE WHEN cum >= floor(0.95 * (n - 1)) + 1 THEN v END) AS p95
  FROM w GROUP BY event_type
)
SELECT s.event_id, s.event_type,
       CAST(s.v AS DOUBLE) AS value_r,
       CAST(least(greatest(s.v, q.p05), q.p95) AS DOUBLE) AS winsorized_r,
       CAST(s.v <> least(greatest(s.v, q.p05), q.p95) AS BOOLEAN) AS clipped
FROM s JOIN q USING (event_type)
""",
    doc="per-series winsorization at the exact discrete p05/p95 — the "
    "outlier-clipping step in front of fragile downstream estimators. "
    "The quantile is PINNED to one convention on both engines (0-based "
    "index floor(q*(n-1)) into the sorted multiset, realized as the "
    "least value whose cumulative count reaches the index — the "
    "ROW_NUMBER-style middle-element pick the round-4 advice "
    "prescribed for discrete quantiles, so no engine quantile-rank "
    "convention is trusted). Scale shape: the sort runs over the "
    "per-(series, value) HISTOGRAM, not the raw rows; the 5-row "
    "quantile table broadcasts back onto the stream for a map-only "
    "clip pass.",
)
def stats_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL measurements dropped at the scan on both sides (NULL-wave):
    # a NULL histogram cell would sort engine-dependently and a NULL
    # clip comparison yields NULL 'clipped' where DuckDB keeps rows
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    s = ev.select(
        "event_id", "event_type", F.col("value").cast(_DEC).alias("v")
    )
    h = s.groupBy("event_type", "v").agg(F.count("*").alias("c"))
    wcum = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    w = h.select(
        "event_type",
        "v",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    q = w.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("cum") >= F.floor(0.05 * (F.col("n") - 1)) + 1, F.col("v")
            )
        ).alias("p05"),
        F.min(
            F.when(
                F.col("cum") >= F.floor(0.95 * (F.col("n") - 1)) + 1, F.col("v")
            )
        ).alias("p95"),
    )
    clip = F.least(F.greatest(F.col("v"), F.col("p05")), F.col("p95"))
    # bounded: per-event-type quantile rows — one row per event type
    return s.join(F.broadcast(q), "event_type").select(
        "event_id",
        "event_type",
        F.col("v").cast("double").alias("value_r"),
        clip.cast("double").alias("winsorized_r"),
        (F.col("v") != clip).alias("clipped"),
    )


_BOOT_B = 50  # bootstrap resamples

# Bootstrap draws need a NON-LINEAR engine-portable hash, not a bare LCG:
# two multiplicative LCG rounds compose to an AFFINE map mod 2^32, so
# draws indexed by (b, j) form a lattice — each resample degenerates
# toward a permutation of the data and the CI collapses ~4x too narrow
# (measured: sd(mean_b) 0.76 vs the theoretical sigma/sqrt(n) of 3.0).
# The xorshift-multiply finalizer below (Wang/lowbias-style 32-bit hash,
# multiplier 0x45d9f3b) breaks the affinity while staying 64-bit-safe in
# BOTH engines: every intermediate is < 2^32 * 0x45d9f3b ~ 3.1e17 << 2^63.
# With it, both bootstrap variants empirically match sigma/sqrt(n).
_MIX_C = 73244475  # 0x45d9f3b


def _mix32_sql(col: str, out: str) -> str:
    """DuckDB SQL fragment: nested selects computing out = mix32(col)."""
    return f"""
         (xor(h2 >> 16, h2)) AS {out}
  FROM (
    SELECT * EXCLUDE (h1), ((xor(h1 >> 16, h1) * {_MIX_C}) % 4294967296) AS h2
    FROM (
      SELECT *, ((xor({col} >> 16, {col}) * {_MIX_C}) % 4294967296) AS h1
      FROM mix_in
    )
  )"""


def _mix32_col(h):
    """Spark Column: the same 32-bit xorshift-multiply finalizer."""
    m32 = F.lit(4294967296).cast("long")
    h = (F.shiftright(h, 16).bitwiseXOR(h) * _MIX_C) % m32
    h = (F.shiftright(h, 16).bitwiseXOR(h) * _MIX_C) % m32
    return F.shiftright(h, 16).bitwiseXOR(h)


@register(
    "stats_bootstrap_ci",
    oracle=f"""
WITH s AS (
  SELECT event_type, event_id, CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE value IS NOT NULL
), idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) - 1 AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM s
), grp AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n FROM idx GROUP BY event_type
), mix_in AS (
  SELECT g.event_type, g.n, b.b AS b, j.j AS j,
         (b.b * 2654435761 + j.j * 40503 + 986419) % 4294967296 AS u0
  FROM grp g,
       unnest(range(1, {_BOOT_B} + 1)) AS b(b),
       LATERAL (SELECT unnest(range(0, g.n)) AS j) AS j
), draws AS (
  SELECT event_type, n, b, j, u % n AS r
  FROM (SELECT * EXCLUDE (u0),{_mix32_sql("u0", "u")})
), means AS (
  SELECT d.event_type, d.b,
         CAST(SUM(i.v) AS DOUBLE) / MAX(d.n) AS mean_b
  FROM draws d JOIN idx i ON d.event_type = i.event_type AND d.r = i.i
  GROUP BY d.event_type, d.b
), ranked AS (
  SELECT event_type, mean_b,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY mean_b, b) AS rn
  FROM means
), ci AS (
  SELECT event_type,
         MAX(CASE WHEN rn = 1 + CAST(floor(0.025 * ({_BOOT_B} - 1)) AS BIGINT)
                  THEN mean_b END) AS lo,
         MAX(CASE WHEN rn = 1 + CAST(floor(0.975 * ({_BOOT_B} - 1)) AS BIGINT)
                  THEN mean_b END) AS hi
  FROM ranked GROUP BY event_type
), pt AS (
  SELECT event_type, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_v
  FROM s GROUP BY event_type
)
SELECT p.event_type, g.n,
       CAST(round(p.mean_v, 6) AS DOUBLE) AS mean_r,
       CAST(round(c.lo, 6) AS DOUBLE) AS ci_lo_r,
       CAST(round(c.hi, 6) AS DOUBLE) AS ci_hi_r
FROM pt p JOIN ci c USING (event_type) JOIN grp g USING (event_type)
""",
    doc="distributed bootstrap 95% CI for the per-series mean with "
    "ENGINE-INDEPENDENT resampling: draw j of resample b picks sorted "
    "index hash(b, j) mod n, where the hash is an affine seed mix fed "
    "through a 32-bit xorshift-multiply finalizer (0x45d9f3b twice) in "
    "pure 64-bit-safe integer arithmetic — NON-LINEAR on purpose: "
    "chained LCG rounds compose to an affine map whose draws form a "
    "lattice, degenerating each resample into a near-permutation and "
    "collapsing the CI ~4x too narrow (caught by comparing sd(mean_b) "
    "to sigma/sqrt(n)). Both engines draw bit-identical samples, so "
    "the whole Monte-Carlo procedure is hash-checkable (no RNG trust, "
    "no tolerance oracle). Resample means come from exact decimal "
    "sums; CI endpoints use the pinned floor(q*(B-1)) discrete "
    "quantile over the B means. Scale shape — SMALL-SCALE FAST PATH "
    "ONLY: the B*n draw table joins the rank-indexed values via an "
    "EXPLICIT O(n) BROADCAST of every (series, rank, value) row, "
    "which bypasses autoBroadcastJoinThreshold and OOMs executors "
    "once the series outgrow memory; it also needs a data-sized "
    "per-series rank sort. Both are deliberate here (the B*n draw "
    "side must never shuffle at fixture scale — measured >2x) but "
    "NEITHER survives 100x data. The production formulation is "
    "stats_bootstrap_poisson below: per-row Poisson resample weights "
    "in one scan, no index join, no rank sort, no broadcast; this "
    "exact-LCG variant is retained as its small-scale index-resample "
    "oracle twin (same oracle-for-the-rewrite pattern as "
    "equidepth_bucketize).",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = _BOOT_B
    # NULL measurements dropped at the scan on both sides: they would
    # shift every rank index the draws join on (NULL-wave hostile sweep)
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    s = ev.select(
        "event_type", "event_id", F.col("value").cast(_DEC).alias("v")
    )
    w_rank = Window.partitionBy("event_type").orderBy("v", "event_id")
    w_all = Window.partitionBy("event_type")
    idx = s.select(
        "event_type",
        "v",
        (F.row_number().over(w_rank) - 1).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    grp = idx.groupBy("event_type").agg(F.max("n").cast("long").alias("n"))
    draws = (
        grp.select(
            "event_type",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(B))).alias("b"),
        )
        .select(
            "event_type",
            "n",
            "b",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n") - 1)
            ).alias("j"),
        )
        .select(
            "event_type",
            "n",
            "b",
            (
                _mix32_col(
                    (
                        F.col("b") * F.lit(2654435761).cast("long")
                        + F.col("j") * 40503
                        + 986419
                    )
                    % F.lit(4294967296).cast("long")
                )
                % F.col("n")
            ).alias("r"),
        )
    )
    lookup = idx.select(
        F.col("event_type").alias("lk_type"),
        F.col("i").alias("lk_i"),
        "v",
    )
    means = (
        draws.join(
            # oracle-twin: data-sized index broadcast ON PURPOSE — fixture-scale exact-resampling twin; the registered 100 TB path is stats_bootstrap_poisson (one scan, per-row Poisson weights, no O(n) broadcast)
            F.broadcast(lookup),
            (draws["event_type"] == lookup["lk_type"])
            & (draws["r"] == lookup["lk_i"]),
        )
        .groupBy("event_type", "b")
        .agg((F.sum("v").cast("double") / F.max("n")).alias("mean_b"))
    )
    w_m = Window.partitionBy("event_type").orderBy("mean_b", "b")
    ranked = means.select(
        "event_type", "mean_b", F.row_number().over(w_m).alias("rn")
    )
    lo_rn = 1 + int(math.floor(0.025 * (B - 1)))
    hi_rn = 1 + int(math.floor(0.975 * (B - 1)))
    ci = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == lo_rn, F.col("mean_b"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("mean_b"))).alias("hi"),
    )
    pt = s.groupBy("event_type").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("mean_v")
    )
    return (
        pt.join(ci, "event_type")
        # bounded: per-event-type group stats — one row per event type
        .join(F.broadcast(grp), "event_type")
        .select(
            "event_type",
            "n",
            F.round("mean_v", 6).cast("double").alias("mean_r"),
            F.round("lo", 6).cast("double").alias("ci_lo_r"),
            F.round("hi", 6).cast("double").alias("ci_hi_r"),
        )
    )


# Poisson(1) CDF quantized to u32 thresholds: T_k = floor(CDF(k) * 2^32),
# pinned as literals so both engines draw IDENTICAL integer weights.
# w = first k with u < T_k (else 6; P(w>6) ~ 8e-5, the truncation is part
# of the pinned convention on both sides).
_POIS_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291)
_POIS_CASE_SQL = (
    "CASE"
    + "".join(f" WHEN u < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    + " ELSE 6 END"
)


@register(
    "stats_bootstrap_poisson",
    oracle=f"""
WITH s AS (
  SELECT event_type, event_id, CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE value IS NOT NULL
), mix_in AS (
  SELECT event_type, b.b AS b, v,
         ((event_id % 4294967296) * 40503 + b.b * 2654435761 + 986419)
           % 4294967296 AS u0
  FROM s, unnest(range(1, {_BOOT_B} + 1)) AS b(b)
), d AS (
  SELECT event_type, b, v,{_mix32_sql("u0", "u")}
), w AS (
  SELECT event_type, b, v, {_POIS_CASE_SQL} AS wgt FROM d
), means AS (
  SELECT event_type, b,
         CAST(SUM(wgt * v) AS DOUBLE) / nullif(SUM(wgt), 0) AS mean_b
  FROM w GROUP BY event_type, b
), ranked AS (
  SELECT event_type, mean_b,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mean_b NULLS LAST, b) AS rn
  FROM means
), ci AS (
  SELECT event_type,
         MAX(CASE WHEN rn = 1 + CAST(floor(0.025 * ({_BOOT_B} - 1)) AS BIGINT)
                  THEN mean_b END) AS lo,
         MAX(CASE WHEN rn = 1 + CAST(floor(0.975 * ({_BOOT_B} - 1)) AS BIGINT)
                  THEN mean_b END) AS hi
  FROM ranked GROUP BY event_type
), pt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_v
  FROM s GROUP BY event_type
)
SELECT p.event_type, p.n,
       CAST(round(p.mean_v, 6) AS DOUBLE) AS mean_r,
       CAST(round(c.lo, 6) AS DOUBLE) AS ci_lo_r,
       CAST(round(c.hi, 6) AS DOUBLE) AS ci_hi_r
FROM pt p JOIN ci c USING (event_type)
""",
    doc="Poisson bootstrap 95% CI for the per-series mean — the "
    "100 TB-safe formulation of stats_bootstrap_ci: instead of "
    "materializing index draws and joining them back to a "
    "rank-indexed value table (an O(n) broadcast or shuffle join plus "
    "a data-sized sort), every row draws its OWN Poisson(1) resample "
    "weight per replicate b in the same scan that reads it. The "
    "weights are engine-independent: u = a 32-bit xorshift-multiply "
    "hash (non-linear — see _MIX_C note) of a 64-bit-safe seed mix of "
    "(event_id, b), inverted through the "
    "quantized Poisson CDF thresholds (literal u32 cutpoints, "
    "truncated at 6), so both engines draw bit-identical weights and "
    "the whole Monte-Carlo procedure stays hash-checkable — same "
    "no-RNG-trust property as the exact-LCG twin, which serves as "
    "this query's small-scale statistical oracle (pytest pins the "
    "two CIs against each other within resampling tolerance). "
    "Resample means are exact decimal sums of wgt*v over sum(wgt) "
    "(nullif-guarded); CI endpoints use the same pinned "
    "floor(q*(B-1)) discrete quantile over the B means. Scale shape: "
    "ONE pass — scan, map-side explode to B weighted copies folded "
    "immediately by partial aggregation, one (series x B)-key "
    "shuffle, a B-row-per-series window; no join, no broadcast of "
    "data, no data-sized sort, skew-free (the explode key is "
    "(series, b), never a hot single key).",
)
def stats_bootstrap_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = _BOOT_B
    # same NULL-measurement scan filter as stats_bootstrap_ci: a NULL
    # value would contribute a NULL product to every resample sum
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    s = ev.select(
        "event_type", "event_id", F.col("value").cast(_DEC).alias("v")
    )
    m32 = F.lit(4294967296).cast("long")
    seed = (
        (F.col("event_id") % m32) * 40503
        + F.col("b") * F.lit(2654435761).cast("long")
        + 986419
    )
    u = _mix32_col(seed % m32)
    d = (
        s.select(
            "event_type",
            "event_id",
            "v",
            F.explode(F.sequence(F.lit(1), F.lit(B))).alias("b"),
        )
        .select("event_type", "b", "v", u.alias("u"))
    )
    wgt = F.when(F.col("u") < _POIS_T[0], 0)
    for k, t in enumerate(_POIS_T[1:], start=1):
        wgt = wgt.when(F.col("u") < t, k)
    wgt = wgt.otherwise(6)
    means = (
        d.select("event_type", "b", "v", wgt.alias("wgt"))
        .groupBy("event_type", "b")
        .agg(
            (
                F.sum(F.col("wgt") * F.col("v")).cast("double")
                / F.nullif(F.sum("wgt"), F.lit(0).cast("long"))
            ).alias("mean_b")
        )
    )
    # nulls LAST, pinned on both engines: a singleton series can draw
    # all-zero weights for some resamples (mean_b NULL via nullif);
    # Spark ascends nulls-first while DuckDB defaults nulls-last, which
    # silently shifts every rank (round-6 hostile sweep)
    w_m = Window.partitionBy("event_type").orderBy(
        F.col("mean_b").asc_nulls_last(), "b"
    )
    ranked = means.select(
        "event_type", "mean_b", F.row_number().over(w_m).alias("rn")
    )
    lo_rn = 1 + int(math.floor(0.025 * (B - 1)))
    hi_rn = 1 + int(math.floor(0.975 * (B - 1)))
    ci = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == lo_rn, F.col("mean_b"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("mean_b"))).alias("hi"),
    )
    pt = s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("v").cast("double") / F.count("*")).alias("mean_v"),
    )
    return pt.join(ci, "event_type").select(
        "event_type",
        "n",
        F.round("mean_v", 6).cast("double").alias("mean_r"),
        F.round("lo", 6).cast("double").alias("ci_lo_r"),
        F.round("hi", 6).cast("double").alias("ci_hi_r"),
    )


@register(
    "stats_qq_deciles",
    oracle="""
WITH s AS (
  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE event_type IN ('view', 'purchase')
    AND value IS NOT NULL
), h AS (
  SELECT event_type, v, COUNT(*) AS c FROM s GROUP BY event_type, v
), w AS (
  SELECT event_type, v,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
), q AS (
  SELECT w.event_type, d.q,
         MIN(CASE WHEN cum >= (q * (n - 1)) // 10 + 1 THEN v END) AS dv
  FROM w, unnest(range(1, 10)) AS d(q)
  GROUP BY w.event_type, d.q
)
SELECT CAST(q AS INTEGER) AS decile,
       CAST(MAX(CASE WHEN event_type = 'view' THEN dv END) AS DOUBLE) AS q_view,
       CAST(MAX(CASE WHEN event_type = 'purchase' THEN dv END) AS DOUBLE) AS q_purchase,
       CAST(MAX(CASE WHEN event_type = 'view' THEN dv END)
            - MAX(CASE WHEN event_type = 'purchase' THEN dv END) AS DOUBLE) AS qq_gap
FROM q GROUP BY q
""",
    doc="decile Q-Q comparison of two series — the distribution-shift "
    "diagnostic that says WHERE two samples diverge, not just whether "
    "(the KS statistic's complement). All nine deciles use the pinned "
    "integer-exact convention (q*(n-1))//10 into the sorted multiset, "
    "realized on the per-(series, value) histogram via the cumulative "
    "count — no engine quantile, no raw-row global sort; the gap "
    "column is a decimal difference cast to double at the end. Scale "
    "shape: one histogram shuffle per series, windows over "
    "distinct-values-sized tables, 18-row pivot to the final 9 rows.",
)
def stats_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL measurements dropped at the scan on both sides (NULL-wave):
    # a NULL histogram cell would cumulate in engine-dependent order
    ev = load_table(spark, "events", sf_dir).where(
        F.col("event_type").isin("view", "purchase")
        & F.col("value").isNotNull()
    )
    s = ev.select("event_type", F.col("value").cast(_DEC).alias("v"))
    h = s.groupBy("event_type", "v").agg(F.count("*").alias("c"))
    wcum = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    w = h.select(
        "event_type",
        "v",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    q = (
        # bounded: broadcast side is spark.range(1, 10) — a literal 9-row decile table
        w.crossJoin(F.broadcast(
            spark.range(1, 10).select(F.col("id").alias("q"))
        ))
        .groupBy("event_type", "q")
        .agg(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr("(q * (n - 1)) div 10") + 1,
                    F.col("v"),
                )
            ).alias("dv")
        )
    )
    is_a = F.col("event_type") == "view"
    return q.groupBy("q").agg(
        F.max(F.when(is_a, F.col("dv"))).cast("double").alias("q_view"),
        F.max(F.when(~is_a, F.col("dv"))).cast("double").alias("q_purchase"),
        (
            F.max(F.when(is_a, F.col("dv")))
            - F.max(F.when(~is_a, F.col("dv")))
        )
        .cast("double")
        .alias("qq_gap"),
    ).select(
        F.col("q").cast("int").alias("decile"),
        "q_view",
        "q_purchase",
        "qq_gap",
    )
