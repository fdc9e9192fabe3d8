"""Cold-leg A/B for the graph_pagerank iteration shape (round-15,
VERDICT r14 ask #2).

Round 14 fused the PageRank round (union + one groupBy) on the strength
of a warm single-JVM interleaved A/B (-12%), but the driver's cold leg
read +49% raw / +19% normalized. This tool measures ONE variant per
process under the bench.py protocol (idle gate, get_spark honoring
SPARK_GRAFT_CPUS, JVM warmup, one warmup execution, min-of-3 noop-sink
timed runs) so alternating invocations give a cold-JVM comparison the
driver's methodology respects.

    python tools/ab_pagerank.py fused     # current committed shape
    python tools/ab_pagerank.py twojoin   # r13 shape (join+agg+left-join)

Prints one JSON line: {"variant": ..., "runs": [...], "min": ...,
"calibration": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def pagerank_int_twojoin(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """The r13 (pre-fuse) shape: per iteration, contribution join +
    groupBy(dst) sum + LEFT JOIN back onto the rank table. Verbatim from
    commit 3d31592~1."""
    _PR_BASE = 10**12
    direc = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint()
    )
    deg = direc.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n1 = deg.agg(F.count(F.lit(1)).alias("__n"))
    ranks = (
        deg.withColumnRenamed("src", "node")
        # bounded: n1 is a global .agg() — exactly 1 row (node count)
        .crossJoin(F.broadcast(n1))
        .select(
            "node",
            "deg",
            F.expr(f"{_PR_BASE} div __n").cast("long").alias("rank_int"),
            F.expr(f"(15 * ({_PR_BASE} div __n)) div 100")
            .cast("long")
            .alias("__tele"),
        )
    )
    for _ in range(iterations):
        contrib = ranks.join(
            direc, ranks["node"] == direc["src"]
        ).select(
            F.col("dst"),
            F.expr("rank_int div deg").cast("long").alias("__c"),
        )
        inflow = contrib.groupBy("dst").agg(F.sum("__c").alias("__s"))
        ranks = (
            ranks.join(inflow, ranks["node"] == inflow["dst"], "left")
            .select(
                "node",
                "deg",
                "__tele",
                (
                    F.col("__tele")
                    + F.expr("(85 * coalesce(__s, 0L)) div 100").cast("long")
                ).alias("rank_int"),
            )
        )
    return ranks.select("node", "deg", "rank_int")


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "fused"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # idle gate (bench.py protocol)
    idle_bar = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOAD", "1.0"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_IDLE", "600"))
    waited = 0.0
    while wait_budget > 0 and os.getloadavg()[0] >= idle_bar:
        if waited >= wait_budget:
            break
        time.sleep(15.0)
        waited += 15.0

    from hive_export_spark.operators import graph as graph_mod
    from hive_export_spark.registry import all_queries
    from hive_export_spark.session import get_spark

    if variant == "twojoin":
        graph_mod.pagerank_int = pagerank_int_twojoin

    spark = get_spark("ab-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    fn = all_queries()["graph_pagerank"]
    spark.sparkContext.setJobDescription(f"ab_pagerank:{variant}")
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "variant": variant,
        "runs": runs,
        "min": min(runs),
        "load_1m": round(os.getloadavg()[0], 2),
        "idle_wait_sec": waited,
    }))


if __name__ == "__main__":
    main()
