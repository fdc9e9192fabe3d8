"""Per-query profiling for the headline bench (round-14 optimization).

For each query, after one warmup, splits the steady-state min-of-3 wall
into:
  - build_s: time spent in fn(spark, sf_dir) — Catalyst construction plus
    any driver-side actions the query runs while assembling its plan
    (IVF probe collects, partition-filter collects, store gating).
  - exec_s:  time of the noop write (analysis/optimization/codegen of the
    final plan + distributed execution).
  - jobs:    Spark job count per timed run (driver round-trips).

Usage: python tools/profile_bench.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_export_spark.registry import all_queries  # noqa: E402
from hive_export_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or HEADLINE
    spark = get_spark("profile-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    st = spark.sparkContext.statusTracker()

    out = {}
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(3):
            j0 = len(st.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j1 = len(st.getJobIdsForGroup(None))
            rec = {
                "total": round(t2 - t0, 3),
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "jobs": j1 - j0,
            }
            if best is None or rec["total"] < best["total"]:
                best = rec
        out[name] = best
        print(f"{name:36s} total={best['total']:7.3f} build={best['build_s']:7.3f} exec={best['exec_s']:7.3f} jobs={best['jobs']}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "profile": out}))


if __name__ == "__main__":
    main()
