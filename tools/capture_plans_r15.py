"""Capture .explain("formatted") for named queries into plans/r15/.

Usage: python tools/capture_plans_r15.py <suffix> [query ...]
  suffix: "before" or "after" — file becomes plans/r15/<query>_<suffix>.txt
  default query set: every headline query (bench.HEADLINE).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_export_spark.registry import all_queries  # noqa: E402
from hive_export_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("capture-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain formatted ({suffix}, sf_dir={sf_dir})\n")
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)", flush=True)


if __name__ == "__main__":
    main()
