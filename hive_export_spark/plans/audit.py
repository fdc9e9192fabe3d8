"""Plan-property assertions over the executed (physical) plan string.

Used by tests/test_plans.py to pin the physical shapes that matter at
100 TB: filters reaching the parquet scan, column pruning in ReadSchema,
small dims broadcast, wide WholeStageCodegen spans. A plan regression
(e.g. a filter stuck above a join, a broadcast silently becoming a
sort-merge join) fails tests instead of surfacing as a slow cluster run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan as text (post-AQE initial plan included)."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan node advertises PushedFilters containing every
    fragment (e.g. column names of pushed predicates)."""
    plan = executed_plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if not m:
        return False
    pushed = m.group(1)
    return all(f in pushed for f in fragments)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads — the column-pruning
    ground truth. Parsed from the FileScan output list (the ReadSchema
    struct is elided past ~100 chars in plan toString)."""
    plan = executed_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", plan):
        for field in m.group(1).split(","):
            name = field.strip().split("#")[0]
            if name:
                cols.append(name)
    return cols


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def scan_scale_killers(package_root: str) -> list[str]:
    """Static sweep of the package source for the anti-patterns that kill
    100 TB runs: driver-side ``.collect()`` on unbounded data,
    row-at-a-time Python UDFs (``F.udf``), non-broadcast ``crossJoin``,
    RDD drops, and ``toPandas``. Returns violations as
    ``"file:line: snippet"`` strings — a clean repo returns ``[]``.

    Every legitimate use must be allowlisted below BY STRIPPED LINE
    CONTENT (not line number, so unrelated edits don't churn the list;
    any change to the guarded line itself forces re-review here). This
    automates the per-round manual sweep: a new unguarded scale-killer
    fails tests the day it lands, not at the next audit.
    """
    import os

    # known-bounded sites: collects of <=O(100) rows by construction
    allowed = {
        # IVF query-side collect, guarded by max_query_rows
        ('operators/ivf.py', 'q_rows = q.select(query_id_col, "__qsig").limit(max_query_rows + 1).collect()'),
        # tiny distinct key set (CDC dims)
        ('operators/cdc.py', '.collect()'),
        # DESCRIBE EXTENDED output (catalog metadata, dozens of rows)
        ('operators/scale.py', 'rows = spark.sql(f"DESCRIBE EXTENDED {table_name}").collect()'),
        # 1-row min/max bounds for JDBC range partitioning
        ('sources/jdbc.py', 'row = bounds_df.collect()[0]'),
        # k-means: the k x dim centroid matrix + one SSE scalar per
        # iteration — the documented bounded driver exchange of Lloyd's
        ('operators/kmeans.py', '(r["cluster_id"], list(r["centroid"])) for r in init.collect()'),
        ('operators/kmeans.py', 'sse = assignment.agg(F.sum("dist2")).collect()[0][0] or 0.0'),
        ('operators/kmeans.py', 'for r in new_cent.collect()'),
        # partition-count metadata probe, not a data materialization
        ('operators/dedup.py', 'if df.rdd.getNumPartitions() < target:'),
        # broadcast of 1-row aggregates (scalar fan-out, not a cartesian)
        ('queries/llm_queries.py', 'tot.crossJoin(n_samp)'),
        ('queries/llm_queries.py', '.crossJoin(n_diff)'),
        ('queries/timeseries_queries.py', '.crossJoin('),
        ('queries/timeseries_queries.py', '.crossJoin(s2.agg(F.count("*").cast("bigint").alias("n_click_after")))'),
        ('queries/timeseries_queries.py', '.crossJoin(s3.agg(F.count("*").cast("bigint").alias("n_purchase_after")))'),
        ('queries/stats_queries.py', '.crossJoin('),
        ('queries/stats_queries.py', '.crossJoin(both)'),
        ('queries/stats_queries.py', 'exact.crossJoin(exact_both)'),
        ('queries/stats_queries.py', '.crossJoin(est)'),
        ('queries/llm_queries.py', 'return exact.crossJoin(found).select('),
    }
    patterns = (
        re.compile(r"\.collect\(\)"),
        re.compile(r"\bF\.udf\(|functions\.udf\(|@udf\b"),
        re.compile(r"\.crossJoin\("),
        re.compile(r"\.toPandas\(\)"),
        re.compile(r"\.rdd\b"),
    )
    violations: list[str] = []
    for dirpath, _dirnames, filenames in os.walk(package_root):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, package_root).replace(os.sep, "/")
            if rel == "plans/audit.py":  # the scanner's own allowlist
                continue
            with open(path, encoding="utf-8") as fh:
                for lineno, line in enumerate(fh, 1):
                    stripped = line.strip()
                    if stripped.startswith("#"):
                        continue
                    for pat in patterns:
                        if not pat.search(stripped):
                            continue
                        # crossJoin(F.broadcast(...)) is the sanctioned
                        # scalar/small-side fan-out — self-documenting
                        if pat.pattern == r"\.crossJoin\(" and "crossJoin(F.broadcast(" in stripped.replace(" ", ""):
                            continue
                        if (rel, stripped) in allowed:
                            continue
                        violations.append(f"{rel}:{lineno}: {stripped}")
    return violations


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — fewer, wider spans mean more
    of the query runs as fused generated code."""
    plan = executed_plan(df)
    # plan toString marks codegen'd operators as "*(id)"; formatted explain
    # spells out "WholeStageCodegen (id)" — accept both
    ids = re.findall(r"\*\((\d+)\)", plan) + re.findall(
        r"WholeStageCodegen \((\d+)\)", plan
    )
    return len(set(ids))
