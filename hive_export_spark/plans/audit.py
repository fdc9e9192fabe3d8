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

    Allowlist discipline (round-6 hardening):
    - every entry carries a non-empty per-entry justification string —
      the scanner itself rejects an unjustified entry;
    - STALE entries (matching no current source line) are reported as
      violations, so the list cannot rot as code moves;
    - ``crossJoin(F.broadcast(X))`` is sanctioned only when X is
      visibly bounded on the line — an aggregate (``.agg(``/``groupBy``
      result), a ``.limit(`` frame, or a literal ``spark.range`` — OR
      the line above carries a ``# bounded:`` justification comment
      (why X is O(small) at any data scale) or an ``# oracle-twin:``
      comment (X is data-sized ON PURPOSE: a fixture-scale exact
      verification twin whose production path is named in the comment).
      A data-sized broadcast argument with neither fails the sweep
      (tested).
    """
    import os

    # (relpath, stripped-line) -> justification. Keep additions to one
    # per change with a real reason; the scanner enforces non-empty.
    allowed: dict[tuple[str, str], str] = {
        ('operators/ivf.py', 'q_rows = q.select(query_id_col, "__qsig").limit(max_query_rows + 1).collect()'):
            "IVF query-side collect, bounded by max_query_rows+1 via limit()",
        ('operators/cdc.py', '.collect()'):
            "tiny distinct key set (CDC dims), O(#partitions) rows",
        ('operators/scale.py', 'rows = spark.sql(f"DESCRIBE EXTENDED {table_name}").collect()'):
            "DESCRIBE EXTENDED catalog metadata, dozens of rows",
        ('sources/jdbc.py', 'row = bounds_df.collect()[0]'):
            "1-row min/max bounds for JDBC range partitioning",
        ('operators/kmeans.py', '(r["cluster_id"], list(r["centroid"])) for r in init.collect()'):
            "k-means init: k x dim centroid matrix, the documented bounded driver exchange of Lloyd's",
        ('operators/kmeans.py', 'sse = assignment.agg(F.sum("dist2")).collect()[0][0] or 0.0'):
            "k-means: one SSE scalar per iteration",
        ('operators/kmeans.py', 'for r in new_cent.collect()'):
            "k-means: k x dim updated centroids per iteration",
        ('operators/dedup.py', 'if df.rdd.getNumPartitions() < target:'):
            "partition-count metadata probe, not a data materialization",
        ('operators/dedup.py', 'r[0] for r in new_banded.select("bucket_part").distinct().collect()'):
            "bounded by bucket_parts (<= O(100)) distinct values; becomes the literal partition filter that prunes the banded-store scan",
        ('queries/llm_queries.py', 'tot.crossJoin(n_samp)'):
            "both sides are 1-row aggregates (corpus totals x sample size)",
        ('queries/llm_queries.py', '.crossJoin(n_diff)'):
            "1-row aggregate fan-out (distinct-count scalar)",
        ('queries/timeseries_queries.py', '.crossJoin('):
            "1-row aggregate scalar fan-out (series totals)",
        ('queries/timeseries_queries.py', '.crossJoin(s2.agg(F.count("*").cast("bigint").alias("n_click_after")))'):
            "1-row count aggregate",
        ('queries/timeseries_queries.py', '.crossJoin(s3.agg(F.count("*").cast("bigint").alias("n_purchase_after")))'):
            "1-row count aggregate",
        ('queries/stats_queries.py', '.crossJoin('):
            "1-row aggregate scalar fan-out (test statistics)",
        ('queries/stats_queries.py', '.crossJoin(both)'):
            "1-row aggregate (pooled test statistic)",
        ('queries/stats_queries.py', 'exact.crossJoin(exact_both)'):
            "two 1-row aggregates (exact vs sketch comparison)",
        ('queries/stats_queries.py', '.crossJoin(est)'):
            "1-row sketch-estimate aggregate",
        ('queries/llm_queries.py', 'return exact.crossJoin(found).select('):
            "two 1-row aggregates (exact vs approximate count)",
        ('operators/ml_lsh.py', '.collect()'):
            "1-row embedding-dimension probe via limit(1), early-terminating scan",
    }
    for key, why in allowed.items():
        if not (isinstance(why, str) and why.strip()):
            raise ValueError(f"allowlist entry without justification: {key}")
    patterns = (
        re.compile(r"\.collect\(\)"),
        re.compile(r"\bF\.udf\(|functions\.udf\(|@udf\b"),
        re.compile(r"\.crossJoin\("),
        re.compile(r"\.toPandas\(\)"),
        re.compile(r"\.rdd\b"),
    )
    # the broadcast side of a sanctioned crossJoin must be VISIBLY
    # bounded: an aggregate, a limit, or a literal small range
    bounded_arg = re.compile(
        r"crossJoin\(\s*F\.broadcast\([^)]*(\.agg\(|\.groupBy\(|\.limit\(|\.range\()"
    )
    violations: list[str] = []
    used: set[tuple[str, str]] = set()
    for dirpath, _dirnames, filenames in os.walk(package_root):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, package_root).replace(os.sep, "/")
            if rel == "plans/audit.py":  # the scanner's own allowlist
                continue
            with open(path, encoding="utf-8") as fh:
                prev = ""
                for lineno, line in enumerate(fh, 1):
                    stripped = line.strip()
                    if stripped.startswith("#"):
                        prev = stripped
                        continue
                    for pat in patterns:
                        if not pat.search(stripped):
                            continue
                        if pat.pattern == r"\.crossJoin\(" and "crossJoin(F.broadcast(" in stripped.replace(" ", ""):
                            # sanctioned only when the broadcast arg is
                            # visibly bounded on the line, or the line
                            # above justifies it with "# bounded:"
                            flat = stripped.replace(" ", "")
                            if (
                                bounded_arg.search(flat)
                                or prev.startswith("# bounded:")
                                or prev.startswith("# oracle-twin:")
                            ):
                                continue
                            violations.append(
                                f"{rel}:{lineno}: crossJoin(F.broadcast(...)) "
                                f"with no visibly-bounded argument and no "
                                f"'# bounded:'/'# oracle-twin:' justification: "
                                f"{stripped}"
                            )
                            continue
                        if (rel, stripped) in allowed:
                            used.add((rel, stripped))
                            continue
                        violations.append(f"{rel}:{lineno}: {stripped}")
                    prev = stripped
    stale = set(allowed) - used
    violations.extend(
        f"STALE allowlist entry (matches no source line, remove it): {k}"
        for k in sorted(stale)
    )
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
