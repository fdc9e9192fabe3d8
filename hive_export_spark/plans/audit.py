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
