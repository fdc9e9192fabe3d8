"""Physical-plan introspection: the engine's ".explain and iterate" loop
as code (SURVEY.md section 4 — our optimizer work is Catalyst
configuration, so the tests assert the plans Catalyst should produce)."""

from hive_export_spark.plans.audit import (
    executed_plan,
    has_broadcast_hash_join,
    has_pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "has_broadcast_hash_join",
    "has_pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
