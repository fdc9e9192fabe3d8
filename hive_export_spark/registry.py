"""Query registry: the driver-facing catalog of every implemented operator.

Each entry pairs a PySpark query (``(spark, sf_dir) -> DataFrame``) with an
ANSI-SQL oracle string DuckDB can run over the same parquet tables. The
driver compares row-count + schema + order-insensitive value hash, so every
computed column is aliased identically on both sides.

EVERY entry is oracle-backed — the driver has no rows-only path (a
missing oracle burns a window slot as ``err: no_oracle``, round-2
verdict). Approximate/RNG ops register oracle-able formulations: the
query emits deterministic derived outputs (exact values plus
within-tolerance booleans) and the oracle computes the exact side in SQL
with literal TRUE.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}

# The grading driver verifies only the FIRST 50 entries of ``queries()`` in
# iteration order (round-1 CORRECTNESS keys == registry positions 0-49), so
# iteration order is part of the driver contract. Rotation invariant,
# re-checked each round (tests/test_registry_smoke.py pins the list):
# slots go FIRST to every query with no green driver row in any
# CORRECTNESS_r0N.json and to every query whose code/oracle changed this
# round (old rows are stale evidence for those), THEN to proven family
# representatives. Everything rotated out keeps its earlier green row as
# evidence.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- round 9 rotation: EVIDENCE CLOSURE, part 2 of 3 (r8 verdict
    # ask #1). This is byte-for-byte the ROUND9_HEAD the r8 rotation
    # commit pinned and tests/test_registry_smoke.py machine-checked
    # (length 50, all registered, disjoint from the r8 window).
    # Composition, per the standing policy (changed-code first, then
    # oldest evidence):
    #   the r8 carryover + two r7/r8-advisory-touched queries:
    "graph_degree_assortativity",
    "fn_variant_family",
    "llm_sim_rp_lsh_topk",
    # day-zero-changed in r8 (fixes only differ on empty input; clean
    # sf0.01 hashes verified unchanged):
    "agg_grouping_id",
    "agg_theta_sketch_intersect",
    "scale_dpp_scan",
    "stream_replay_exactly_once",
    "llm_dedup_embedding",
    "llm_sim_ivf_topk",
    "llm_sim_ivf_pruned",
    "scale_zorder_scan",
    "llm_dedup_incremental_banded",
    "source_partition_discovery",
    # day-one-changed in r8 (singleton-group / 1-row-table fixes):
    "agg_kll_quantile_merge",
    "llm_sim_lsh_topk",
    "llm_sample_fraction",
    # zero-countDistinct crash fix (round-8 static sweep + receipt):
    "agg_hll_sketch_union",
    # the r2-stale tail (newest driver row is six fixture generations
    # old), minus the two r10 deferrals noted in ROUND10_HEAD:
    "agg_distinct",
    "agg_grouping_sets",
    "fn_array_family",
    "fn_conditional_family",
    "fn_explode_unnest",
    "fn_hash_family",
    "fn_map_family",
    "fn_math_family",
    "fn_string_family",
    "join_full",
    "join_range_band",
    "llm_dedup_exact",
    "llm_dedup_minhash_lsh",
    "llm_dedup_ngram_jaccard",
    "parity_base64_encode",
    "parity_json_encode",
    "parity_partition_routing",
    "parity_partition_token",
    "parity_partitioned_write",
    "parity_skip_internal_fields",
    "pivot_status_by_priority",
    "q12_shipmode_priority",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "setop_except_all",
    "stream_dedup_keys",
    "stream_export_e2e",
    "stream_tumbling_window",
    "topk_per_group",
    "udf_grouped_agg_pandas",
    "udf_grouped_map_pandas",
    "udf_scalar_pandas",
    "union_by_name_missing",
)

# ROUND-10 ROTATION HEAD (pinned NOW, r8 verdict ask #2 — exactly 50;
# EVIDENCE CLOSURE, part 3 of 3). After the r9 window lands, the
# residual stale pool (newest driver row <= r4, computed from
# CORRECTNESS_r*.json by tools/evidence.py) is exactly 47 names:
# the two r2 deferrals, the 22 r3-era rows, and the 23 r4-era rows —
# all enumerated below in evidence-age order (oldest first). The three
# fill slots follow the standing policy — changed-code first:
# scale_dq_checks gained the two documents-table rules in round 9,
# agg_skew_kurtosis's decimal precisions were re-sized after the
# round-9 day-one receipt, and agg_corr_regression's corr moved to the
# try_divide co-moment form after the round-9 constant-series receipt
# (all three r8 rows are stale evidence).
#
# R11 POOL PRIORITY (head full; enumerate now so r11's rotation is
# mechanical): the round-9 ALL-NULL-PAYLOAD wave changed 13 queries
# that sit in neither the r9 window nor this head — fixes only differ
# on all-NULL input; clean/hostile/day-zero/day-one/constant sweeps
# verified 262/262 at the same HEAD: llm_dedup_minhash_ml,
# llm_dedup_components, llm_dedup_keep_canonical, llm_dedup_incremental,
# fn_struct_family, cdc_upsert, window_running_distinct,
# join_nearest_value, pareto_skyline, agg_approx_top_k,
# stream_session_window, stream_session_window_native,
# stream_window_topk, stream_stateful_totals, stream_cdc_apply,
# source_binary_files (dropped from this head's fills for the
# changed-code trio above). After those, the r5-era generation
# (source_export_blocks first in registry order).
# After r10 lands green, no query's newest driver row predates r5.
# Machine-checked by tests/test_registry_smoke.py (length 50, all
# registered, disjoint from THIS round's window). NOT dead code: it
# is the r10 rotation's input, consumed when DRIVER_WINDOW is rebuilt
# from it next round, then deleted.
ROUND10_HEAD: tuple[str, ...] = (
    # r2-era deferrals:
    "window_distribution",
    "window_ntile_first_last",
    # r3-era rows:
    "fmt_roundtrip_orc",
    "fmt_roundtrip_csv",
    "fmt_roundtrip_json",
    "source_formats_roundtrip",
    "jdbc_roundtrip_derby",
    "q7_volume_shipping",
    "q15_top_supplier",
    "fn_posexplode",
    "fn_string_extra",
    "agg_percentiles",
    "agg_mode_deterministic",
    "agg_collect_sorted",
    "agg_approx_count_distinct",
    "sql_frontend_q1",
    "agg_approx_quantile_sketch",
    "stream_sliding_window",
    "llm_sample_stratified",
    "cdc_upsert_current",
    "scale_salted_agg",
    "stream_stream_interval_join",
    "scale_clustered_scan",
    "llm_text_frequent_ngrams",
    # r4-era rows:
    "fmt_schema_evolution",
    "subquery_correlated_exists",
    "subquery_not_in_nulls",
    "join_lateral_topk",
    "window_range_frame",
    "window_range_interval",
    "fn_bitwise_family",
    "agg_bitmap_distinct",
    "agg_bool_family",
    "stream_stream_left_outer_join",
    "llm_dedup_minhash_oph",
    "llm_decontaminate_ngram",
    "llm_text_pii_redact",
    "llm_sample_balanced",
    "fn_url_family",
    "cdc_scd2_history",
    "scale_bucketed_join",
    "scale_skew_join",
    "cdc_asof_lookup",
    "ts_gap_fill_locf",
    "ts_funnel_three_stage",
    "ts_sessionize_batch",
    "ts_incremental_rollup",
    # changed-code fills (round-9 documents DQ rules; round-9 day-one
    # precision-budget fix; round-9 constant-series corr fix):
    "scale_dq_checks",
    "agg_skew_kurtosis",
    "agg_corr_regression",
)
#
# (Historical windows: the r5-r8 rotations and their slot-policy
# narratives live in git history and COVERAGE.md.)



def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the driver-facing registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def _ordered_names() -> list[str]:
    """Registry names with the driver-window 50 first, rest in module order."""
    _load_all()
    missing = [n for n in DRIVER_WINDOW if n not in _REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    window = set(DRIVER_WINDOW)
    return list(DRIVER_WINDOW) + [n for n in _REGISTRY if n not in window]


def all_queries() -> dict[str, QueryFn]:
    return {name: _REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {
        name: _REGISTRY[name].oracle
        for name in _ordered_names()
        if _REGISTRY[name].oracle is not None
    }


def get(name: str) -> RegisteredQuery:
    _load_all()
    return _REGISTRY[name]


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import has the side
    effect of populating the registry)."""
    global _LOADED
    if _LOADED:
        return
    import hive_export_spark.queries.connector_queries  # noqa: F401
    import hive_export_spark.queries.parity_queries  # noqa: F401
    import hive_export_spark.queries.relational_queries  # noqa: F401
    import hive_export_spark.queries.window_queries  # noqa: F401
    import hive_export_spark.queries.function_queries  # noqa: F401
    import hive_export_spark.queries.stats_queries  # noqa: F401
    import hive_export_spark.queries.streaming_queries  # noqa: F401
    import hive_export_spark.queries.udf_queries  # noqa: F401
    import hive_export_spark.queries.llm_queries  # noqa: F401
    import hive_export_spark.queries.scale_queries  # noqa: F401
    import hive_export_spark.queries.timeseries_queries  # noqa: F401
    import hive_export_spark.queries.analytics_queries  # noqa: F401

    _LOADED = True
