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
    # --- round 12 rotation: byte-for-byte the ROUND12_HEAD the r11
    # rotation commit pinned and tests/test_registry_smoke.py
    # machine-checked (length 50, all registered, disjoint from the r11
    # window, superset of the post-r11 r6-era stale pool). Composition
    # (slot policy, changed-code first): the two never-driver-checked
    # IVF lifecycle queries (llm_sim_ivf_incremental,
    # llm_sim_ivf_compacted — both also changed THIS round: exactly-once
    # append recovery + rerun-safe compaction scaffolding, so the r12
    # driver row covers the new code), the nine other rows whose
    # code/oracle changed in r10/r11 without a fresher driver row, all
    # 24 remaining r6-era rows, and 15 r7-era fills. After this window
    # lands green, no query's newest driver evidence predates r7
    # (r10 verdict ask #2 closure).
    "llm_sim_ivf_incremental",
    "llm_sim_ivf_compacted",
    "llm_embedding_label_drift",
    "agg_stats_moments",
    "stats_zscore_outliers",
    "stats_welch_ttest",
    "stats_mann_whitney_u",
    "ts_autocorrelation",
    "ts_rolling_corr",
    "scale_compaction",
    "llm_dedup_incremental_banded",
    "fmt_compression_codecs",
    "agg_argmax_family",
    "agg_filter_clause",
    "cdc_snapshot_diff",
    "window_nth_value",
    "fn_xpath_family",
    "fn_csv_serde_family",
    "stats_chi2_independence",
    "stats_ks_drift",
    "stats_benford_first_digit",
    "stats_bootstrap_ci",
    "stats_bootstrap_poisson",
    "stats_qq_deciles",
    "udf_scalar_iter_pandas",
    "udf_window_pandas",
    "llm_frame_sample_plan",
    "llm_source_overlap_matrix",
    "scale_shuffle_hash_hint",
    "ts_flatline_runs",
    "ts_markov_transitions",
    "ts_rolling_median",
    "graph_jaccard_linkpred",
    "graph_bfs_hops",
    "graph_kcore_peel",
    "fmt_roundtrip_text",
    "join_inner",
    "join_semi",
    "join_anti",
    "join_broadcast_dim",
    "agg_groupby",
    "agg_rollup",
    "sort_limit",
    "setop_union_all",
    "setop_intersect",
    "setop_except",
    "join_theta_inequality",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "subquery_scalar_avg",
)

# ROUND-13 ROTATION HEAD (pinned NOW, per the standing r8 planning
# discipline — exactly 50). After the r12 window lands, the residual
# stale pool is exactly the 28 r7-era rows (newest driver row == r7,
# computed from CORRECTNESS_r*.json by tools/evidence.py this round).
# Slot policy, changed-code first:
# - llm_sim_ivf_rebuilt and llm_sim_ivf_stream_ingest (NEW in r12 —
#   the drift-triggered staged-swap rebuild lifecycle and the
#   exactly-once streaming-ingest composition, never driver-checked:
#   highest slot priority);
# - the 4 rows whose operator code changes in round 12 without a
#   fresher driver row: llm_sim_ivf_kmeans and llm_sim_ivf_pruned
#   (day-zero guard tightening — AnalysisException/path-missing only —
#   and the rebuild crash-consistency fix, ADVICE r11 #1), and
#   llm_kmeans_assign / llm_kmeans_iterate (k-means|| candidate-order
#   canonicalization, ADVICE r11 #4);
# - all 28 r7-era rows, registry order;
# - 16 fill slots to the OLDEST remaining evidence: r8-era rows in
#   registry order.
# Closure invariant after r13 lands green: nothing older than r8.
# Machine-checked by tests/test_registry_smoke.py (length 50, all
# registered, disjoint from THIS round's window, superset of the
# post-r12 r7-era pool). NOT dead code: it is the r13 rotation's input,
# consumed when DRIVER_WINDOW is rebuilt from it next round, then
# deleted.
ROUND13_HEAD: tuple[str, ...] = (
    # never-driver-checked r12 lifecycle queries (2):
    "llm_sim_ivf_rebuilt",
    "llm_sim_ivf_stream_ingest",
    # round-12 changed-code rows (4):
    "llm_sim_ivf_kmeans",
    "llm_sim_ivf_pruned",
    "llm_kmeans_assign",
    "llm_kmeans_iterate",
    # r7-era rows (28, registry order):
    "unpivot_stack",
    "q4_order_priority",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "window_row_number",
    "window_rank_dense",
    "window_lag_lead",
    "window_sliding_avg",
    "window_ratio_to_report",
    "fn_json_family",
    "fn_try_family",
    "fn_regexp_family",
    "fn_printf_family",
    "stats_mad_outliers",
    "stats_winsorize",
    "llm_sim_topk_bruteforce",
    "llm_text_quality",
    "llm_text_repetition",
    "llm_text_langid",
    "llm_multimodal_features",
    "llm_intradoc_dedup",
    "llm_text_normalize",
    "llm_sample_mixture",
    "ts_interpolate_linear",
    "ts_bollinger_bands",
    # r8-era fills (16, registry order):
    "join_left",
    "join_right",
    "join_asof",
    "agg_cube",
    "setop_intersect_all",
    "q8_market_share",
    "q17_small_quantity_revenue",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_parts_supplier_relationship",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "fn_date_family",
    "fn_explode_outer",
    "fn_interval_family",
)
#
# (Historical windows: the r5-r10 rotations and their slot-policy
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
