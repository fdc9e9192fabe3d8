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
    # --- round 10 rotation: EVIDENCE CLOSURE, part 3 of 3 (r9 verdict
    # ask #1). This is byte-for-byte the ROUND10_HEAD the r9 rotation
    # commit pinned and tests/test_registry_smoke.py machine-checked
    # (length 50, all registered, disjoint from the r9 window, and a
    # superset of the stale pool: every query whose newest green driver
    # row was r4 or older). After this window lands green, no query's
    # newest driver evidence predates r5. Composition, oldest first:
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

# ROUND-11 ROTATION HEAD (pinned NOW, per the standing r8 planning
# discipline — exactly 50). After the r10 window lands, the residual
# stale pool is exactly the 38 r5-era rows (newest driver row == r5,
# computed from CORRECTNESS_r*.json by tools/evidence.py). Slot policy,
# changed-code first: the round-9 ALL-NULL-PAYLOAD wave changed 16
# queries that sat in neither the r9 window nor the r10 head (fixes
# only differ on all-NULL input; all six fixture-generation sweeps
# verified 262/262 at the same HEAD) — 6 of those 16 are themselves
# r5-era rows, so the union is 48 names. The 2 fill slots go to
# round-10 changed code: llm_sim_ivf_kmeans (NEW — the two-tier
# centroid-IVF query, never driver-green, highest slot priority by the
# standing invariant) and stats_gini_concentration (the combined-
# adversity try_divide fix; r6 evidence, the oldest among this round's
# changed rows).
#
# R12 POOL PRIORITY (head full; enumerate now so r12's rotation is
# mechanical): the remaining round-10 changed-code rows —
# llm_embedding_label_drift (combined-adversity try_divide fix, r6
# evidence), the six variance-cancellation-class queries hardened
# after the regenerated driver fixture crashed agg_stats_moments'
# oracle (sqrt of a float-cancelled tiny-negative variance; all six
# now zero-clamp under sqrt with NULL-preserving CASE on both
# engines): agg_stats_moments (r7), stats_zscore_outliers (r7),
# stats_welch_ttest (r8), stats_mann_whitney_u (r8),
# ts_autocorrelation (r8), ts_rolling_corr (r8) — plus
# scale_compaction (compaction rewritten FS-agnostic, r8) and
# llm_dedup_incremental_banded (type-aware drift guard, r9) — then
# the r6-era generation in registry order (fmt_compression_codecs,
# agg_argmax_family first, displaced from this head's fills).
#
# Machine-checked by tests/test_registry_smoke.py (length 50, all
# registered, disjoint from THIS round's window, superset of the
# r5-era pool). NOT dead code: it is the r11 rotation's input,
# consumed when DRIVER_WINDOW is rebuilt from it next round, then
# deleted.
ROUND11_HEAD: tuple[str, ...] = (
    # all-NULL-payload-changed in r9 (16, incl. 6 that are also r5-era):
    "llm_dedup_minhash_ml",
    "llm_dedup_components",
    "llm_dedup_keep_canonical",
    "llm_dedup_incremental",
    "fn_struct_family",
    "cdc_upsert",
    "window_running_distinct",
    "join_nearest_value",
    "pareto_skyline",
    "agg_approx_top_k",
    "stream_session_window",
    "stream_session_window_native",
    "stream_window_topk",
    "stream_stateful_totals",
    "stream_cdc_apply",
    "source_binary_files",
    # remaining r5-era rows (32, registry order):
    "source_export_blocks",
    "fmt_roundtrip_xml",
    "parity_timestamp_format",
    "q3_shipping_priority",
    "sql_recursive_cte",
    "join_fuzzy_levenshtein",
    "cdc_changelog_compact",
    "join_null_safe_eq",
    "window_running_sum",
    "fn_higher_order_family",
    "agg_listagg_strings",
    "agg_histogram_equiwidth",
    "agg_histogram_equidepth",
    "stream_jdbc_sink_e2e",
    "stream_static_enrich_join",
    "udf_map_in_arrow",
    "udtf_word_positions",
    "llm_split_train_val_test",
    "llm_global_shuffle",
    "llm_kmeans_assign",
    "llm_kmeans_iterate",
    "llm_sample_weighted",
    "llm_bpe_pair_counts",
    "llm_embed_quantize",
    "scale_runtime_bloom_join",
    "scale_profile_columns",
    "ts_downsample_m4",
    "ts_cusum_changepoint",
    "ts_attribution_last_touch",
    "graph_triangle_count",
    "graph_pagerank",
    "join_interval_overlap",
    # round-10 changed-code fills (see slot policy above):
    "llm_sim_ivf_kmeans",
    "stats_gini_concentration",
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
