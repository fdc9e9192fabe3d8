"""Regenerate PLANS.md: captured physical plans for the headline queries.

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from hive_export_spark.plans.audit import executed_plan  # noqa: E402
from hive_export_spark.registry import all_queries  # noqa: E402
from hive_export_spark.session import get_spark  # noqa: E402

PICKS = [
    ("parity_json_encode", "the whole reference hot loop; expect ONE codegen span, no Exchange"),
    ("q1_pricing_summary", "filter pushdown + 7-column pruning + partial agg"),
    ("q5_local_supplier_volume", "star join: dims broadcast, facts shuffle on keys only"),
    ("join_asof", "as-of join: equi-keyed shuffle + window, no cross product"),
    ("llm_dedup_minhash_lsh", "signature fan-out + banded candidate join + filtered verification"),
    ("llm_sim_topk_bruteforce", "broadcast queries x partitioned corpus + per-query top-k"),
    ("llm_dedup_minhash_oph", "OPH signatures: one hash pass + banded join (same downstream shape as classic)"),
    ("llm_dedup_embedding", "banded cosine-LSH bucket self-join + exact verify + broadcast exact count"),
    ("graph_triangle_count", "degree-oriented wedge join: 2-shuffle edge derivation, rank joins, (b,c)-keyed closing join"),
    ("pareto_skyline", "partition-local prune (no Exchange before the window) + broadcast frontier join"),
    ("window_running_distinct", "ONE hashpartitioning Exchange reused by both sorts"),
    ("stats_zscore_outliers", "decimal power-sum agg + BroadcastHashJoin scoring, fact side never shuffles"),
    ("llm_embed_quantize", "array lambdas fully inside codegen: zero Exchange"),
    ("join_nearest_value", "grid-anchor 1-NN: bucket agg + broadcast anchors + per-probe min"),
    ("llm_sim_ivf_kmeans", "two-tier centroid IVF probe: cid PartitionFilters on the int8 coarse scan, vec_id IN PushedFilters on the exact rerank, broadcast probe maps"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = [
        "# PLANS — captured physical plans for headline queries",
        "",
        "Generated from `.explain` at sf0.001 (plan shape is scale-invariant;",
        "tests/test_plans.py asserts the load-bearing properties). Regenerate:",
        "`python tools/dump_plans.py`.",
        "",
    ]
    for name, why in PICKS:
        df = qs[name](spark, sf_dir)
        plan = executed_plan(df)
        out += [f"## {name}", f"\n*{why}*\n", "```"]
        out += plan.rstrip().splitlines()[:60]
        out += ["```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")


if __name__ == "__main__":
    main()
