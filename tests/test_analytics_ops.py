"""Invariant tests for the structural-analytics operators (graph
triangle count, Pareto skyline, windowed distinct, EWMA kernel,
surprisal scoring, weighted sampling)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from hive_export_spark.operators.graph import cooccurrence_edges, triangle_count
from hive_export_spark.operators.skyline import skyline_2d
from hive_export_spark.queries.timeseries_queries import _EWMA_ALPHA, _EWMA_W


def _brute_triangles(edges: set[tuple[int, int]]) -> int:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    n = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            n += 1
    return n


def test_triangle_count_matches_bruteforce_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(1, 25))
        edges = {
            (u, v)
            for u in nodes
            for v in nodes
            if u < v and rng.random() < 0.25
        }
        df = spark.createDataFrame(sorted(edges), "u long, v long")
        got = triangle_count(df).collect()[0]
        assert got.n_triangles == _brute_triangles(edges)
        assert got.n_edges == len(edges)


def test_triangle_count_skewed_hub(spark):
    # star + one closing edge: hub degree 10, exactly one triangle; the
    # degree orientation must not multiply-count wedges at the hub
    edges = [(1, h) for h in range(2, 12)] + [(2, 3)]
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    got = triangle_count(df).collect()[0]
    assert got.n_triangles == 1
    assert got.n_nodes == 11


def test_cooccurrence_edges_support_threshold(spark):
    rows = [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
    ]
    df = spark.createDataFrame(rows, "g long, i string")
    got = {
        (r.u, r.v): r.n_common
        for r in cooccurrence_edges(df, "g", "i", min_support=2).collect()
    }
    assert got == {("a", "b"): 2}


def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_bruteforce_with_ties_and_dups(spark):
    rng = random.Random(11)
    pts = [
        (i, float(rng.randint(0, 8)), rng.randint(0, 8))
        for i in range(120)
    ]
    # force exact duplicates (both must be kept if non-dominated)
    pts += [(200, 0.0, 8), (201, 0.0, 8)]
    df = spark.createDataFrame(pts, "id long, price double, size long")
    got = sorted(
        (r.id, r.price, r.size)
        for r in skyline_2d(df, "price", "size").collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_local_prune_is_superset_safe(spark):
    # adversarial partitioning: repartition scatters dominators away from
    # the rows they dominate; result must be partitioning-independent
    pts = [(i, float(i % 13), (i * 7) % 17) for i in range(300)]
    df = spark.createDataFrame(pts, "id long, price double, size long")
    a = sorted(r.id for r in skyline_2d(df, "price", "size").collect())
    b = sorted(
        r.id
        for r in skyline_2d(df.repartition(7, "size"), "price", "size").collect()
    )
    assert a == b == sorted(p[0] for p in _brute_skyline(pts))


def test_ewma_weights_are_quantized_kernel():
    # the shared integer table must match the float kernel to 1e-9 and be
    # strictly decreasing (alpha in (0,1))
    for k, w in enumerate(_EWMA_W):
        assert abs(w / 1e9 - _EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k) < 1e-9
    assert all(a > b for a, b in zip(_EWMA_W, _EWMA_W[1:]))


def test_running_distinct_never_decreases(spark, sf_dir):
    from hive_export_spark.queries.analytics_queries import (
        window_running_distinct,
    )

    out = window_running_distinct(spark, sf_dir)
    w_chk = (
        out.groupBy("user_id")
        .agg(
            F.max("n_distinct_types").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    bad = w_chk.filter(F.col("mx") > F.col("n")).count()
    assert bad == 0
    # monotone within a user: max == last value in event order
    assert out.filter(F.col("n_distinct_types") < 1).count() == 0


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    from hive_export_spark.queries.llm_queries import llm_sample_weighted

    sel = llm_sample_weighted(spark, sf_dir)
    rows = sel.collect()
    assert len(rows) == 50
    # deterministic across invocations
    again = {r.doc_id for r in llm_sample_weighted(spark, sf_dir).collect()}
    assert {r.doc_id for r in rows} == again
    # weight-proportional inclusion: mean n_chars of the sample should
    # exceed the corpus mean (heavier docs preferred)
    from hive_export_spark.sources import load_table

    corpus_mean = (
        load_table(spark, "documents", sf_dir)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_perplexity_rare_tokens_score_higher(spark, sf_dir):
    from hive_export_spark.queries.llm_queries import llm_text_perplexity

    out = llm_text_perplexity(spark, sf_dir)
    stats = out.agg(
        F.min("avg_surprisal").alias("lo"), F.max("avg_surprisal").alias("hi")
    ).collect()[0]
    # all-positive surprisal, non-degenerate spread
    assert stats.lo > 0
    assert stats.hi > stats.lo
    n_docs = out.count()
    assert out.filter(F.col("n_tokens") > 0).count() == n_docs
