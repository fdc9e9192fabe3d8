"""Distributed k-means over an embedding column (Lloyd's algorithm,
DataFrame-native).

Corpus clustering is the curation primitive between dedup and sampling in
a training-data pipeline (topic balancing, density-based subsampling,
centroid-IVF index training). The reference engine has no clustering; this
is part of the committed LLM-pipeline extension surface (SURVEY.md §2.2).

Execution shape (the part that must survive 100 TB):
- centroids are k × dim doubles — always broadcast, never shuffled;
- assignment is a map-only pass: crossJoin(broadcast(centroids)) + a
  per-vector argmin window over k rows — the corpus never shuffles on
  anything wider than its own id;
- the mean update shuffles (cluster, dim) pairs — corpus × dim rows of
  three scalars each, aggregated with map-side partials; dim is fixed and
  small, so this is a bounded multiple of one corpus scan;
- per-iteration driver traffic is exactly the k × dim centroid matrix
  (the same bounded-collect contract as operators/ivf.py probes), plus
  one scalar for the convergence check;
- iterations are linear scans — no lineage growth because each iteration
  rebuilds from the (cached) input and a literal centroid array.

Vector math uses higher-order array expressions over double-cast elements
(JVM-side, deterministic fold order, zero Python) — same conventions as
operators/similarity.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def _sq_l2(a, b) -> F.Column:
    """Squared Euclidean distance, sequential left fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cluster_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Nearest-centroid assignment: (id_col, cluster_id, dist2).

    Map-only at any corpus size: the centroid table is broadcast, each
    vector scores k candidates and the argmin window partitions by the
    vector id (k rows per partition — bounded). Ties break on the lowest
    cluster id, making assignment deterministic.
    """
    v = vectors.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    c = centroids.select(
        F.col(centroid_id_col), _as_double(F.col(centroid_vec_col)).alias("__c")
    )
    # bounded: c is the k x dim centroid table (k clusters, not data-sized)
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col,
        centroid_id_col,
        _sq_l2(F.col("__v"), F.col("__c")).alias("dist2"),
    )
    w = Window.partitionBy(id_col).orderBy("dist2", centroid_id_col)
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def update_centroids(
    vectors: DataFrame,
    assignment: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd mean update: per-cluster dimension-wise mean.

    posexplode turns the corpus into (cluster, dim, value) triples; the
    mean aggregates with map-side partials and the result reassembles to
    arrays via a dim-sorted collect per cluster (k rows — tiny).
    Returns (cluster_id, centroid array<double>, n_members).
    """
    joined = vectors.select(
        id_col, _as_double(F.col(vec_col)).alias("__v")
    ).join(assignment.select(id_col, "cluster_id"), id_col)
    dims = joined.select(
        "cluster_id", F.posexplode("__v").alias("dim", "val")
    )
    per_dim = dims.groupBy("cluster_id", "dim").agg(
        F.avg("val").alias("mean"), F.count(F.lit(1)).alias("n")
    )
    return per_dim.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean"))
            ),
            lambda s: s.mean,
        ).alias("centroid"),
        F.first("n").alias("n_members"),
    )


@dataclass
class KMeansResult:
    centroids: DataFrame  # (cluster_id, centroid array<double>, n_members)
    assignment: DataFrame  # (id_col, cluster_id, dist2)
    sse_history: list[float]  # total within-cluster SSE per iteration
    iterations: int
    converged: bool


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KMeansResult:
    """Lloyd's k-means. Deterministic init: the k vectors with the
    smallest md5(id) — a seeded uniform draw over the corpus that needs
    one bounded top-k, no RNG state.

    Convergence: relative SSE improvement < tol, or max_iter. SSE is
    monotonically non-increasing under exact arithmetic; per-iteration
    driver traffic is the k x dim centroid matrix + one scalar.
    """
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col)
    ).cache()
    init = (
        v.withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h", id_col)
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy("__h", id_col))
            .cast("long")
            .alias("cluster_id"),
            F.col(vec_col).alias("centroid"),
        )
    )
    # k x dim doubles: the bounded driver exchange (same contract as the
    # IVF probe collect); re-created as a literal DataFrame each round so
    # iteration N+1's plan does not stack N prior joins
    centroid_rows = [
        (r["cluster_id"], list(r["centroid"])) for r in init.collect()
    ]
    sse_history: list[float] = []
    assignment = None
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        centroids = spark.createDataFrame(
            centroid_rows, "cluster_id long, centroid array<double>"
        )
        assignment = assign_clusters(
            v, centroids, id_col=id_col, vec_col=vec_col
        )
        sse = assignment.agg(F.sum("dist2")).collect()[0][0] or 0.0
        sse_history.append(float(sse))
        if len(sse_history) > 1:
            prev = sse_history[-2]
            if prev == 0.0 or (prev - sse) / prev < tol:
                converged = True
                break
        new_cent = update_centroids(
            v, assignment, id_col=id_col, vec_col=vec_col
        )
        centroid_rows = [
            (r["cluster_id"], list(r["centroid"]))
            for r in new_cent.collect()
        ]
        if len(centroid_rows) < k:
            # empty cluster: k-means proper keeps k fixed by re-seeding;
            # for curation use a shrunken k is fine — document, proceed
            pass
    final_centroids = spark.createDataFrame(
        centroid_rows, "cluster_id long, centroid array<double>"
    )
    sizes = assignment.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return KMeansResult(
        centroids=final_centroids.join(sizes, "cluster_id", "left"),
        assignment=assignment,
        sse_history=sse_history,
        iterations=it,
        converged=converged,
    )
