"""IVF-style persisted ANN index: signature-bucket-partitioned storage.

The in-memory LSH operators (similarity.py, ml_lsh.py) still scan the
whole corpus to compute candidate signatures per query. At 100 TB the
index must live in STORAGE such that a query only READS matching buckets.
This module materializes that layout with nothing but parquet +
partitioning:

- build: signature = random-hyperplane bits (deterministic, seeded) →
  write vectors partitioned by the signature value. One directory per
  bucket; Spark's partition discovery turns the signature into a
  partition column.
- probe: enumerate the query signature's Hamming ball (multi-probe LSH),
  read the index with ``sig IN (buckets)`` — a PARTITION FILTER, so only
  the probed buckets' files are opened (asserted in tests via
  PartitionFilters) — then exact-rescore and top-k.

Bucket math: n_planes=6 → 64 buckets; probe radius 2 → 22 buckets/query
(1 + 6 + 15), i.e. ~1/3 of the corpus read instead of all of it, at any
scale. Tune n_planes ~ log2(corpus/bucket_target) and radius for recall.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_export_spark.operators.similarity import (
    _as_double,
    cosine,
    hyperplane_signature,
)


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
) -> None:
    """Materialize the bucket-partitioned index. Idempotent overwrite."""
    indexed = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_signature(
            _as_double(F.col(vec_col)), n_planes, dim, seed="ivf"
        ).alias("sig"),
    )
    (
        indexed.repartition("sig")
        .write.mode("overwrite")
        .partitionBy("sig")
        .parquet(path)
    )


def hamming_ball(sig: int, n_planes: int, radius: int) -> list[int]:
    """All signatures within `radius` bit flips of `sig`."""
    out = [sig]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            flipped = sig
            for b in bits:
                flipped ^= 1 << b
            out.append(flipped)
    return out


def ivf_topk(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    dim: int = 64,
    probe_radius: int = 2,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Multi-probe top-k over the persisted index.

    Query signatures are computed driver-side (query batches are small by
    definition — that is what makes them queries); the union of their
    Hamming balls becomes ONE partition-pruned index read shared by all
    queries, then candidates are scored exactly and ranked per query.

    ``max_query_rows`` guards the driver-side collect: a "query set" the
    size of a corpus would OOM the driver and belongs in the distributed
    all-pairs path instead.
    """
    q = queries.select(
        F.col(query_id_col),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn(
        "__qsig", hyperplane_signature(F.col("__qv"), n_planes, dim, seed="ivf")
    )
    q_rows = q.select(query_id_col, "__qsig").limit(max_query_rows + 1).collect()
    if not q_rows:
        # day-zero corpus / empty increment: no queries means no
        # neighbors, not a configuration error (round-8 day-zero sweep) —
        # raising here crashed every downstream pipeline on its first day
        from pyspark.sql import types as T

        # neighbor_id's type comes from the INDEX side, exactly as the
        # non-empty path derives it from the index scan's id_col — keeping
        # both code paths schema-identical even if query and corpus id
        # types differ (r8 driver advisory #2). An unreadable store (never
        # built, or day-zero partitionBy wrote no data files) falls back
        # to the query id type, the only remaining domain witness.
        try:
            neighbor_type = spark.read.parquet(index_path).schema[
                id_col
            ].dataType
        except Exception:  # noqa: BLE001 — AnalysisException / missing path
            neighbor_type = queries.schema[query_id_col].dataType
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    queries.schema[query_id_col],
                    T.StructField("neighbor_id", neighbor_type),
                    T.StructField("cosine", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            ),
        )
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"ivf_topk query set exceeds max_query_rows={max_query_rows}; "
            "signatures are collected driver-side, so batch the queries or "
            "use the distributed lsh_topk path "
            "(hive_export_spark.operators.similarity) for corpus-sized "
            "query sets"
        )
    probe_buckets = sorted(
        {
            b
            for r in q_rows
            for b in hamming_ball(r["__qsig"], n_planes, probe_radius)
        }
    )
    index = spark.read.parquet(index_path).filter(F.col("sig").isin(probe_buckets))

    per_query_buckets = [
        (r[query_id_col], hamming_ball(r["__qsig"], n_planes, probe_radius))
        for r in q_rows
    ]
    bucket_map = spark.createDataFrame(
        [(qid, b) for qid, bs in per_query_buckets for b in bs],
        [query_id_col, "sig"],
    )
    # bounded: bucket_map = collected query signatures x Hamming-ball buckets, capped by the max_query_rows guard
    candidates = index.join(F.broadcast(bucket_map), "sig").join(
        # bounded: q capped by the max_query_rows guard above
        F.broadcast(q), query_id_col
    )
    scored = candidates.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("__qv"), _as_double(F.col(vec_col))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )
