"""Receipt probe for the IVF append/rebuild cost contracts (round 12).

Measures, against 1x/3x/10x replicated base corpora (the same
norm-preserving replication as tools/ann_probe.py):

- ivf_centroid_append wall for a FIXED-SIZE increment — the exactly-once
  staged append claims O(increment) ingest, so the wall must stay ~flat
  as the base corpus grows a decade;
- rebuild_ivf_centroid_index wall — the drift remedy re-trains and
  re-routes the whole corpus, so its wall is expected to scale with the
  corpus (that asymmetry is WHY the drift metric gates rebuilds instead
  of running them daily);
- the derived centroid count at each scale (k ~ sqrt(N) catching up at
  rebuild time, frozen during appends).

Usage: python tools/append_probe.py [sf_dir] [k ...]
Prints one table row per replication factor; receipts land in
SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hive_export_spark.operators.ivf import (  # noqa: E402
    build_ivf_centroid_index,
    ivf_centroid_append,
    rebuild_ivf_centroid_index,
)
from hive_export_spark.session import get_spark  # noqa: E402
from hive_export_spark.sources.tables import load_table  # noqa: E402
from tools.ann_probe import replicated_vectors  # noqa: E402

INCREMENT_ROWS = 100


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(a) for a in sys.argv[2:]] or [1, 3, 10]
    spark = get_spark("append-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out_root = os.path.join(tempfile.gettempdir(), "hive_export_ann_probe")

    # fixed-size increment, id-strided far above every replica's range so
    # it is NEW data at every scale
    incr = (
        load_table(spark, "embeddings", sf_dir)
        .orderBy("vec_id")
        .limit(INCREMENT_ROWS)
        .select(
            (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint()
    )

    print(
        "| base x | n_base | build k | build s | append s | drift ratio "
        "| rebuild s | rebuilt k |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for k in ks:
        corpus_path = replicated_vectors(spark, sf_dir, k, out_root)
        corpus = spark.read.parquet(corpus_path)
        n_base = corpus.count()
        store = os.path.join(out_root, f"append_probe_x{k}", "idx")
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)

        t0 = time.perf_counter()
        build_ivf_centroid_index(corpus, store, max_iter=5)
        build_wall = round(time.perf_counter() - t0, 2)
        built_k = spark.read.parquet(store + "_centroids").count()

        t0 = time.perf_counter()
        stats = ivf_centroid_append(spark, store, incr, append_id="probe")
        append_wall = round(time.perf_counter() - t0, 2)

        grown = corpus.unionByName(incr)
        t0 = time.perf_counter()
        rebuild_ivf_centroid_index(spark, store, grown, max_iter=5)
        rebuild_wall = round(time.perf_counter() - t0, 2)
        rebuilt_k = spark.read.parquet(store + "_centroids").count()

        ratio = stats["drift_ratio"]
        print(
            f"| {k}x | {n_base} | {built_k} | {build_wall} "
            f"| {append_wall} | {round(ratio, 3) if ratio else ratio} "
            f"| {rebuild_wall} | {rebuilt_k} |"
        )


if __name__ == "__main__":
    main()
