"""Measured sub-quadratic scaling probe for the dedup pipeline.

SCALING.md argues MinHash-LSH / OPH / connected-components are
sub-quadratic from their shuffle shapes; this tool MEASURES it past
fixture scale. It synthesizes replicated corpora (1x / 3x / 10x of the
sf0.1 documents table, 5k -> 50k docs) where every replica's words carry
a replica-unique suffix, so

  - replicas are NOT near-duplicates of each other (every shingle
    differs), keeping near-dup density constant as the corpus grows —
    true pairs and clusters must scale exactly linearly with the
    replication factor, which makes super-linear growth in candidates
    or wall time attributable to the ALGORITHM, not the data;
  - per-replica shingle-set structure is isomorphic to the fixture's, so
    exact-Jaccard verification finds the same pairs in each replica.

For each scale and variant (classic MinHash, OPH) it records wall time,
candidate-pair count (the LSH bucket self-join output BEFORE exact
verification — the quantity that goes quadratic if banding breaks), and
verified pairs; components runs over the verified pairs. Emits one JSON
line per measurement; paste the table into SCALING.md.

Usage:  python tools/scale_probe.py [sf_dir] [replications ...]
        (defaults: /root/testdata/sf0.1, 1 3 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hive_export_spark.operators.dedup import (  # noqa: E402
    connected_components,
    incremental_minhash_pairs,
    incremental_pairs_against_banded_store,
    minhash_lsh_pairs,
    minhash_signatures,
    persist_banded_store,
)
from hive_export_spark.session import get_spark  # noqa: E402
from hive_export_spark.sources import load_table  # noqa: E402


def replicated_corpus(spark, sf_dir: str, k: int, out_root: str) -> str:
    """Write a k-times corpus: replica r suffixes every word with ``_r<r>``
    (disjoint shingles across replicas) and remaps doc_id by a 1M stride.

    Keyed on the full fixture path (same rule as sf_scratch_dir): a cached
    corpus built from another fixture must never be silently reused.
    """
    import hashlib

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(out_root, f"docs_{key}_x{k}")
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    shutil.rmtree(path, ignore_errors=True)
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    reps = spark.range(k).select(F.col("id").alias("rep"))
    (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(
                            w, F.lit("_r"), F.col("rep").cast("string")
                        ),
                    ),
                    " ",
                )
            )
            .alias("text"),
        )
        .repartition(32)
        .write.parquet(path)
    )
    return path


def incremental_probe(spark, sf_dir: str, ks: list[int], out_root: str) -> None:
    """Measure the incremental-dedup cost claim (r5 verdict ask #7):
    fixed increment (the 1x fixture corpus re-suffixed, ~5k docs) against
    persisted stores of k x fixture size. If per-increment cost is
    O(increment), wall stays ~flat as the store grows 1x -> 10x; if the
    store term dominates, wall grows ~linearly and the claim is false.

    Two store layouts per k:
    - ``sig store``: persisted (id, signature) rows — each increment
      re-bands the WHOLE store (the `incremental_minhash_pairs` default);
      the O(store x bands) banding scan is the term to watch;
    - ``banded store``: the (id, band, bucket) table persisted once at
      ingest — increments band only the new docs and join the stored
      buckets as-is (at real scale this table is additionally
      bucket-partitioned so the probe join prunes storage; here it
      measures removing the re-banding term).
    """
    inc_path = os.path.join(out_root, "inc_corpus")
    if not os.path.exists(f"{inc_path}/_SUCCESS"):
        shutil.rmtree(inc_path, ignore_errors=True)
        docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
        docs.select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "), lambda w: F.concat(w, F.lit("_inc"))
                ),
                " ",
            ).alias("text"),
        ).repartition(8).write.parquet(inc_path)
    inc = spark.read.parquet(inc_path)
    n_inc = inc.count()

    for k in ks:
        corpus_path = replicated_corpus(spark, sf_dir, k, out_root)
        corpus = spark.read.parquet(corpus_path)
        sig_path = corpus_path + "_sigs"
        if not os.path.exists(f"{sig_path}/_SUCCESS"):
            minhash_signatures(corpus).write.mode("overwrite").parquet(sig_path)
        banded_path = corpus_path + "_banded_part"
        if not os.path.exists(f"{banded_path}/_SUCCESS"):
            persist_banded_store(spark.read.parquet(sig_path), banded_path)
        stored_sigs = spark.read.parquet(sig_path)
        n_store = stored_sigs.count()
        all_docs = corpus.unionByName(inc)

        t0 = time.perf_counter()
        n_pairs = incremental_minhash_pairs(stored_sigs, inc, all_docs).count()
        wall_sig = round(time.perf_counter() - t0, 2)

        # banded-store variant: the production bucket-partitioned store
        # (persist_banded_store / incremental_pairs_against_banded_store —
        # no store re-banding, partition-pruned probe scan)
        t0 = time.perf_counter()
        n_cand = incremental_pairs_against_banded_store(
            spark, banded_path, inc, all_docs, threshold=0.8
        ).count()
        wall_banded = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "probe": "incremental",
                    "store_docs": n_store,
                    "inc_docs": n_inc,
                    "wall_sig_store_sec": wall_sig,
                    "wall_banded_store_sec": wall_banded,
                    "verified_pairs": n_pairs,
                    "verified_pairs_banded": n_cand,
                }
            ),
            flush=True,
        )


def pruning_probe(spark, sf_dir: str, out_root: str) -> None:
    """Measure the banded store's STORAGE pruning as a function of
    increment size and bucket_parts (the round-7 follow-up to the
    wall-time incremental probe): how many of the store's bucket_part
    directories does a daily increment actually read?

    The increment touches <= increment_docs x bands distinct buckets,
    so the partition filter covers <= min(that, bucket_parts)
    partitions. With the default bucket_parts=64, any increment past a
    few docs collides with every partition — pruning is a SMALL-
    increment (or large-bucket_parts) win, which is exactly the 100 TB
    deployment shape: thousands of partitions, daily increments whose
    bucket set is sparse in them. This probe prints the measured
    partitions-read fraction so that claim is a number, not an argument.
    """
    from hive_export_spark.operators.dedup import banded_buckets

    corpus_path = replicated_corpus(spark, sf_dir, 1, out_root)
    corpus = spark.read.parquet(corpus_path)
    sigs = minhash_signatures(corpus)
    for bucket_parts in (64, 1024, 8192):
        store_path = f"{corpus_path}_banded_p{bucket_parts}"
        if not os.path.exists(f"{store_path}/_SUCCESS"):
            persist_banded_store(sigs, store_path, bucket_parts=bucket_parts)
        for inc_docs in (1, 10, 100, 1000):
            inc = corpus.orderBy("doc_id").limit(inc_docs)
            buckets = (
                banded_buckets(minhash_signatures(inc), "doc_id", 64, 16)
                .withColumn(
                    "bucket_part",
                    F.pmod(F.col("bucket"), F.lit(bucket_parts)),
                )
                .select("bucket_part")
                .distinct()
                .count()
            )
            print(
                json.dumps(
                    {
                        "probe": "banded_pruning",
                        "bucket_parts": bucket_parts,
                        "inc_docs": inc_docs,
                        "partitions_read": buckets,
                        "read_fraction": round(buckets / bucket_parts, 4),
                    }
                ),
                flush=True,
            )


def main() -> None:
    args = [a for a in sys.argv[1:]
            if a not in ("--incremental", "--pruning")]
    run_incremental = "--incremental" in sys.argv[1:]
    run_pruning = "--pruning" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    ks = [int(a) for a in args[1:]] or [1, 3, 10]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out_root = os.path.join(tempfile.gettempdir(), "hive_export_scale_probe")
    if run_pruning:
        pruning_probe(spark, sf_dir, out_root)
        return
    if run_incremental:
        incremental_probe(spark, sf_dir, ks, out_root)
        return

    results = []
    for k in ks:
        path = replicated_corpus(spark, sf_dir, k, out_root)
        corpus = spark.read.parquet(path)
        n_docs = corpus.count()
        for variant, oph in (("minhash", False), ("oph", True)):
            # candidate pairs = pipeline at threshold 0.0 (every bucket
            # candidate survives verification), verified = threshold 0.8
            t0 = time.perf_counter()
            verified = minhash_lsh_pairs(corpus, oph=oph)
            n_verified = verified.count()
            wall = time.perf_counter() - t0
            n_candidates = minhash_lsh_pairs(corpus, threshold=0.0, oph=oph).count()
            row = {
                "probe": variant,
                "replication": k,
                "docs": n_docs,
                "wall_sec": round(wall, 2),
                "candidate_pairs": n_candidates,
                "verified_pairs": n_verified,
            }
            if variant == "minhash":
                t0 = time.perf_counter()
                n_clusters = (
                    connected_components(verified)
                    .agg(F.countDistinct("cluster_id"))
                    .collect()[0][0]
                )
                row["components_wall_sec"] = round(time.perf_counter() - t0, 2)
                row["clusters"] = n_clusters
            results.append(row)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
