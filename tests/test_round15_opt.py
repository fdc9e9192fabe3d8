"""Round-15 optimization behavior pins.

Every optimization this round must keep declared outputs identical;
these tests pin the equivalences the round's restructures rely on:

- LSH oversized-bucket salting emits EXACTLY the unsalted pair set
  (guide §2.5 skew — the per-bucket quadratic enumeration is spread
  across tasks past ``bucket_pair_cap`` without changing one pair).
- ``persist_banded_store`` writes ~1 data file per bucket_part
  directory (guide §6 small files — partitionBy without the preceding
  repartition wrote up to bucket_parts files per task).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _pair_set(df):
    return {(r["doc_a"], r["doc_b"], round(r["jaccard"], 12)) for r in df.collect()}


def test_lsh_oversized_bucket_salting_matches_unsalted(spark):
    """A degenerate bucket (12 near-identical docs — every band bucket
    holds all of them) forced over a cap of 4 must salt into chunk-grid
    cells whose union is byte-identical to the unsalted enumeration,
    including the off-diagonal (cross-chunk) cells and verification."""
    from hive_export_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, base) for i in range(1, 13)]
    # a second, smaller duplicate cluster that stays under the cap, plus
    # noise docs and a NULL-text row
    docs += [
        (101, "completely different content about spark optimization work"),
        (102, "completely different content about spark optimization work"),
        (103, "yet another unrelated document with its own set of words"),
        (104, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    salted = minhash_lsh_pairs(df, threshold=0.5, bucket_pair_cap=4)
    unsalted = minhash_lsh_pairs(df, threshold=0.5, bucket_pair_cap=1 << 30)
    got, want = _pair_set(salted), _pair_set(unsalted)
    assert got == want
    # the 12-doc clique's 66 pairs and the small cluster's pair survive
    clique = {(a, b) for (a, b, _) in got if a <= 12 and b <= 12}
    assert len(clique) == 66
    assert any(a == 101 and b == 102 for (a, b, _) in got)


def test_lsh_salting_cap_boundary(spark):
    """Bucket size exactly at the cap takes the small path; cap+1 salts —
    both must agree with each other pairwise (string ids exercise the
    binary-collation ordering the slice-based cross cells rely on)."""
    from hive_export_spark.operators.dedup import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ids = ["a", "b", "c", "d", "E"]  # mixed case: binary collation, E < a
    docs = [(i, base) for i in ids]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    at_cap = minhash_lsh_pairs(df, threshold=0.5, bucket_pair_cap=5)
    salted = minhash_lsh_pairs(df, threshold=0.5, bucket_pair_cap=2)
    assert _pair_set(at_cap) == _pair_set(salted)
    # 5 identical docs -> C(5,2) = 10 pairs
    assert len(_pair_set(salted)) == 10


def test_banded_store_one_file_per_partition(spark, tmp_path):
    """The store write repartitions on bucket_part before partitionBy,
    so every bucket_part directory holds exactly ONE data file (the
    round-15 §6 small-files fix; before, every write task opened one
    file per partition value it held)."""
    from hive_export_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared words {i % 7}")
         for i in range(200)],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", 16)
    path = str(tmp_path / "buckets")
    dedup.persist_banded_store(
        sigs, path, "doc_id", num_hashes=16, bands=4, bucket_parts=8
    )
    part_dirs = [d for d in os.listdir(path) if d.startswith("bucket_part=")]
    assert part_dirs, "store wrote no partitions"
    for d in part_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d} has {len(files)} files, expected 1"


def test_banded_store_probe_unchanged_by_layout(spark, tmp_path):
    """The probe must read the repartitioned store identically: build a
    store, probe it with an increment, and compare against the
    all-in-one batch answer restricted to increment pairs."""
    from hive_export_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog number"
    docs = [(i, f"{base} {i % 3}") for i in range(1, 10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    old = df.filter(F.col("doc_id") <= 6)
    new = df.filter(F.col("doc_id") > 6)
    path = str(tmp_path / "buckets")
    dedup.persist_banded_store(
        dedup.minhash_signatures(old, "text", "doc_id", 16),
        path, "doc_id", num_hashes=16, bands=4, bucket_parts=8,
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.incremental_pairs_against_banded_store(
            spark, path, new, df, "text", "doc_id",
            num_hashes=16, bands=4, threshold=0.5, bucket_parts=8,
        ).collect()
    }
    batch = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            df, threshold=0.5, num_hashes=16, bands=4
        ).collect()
        if r["doc_b"] > 6
    }
    assert got == batch
