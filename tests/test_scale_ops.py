"""Scale-technique tests: salted joins/aggregations produce identical
results to their naive forms; bucketed tables join with zero exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_export_spark.operators.scale import (
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from hive_export_spark.plans import executed_plan
from hive_export_spark.sources import load_table


def _skewed_frames(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(fact, dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_aggregate_matches_plain(spark):
    fact, _ = _skewed_frames(spark)
    plain = {
        (r.k, r.n, r.s, r.mx)
        for r in fact.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    two_phase = {
        (r.k, r.count_v, r.sum_v, r.max_v)
        for r in salted_aggregate(fact, "k", {"v": "count"}).join(
            salted_aggregate(fact, "k", {"v": "sum"}), "k"
        ).join(
            salted_aggregate(fact, "k", {"v": "max"}), "k"
        ).collect()
    }
    assert plain == two_phase


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
        li = load_table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_quantity"
        )
        write_bucketed(o, "orders_b", ["o_orderkey"], num_buckets=8)
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            ["o_orderkey"],
            num_buckets=8,
        )
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = ob.join(lb, "o_orderkey")
        plan = executed_plan(joined)
        # co-located: bucket i joins bucket i, no exchange on either side
        assert "Exchange hashpartitioning" not in plan
        # and it is still correct
        expected = o.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_rebucket_table_evolution(spark, sf_dir):
    """Round-trip the verdict's 'done' bar: evolve a table's bucket count,
    then join pre/post-evolution peers without an Exchange."""
    from hive_export_spark.operators.scale import bucket_spec, rebucket_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
        li = load_table(spark, "lineitem", sf_dir).select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        write_bucketed(o, "orders_evo", ["o_orderkey"], num_buckets=4)
        write_bucketed(li, "lineitem_evo", ["o_orderkey"], num_buckets=16)
        before_rows = spark.table("orders_evo").count()

        # 4 -> 16: spec carried over from the catalog, count evolved
        stats = rebucket_table(spark, "orders_evo", 16)
        assert stats == {
            "num_buckets_before": 4,
            "num_buckets_after": 16,
            "bucket_cols": ["o_orderkey"],
        }
        assert bucket_spec(spark, "orders_evo")["num_buckets"] == 16
        assert spark.table("orders_evo").count() == before_rows

        joined = spark.table("orders_evo").join(
            spark.table("lineitem_evo"), "o_orderkey"
        )
        plan = executed_plan(joined)
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in ("orders_evo", "lineitem_evo", "orders_evo__rebucketing"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_rebucket_unbucketed_requires_cols(spark, sf_dir):
    import pytest
    from hive_export_spark.operators.scale import rebucket_table

    load_table(spark, "region", sf_dir).write.mode("overwrite").saveAsTable(
        "region_plain"
    )
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            rebucket_table(spark, "region_plain", 8)
        # explicit cols bucket it for the first time
        stats = rebucket_table(spark, "region_plain", 8, bucket_cols=["r_regionkey"])
        assert stats["num_buckets_before"] == 0
        from hive_export_spark.operators.scale import bucket_spec
        assert bucket_spec(spark, "region_plain")["num_buckets"] == 8
    finally:
        for t in ("region_plain", "region_plain__rebucketing"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_rebucket_explicit_cols_carries_sort_spec(spark, sf_dir):
    # passing bucket_cols explicitly must not silently drop an existing
    # sort-bucket spec; sort_cols=[] is the explicit way to drop it
    from hive_export_spark.operators.scale import bucket_spec, rebucket_table

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    write_bucketed(
        o, "orders_sorted", ["o_orderkey"], num_buckets=4,
        sort_cols=["o_totalprice"],
    )
    try:
        rebucket_table(spark, "orders_sorted", 8, bucket_cols=["o_orderkey"])
        spec = bucket_spec(spark, "orders_sorted")
        assert spec["num_buckets"] == 8
        assert spec["sort_cols"] == ["o_totalprice"]
        rebucket_table(
            spark, "orders_sorted", 4, bucket_cols=["o_orderkey"], sort_cols=[]
        )
        assert bucket_spec(spark, "orders_sorted")["sort_cols"] == []
    finally:
        for t in (
            "orders_sorted",
            "orders_sorted__rebucketing",
            "orders_sorted__pre_rebucket",
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_clustered_write_files_cover_disjoint_ranges(spark, sf_dir, tmp_path):
    # range clustering: each parquet file's [min, max] ts from the footer
    # stats must not overlap the next file's range (modulo shared
    # boundaries) — that disjointness is what lets selective scans skip
    # row groups
    import pyarrow.parquet as pq
    import os
    from hive_export_spark.operators.scale import write_clustered

    ev = load_table(spark, "events", sf_dir)
    path = str(tmp_path / "clustered")
    write_clustered(ev, path, "ts", num_files=8)

    ranges = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, f)).metadata
        col_idx = next(
            i for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "ts"
        )
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4  # the range shuffle actually spread the data
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint up to shared boundary


def test_zordered_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    # z-order: a selective predicate on EITHER interleaved key must be
    # able to skip a large fraction of row groups from footer stats alone
    # (a single-column range layout gives disjointness on one dim and
    # nothing on the other)
    import os

    import pyarrow.parquet as pq

    from hive_export_spark.operators.scale import write_zordered

    li = load_table(spark, "lineitem", sf_dir)
    path = str(tmp_path / "zordered")
    write_zordered(li, path, ("l_partkey", "l_suppkey"), num_files=16)

    stats = {"l_partkey": [], "l_suppkey": []}
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        for rg in range(meta.num_row_groups):
            for col in stats:
                st = meta.row_group(rg).column(idx[col]).statistics
                stats[col].append((st.min, st.max))
    n_groups = len(stats["l_partkey"])
    assert n_groups >= 8
    # predicate = bottom ~15% of each key's observed domain (the fixture
    # key ranges scale with sf, so absolute literals would degenerate)
    pred = {}
    for col in stats:
        gmin = min(mn for mn, _ in stats[col])
        gmax = max(mx for _, mx in stats[col])
        pred[col] = (gmin, gmin + max((gmax - gmin) * 15 // 100, 1))
    overlap = {
        col: [not (mx < lo or mn > hi) for mn, mx in stats[col]]
        for col, (lo, hi) in pred.items()
    }
    # with 16 z-range files each dim is only split into halves/quarters,
    # so per-dim pruning is partial...
    for col in pred:
        assert sum(overlap[col]) < n_groups, col
    # ...but the CONJUNCTION — what the scan actually evaluates — must
    # prune most row groups: that is the z-order payoff over a
    # single-column range layout (which gives zero pruning on dim 2)
    both = sum(a and b for a, b in zip(*overlap.values()))
    assert both <= n_groups // 2, (both, n_groups)


def test_frequent_ngrams_counts_occurrences_not_docs(spark):
    from hive_export_spark.operators.text import frequent_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    top = frequent_ngrams(df, n=2, top_k=3).collect()
    # 'a b' occurs 3x in doc1 + 1x in doc2 = 4 total (occurrences, not
    # per-doc distinct shingles), then 'b a' 2x, then 'b c' 1x
    assert [(r.ngram, r.n_occurrences) for r in top] == [
        ("a b", 4), ("b a", 2), ("b c", 1),
    ]


def test_equidepth_bucketize_matches_exact_within_sketch_error(spark, sf_dir):
    """The sketch-based scale path must reproduce the exact ntile binning
    up to the sketch rank error, with no global sort in its plan."""
    from hive_export_spark.operators.scale import equidepth_bucketize
    from hive_export_spark.plans.audit import executed_plan
    from hive_export_spark.sources import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, "lineitem", sf_dir).select("l_extendedprice")
    n = li.count()
    binned = equidepth_bucketize(li, "l_extendedprice", 10)
    counts = {
        r.bin: r.n
        for r in binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) <= set(range(1, 11))
    # every bin within 5% of the ideal depth (sketch error is far smaller,
    # but duplicate values at a cut legitimately lump)
    ideal = n / 10
    assert all(abs(c - ideal) <= 0.05 * n for c in counts.values())
    assert sum(counts.values()) == n
    # the scale property itself: no global Sort in the physical plan
    plan = executed_plan(binned)
    assert "Sort [l_extendedprice" not in plan
