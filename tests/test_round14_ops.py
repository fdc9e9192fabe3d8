"""Round-14 wave-3 operators: exact substring (token-run) dedup,
label-propagation communities, Holt linear smoothing, Mann-Kendall
trend, Theil-Sen slope.

Each test pins the SEMANTICS on a hand-computable micro-case — the
oracle gate already proves cross-engine agreement at fixture scale, so
these fix what "right" means when both engines would agree on a wrong
answer together.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hive_export_spark.operators.dedup import duplicate_token_spans
from hive_export_spark.operators.graph import label_propagation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_token_spans_merges_overlapping_shingles(spark):
    # 12 shared tokens => a 12-token run duplicated across docs 1 and 2
    # must come back as ONE span of exactly 12 tokens in each, not the
    # 5 overlapping 8-gram hits that detected it.
    shared = "a b c d e f g h i j k l"
    rows = [
        (1, f"{shared} unique tail one x y z"),
        (2, f"other head two {shared}"),
        (3, "entirely different text with no duplication at all here"),
    ]
    out = {
        r["doc_id"]: r
        for r in duplicate_token_spans(_docs(spark, rows), window=8).collect()
    }
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["dup_tokens"] == 12


def test_duplicate_token_spans_two_disjoint_spans(spark):
    # two separated duplicated runs in one doc stay two islands
    s1 = "p q r s t u v w"  # 8 tokens, exactly one shingle
    s2 = "m n o aa bb cc dd ee"
    rows = [
        (1, f"{s1} filler gap words here between runs {s2}"),
        (2, s1),
        (3, s2),
    ]
    out = {
        r["doc_id"]: r
        for r in duplicate_token_spans(_docs(spark, rows), window=8).collect()
    }
    assert out[1]["n_dup_spans"] == 2
    assert out[1]["dup_tokens"] == 16
    assert out[2]["n_dup_spans"] == 1 and out[2]["dup_tokens"] == 8


def test_duplicate_token_spans_skips_short_and_null(spark):
    rows = [(1, None), (2, "too short"), (3, "a b c d e f g h"), (4, "a b c d e f g h")]
    got = duplicate_token_spans(_docs(spark, rows), window=8).collect()
    assert {r["doc_id"] for r in got} == {3, 4}
    assert all(r["dup_ratio"] == 1.0 for r in got)


def test_intradoc_repeat_alone_is_not_cross_doc_dup(spark):
    # an 8-gram repeated WITHIN one doc only (1 distinct doc) must not count
    s = "r1 r2 r3 r4 r5 r6 r7 r8"
    rows = [(1, f"{s} mid words split marker {s}"), (2, "nothing shared here at all ok then fine")]
    assert duplicate_token_spans(_docs(spark, rows), window=8).collect() == []


def test_label_propagation_two_cliques_converge(spark):
    # two triangles joined by nothing: each collapses to its min id
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)], "u long, v long"
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, 3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_label_propagation_tie_breaks_to_min_label(spark):
    # node 3's neighbors 1 and 2 tie at one vote each -> min label wins
    edges = spark.createDataFrame([(1, 3), (2, 3)], "u long, v long")
    got = {
        r["node"]: r["label"] for r in label_propagation(edges, 1).collect()
    }
    assert got[3] == 1


def test_holt_linear_matches_hand_rolled_recurrence(spark, sf_dir):
    from hive_export_spark.queries.timeseries_queries import ts_holt_linear

    rows = ts_holt_linear(spark, sf_dir).collect()
    assert rows, "fixture must yield at least one user series"
    byu = {r["user_id"]: r for r in rows}

    # recompute one user's series with a plain python loop
    from hive_export_spark.queries.timeseries_queries import _SPINE_HI, _SPINE_LO
    from hive_export_spark.sources import load_table

    uid = sorted(byu)[0]
    daily = (
        load_table(spark, "events", sf_dir)
        .filter(
            (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
            & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
            & F.col("value").isNotNull()
            & (F.col("user_id") == uid)
        )
        .groupBy(F.floor(F.unix_timestamp("ts") / 86400).alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("x"))
        .orderBy("d")
        .collect()
    )
    xs = [r["x"] for r in daily]
    assert len(xs) == byu[uid]["n_obs"]
    lvl, trd = xs[0], xs[1] - xs[0]
    for x in xs[2:]:
        new_l = 0.5 * x + 0.5 * (lvl + trd)
        trd = 0.3 * (new_l - lvl) + 0.7 * trd
        lvl = new_l
    assert byu[uid]["level"] == lvl
    assert byu[uid]["trend"] == trd
    assert byu[uid]["forecast_3"] == lvl + 3.0 * trd


def _events_dir(spark, tmp, rows):
    import os

    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def test_mann_kendall_monotone_series_is_increasing(spark):
    import tempfile

    from hive_export_spark.queries.timeseries_queries import ts_mann_kendall

    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (i, f"2024-01-{i + 1:02d} 12:00:00", 1, "click", float(i), "{}")
            for i in range(10)
        ]
        r = {
            row["event_type"]: row
            for row in ts_mann_kendall(spark, _events_dir(spark, tmp, rows)).collect()
        }["click"]
        assert r["n_obs"] == 10
        assert r["s_stat"] == 45  # all 45 ordered pairs ascend
        assert r["var_s"] == 125.0  # 10*9*25/18, no ties
        assert r["trend"] == "increasing"


def test_mann_kendall_constant_series_is_no_trend(spark):
    import tempfile

    from hive_export_spark.queries.timeseries_queries import ts_mann_kendall

    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (i, f"2024-01-{i + 1:02d} 12:00:00", 1, "view", 7.0, "{}")
            for i in range(6)
        ]
        r = ts_mann_kendall(spark, _events_dir(spark, tmp, rows)).collect()[0]
        # all tied: S = 0 short-circuits z to 0.0 before the 0/0
        assert r["s_stat"] == 0
        assert r["z_stat"] == 0.0
        assert r["trend"] == "no_trend"


def test_theil_sen_ignores_outlier_day(spark):
    import tempfile

    from hive_export_spark.queries.timeseries_queries import ts_theil_sen

    with tempfile.TemporaryDirectory() as tmp:
        # ten days on x = 2*day + 5, one wildly-off day: the median of
        # pairwise slopes (45 clean pairs of 55) must still be exactly 2
        rows = []
        for i in range(10):
            day_epoch = (19723 + i)  # 2024-01-(1+i) UTC
            rows.append(
                (i, f"2024-01-{i + 1:02d} 00:00:00", 1, "click",
                 2.0 * day_epoch + 5.0, "{}")
            )
        rows.append((99, "2024-01-20 00:00:00", 1, "click", 1e6, "{}"))
        r = ts_theil_sen(spark, _events_dir(spark, tmp, rows)).collect()[0]
        assert r["n_obs"] == 11 and r["n_pairs"] == 55
        assert r["slope"] == 2.0
        assert r["intercept"] == 5.0


def test_containment_catches_subset_doc_jaccard_misses(spark):
    from hive_export_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    quote = "alpha beta gamma delta epsilon zeta"
    longdoc = (
        "intro words here now " + quote + " and then a very long tail "
        "of completely unrelated content that keeps going on and on with "
        "many more distinct tokens to dilute the jaccard score badly"
    )
    docs = _docs(spark, [(1, quote), (2, longdoc)])
    got = containment_pairs(docs, threshold=0.8).collect()
    assert len(got) == 1
    r = got[0]
    # doc 1's 4 shingles all appear in doc 2 -> containment 1.0, inner=1
    assert r["inner_doc"] == 1 and r["outer_doc"] == 2
    assert r["containment"] == 1.0
    assert r["inner_sz"] < r["outer_sz"]
    # and jaccard at the same threshold says nothing
    assert ngram_jaccard_pairs(docs, threshold=0.8).collect() == []


def test_containment_orients_ties_to_lower_id(spark):
    from hive_export_spark.operators.dedup import containment_pairs

    same = "one two three four five six"
    got = containment_pairs(_docs(spark, [(7, same), (3, same)]), threshold=0.8).collect()
    assert len(got) == 1
    assert got[0]["inner_doc"] == 3 and got[0]["outer_doc"] == 7


def test_bounded_harmonic_on_path_graph(spark):
    from hive_export_spark.operators.graph import bounded_harmonic

    # path 1-2-3-4-5: node 1 sees {2}@1, {3}@2, {4}@3 -> H3 = 1 + .5 + 1/3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    got = {r["node"]: r for r in bounded_harmonic(edges, 3).collect()}
    assert got[1]["n_d1"] == 1 and got[1]["n_d2"] == 1 and got[1]["n_d3"] == 1
    assert got[1]["harmonic_r3"] == 1 + 0.5 + 1 / 3.0
    # middle node 3 reaches everything within 2 hops
    assert got[3]["n_d1"] == 2 and got[3]["n_d2"] == 2 and got[3]["n_d3"] == 0
    assert got[3]["harmonic_r3"] == 3.0
