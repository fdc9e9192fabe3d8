"""Relational operators beyond the reference's linear dataflow
(SURVEY.md section 2.2: joins, aggregations, top-k, as-of/range joins).

The reference has none of these (its pipeline is route-and-write only);
they are the committed extension surface. Everything here is declarative
DataFrame composition, so Catalyst chooses physical strategies (broadcast
vs shuffle-hash vs sort-merge; AQE re-plans at runtime). Helpers exist for
the patterns Spark lacks as single calls: greatest-per-group, as-of join,
range (band) join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via row_number window + filter.

    Scale note: one shuffle on the partition columns, no global sort.
    Skewed groups are split by AQE. Include a unique tiebreaker in
    order_cols for deterministic output.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_key: str,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """As-of join: for each left row, the single most recent right row with
    ``right_time <= left_time``, matching on equi-keys ``on``.

    Spark has no native ASOF JOIN; this is the canonical DataFrame
    composition: equi-join on the keys with the time inequality as a join
    predicate, then greatest-per-group (row_number over the unique
    ``left_key``) to keep only the latest match. The shuffle stays keyed on
    the equi-keys, so there is no cross product; at 100 TB, pre-bucket both
    sides on ``on`` to make the join co-located, and bound per-key fan-out
    with a time-range predicate if keys are hot.

    ``left_key`` must uniquely identify left rows (used for dedup).
    ``how``: 'left' keeps unmatched left rows, 'inner' drops them.
    """
    l, r = left.alias("l"), right.alias("r")
    cond = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in on] + [
        F.col(f"r.{right_time}") <= F.col(f"l.{left_time}")
    ]
    joined = l.join(r, cond, how)
    w = Window.partitionBy(F.col(f"l.{left_key}")).orderBy(
        F.col(f"r.{right_time}").desc_nulls_last()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"l.{c}").alias(c) for c in left.columns],
            *[F.col(f"r.{c}").alias(c) for c in right_values],
        )
    )


def band_join(
    df: DataFrame,
    bands: DataFrame,
    value_col: str,
    low_col: str = "low",
    high_col: str = "high",
    how: str = "left",
) -> DataFrame:
    """Range (band) join: attach the band whose [low, high) interval
    contains ``value_col``.

    Band tables are small by construction, so broadcast: the join becomes a
    broadcast-nested-loop with a range predicate — shuffle-free at any
    scale. For two LARGE range sides, bucket both by coarse range buckets
    first (not needed for the fixture workloads).
    """
    cond = (F.col(value_col) >= F.col(low_col)) & (F.col(value_col) < F.col(high_col))
    # bounded: band tables are small by construction (docstring); two large range sides need bucketing instead
    return df.join(F.broadcast(bands), cond, how)


def interval_overlap_join(
    df: DataFrame,
    key: str,
    id_col: str,
    start_col: str,
    end_col: str,
    cell_size: int,
) -> DataFrame:
    """Self-join of intervals: all pairs (a, b) within the same ``key``
    whose [start, end] ranges overlap (inclusive), with ``a.id < b.id``.

    The naive formulation is a per-key theta join (quadratic candidates).
    This is the GRID-PARTITIONED interval join: each interval is exploded
    to the ``cell_size``-wide grid cells it covers, candidates meet in an
    EQUI-join on (key, cell), and each qualifying pair is emitted exactly
    once — only in the first cell both intervals share (cell ==
    floor(max(starts) / cell_size)) — so no distinct/dedup shuffle is
    ever needed. This is the standard spatial/temporal-join design
    (genomics range joins, session overlap): candidate volume is driven
    by cell occupancy, not by per-key interval counts squared. Pick
    ``cell_size`` near the median interval length; far smaller multiplies
    replication (length/cell copies per interval), far larger re-grows
    per-cell quadratic work.

    Returns (key, a_id, b_id, overlap) with overlap = the inclusive
    overlap length min(ends) - max(starts) (same unit as the inputs).
    """
    cells = F.sequence(
        F.floor(F.col(start_col) / cell_size).cast("long"),
        F.floor(F.col(end_col) / cell_size).cast("long"),
    )
    flat = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        F.explode(cells).alias("__cell"),
    )
    a = flat.alias("a")
    b = flat.alias("b")
    first_shared = F.floor(
        F.greatest(F.col("a.__s"), F.col("b.__s")) / cell_size
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .filter(
            (F.col("a.__s") <= F.col("b.__e"))
            & (F.col("b.__s") <= F.col("a.__e"))
            & (F.col("a.__cell") == first_shared)
        )
        .select(
            F.col("a.__k").alias(key),
            F.col("a.__id").alias("a_id"),
            F.col("b.__id").alias("b_id"),
            (
                F.least(F.col("a.__e"), F.col("b.__e"))
                - F.greatest(F.col("a.__s"), F.col("b.__s"))
            ).alias("overlap"),
        )
    )


def nearest_value_join(
    probes: DataFrame,
    refs: DataFrame,
    probe_id: str,
    probe_val: str,
    ref_id: str,
    ref_val: str,
    cell_size: int,
) -> DataFrame:
    """For every probe row, the reference row with the nearest value
    (1-NN on a number line) — WITHOUT a global sort or a cross join.

    Values must be exact integers (scale currency to cents first).
    Ties break by (distance, ref value, ref id), so the match is total-
    order deterministic.

    Distributed shape (the same grid discipline as the interval join):

    1. References bucket by ``value div cell_size``; per bucket keep the
       extreme values and their tie-broken ids (one aggregation).
    2. A bucket-level anchor index over the union of ref and probe
       buckets computes, per bucket, the nearest ref BELOW the bucket
       (running last-non-null over strictly-preceding buckets) and
       ABOVE it (first-non-null over strictly-following) — a window over
       the bucket table, which is value-range/cell_size sized, orders of
       magnitude smaller than the data (choose cell_size accordingly).
    3. Each probe's candidates are exactly: same-bucket refs (equi-join
       on the bucket key) plus its bucket's below/above anchors. The
       true nearest neighbor is provably among them: any ref outside
       the probe's bucket is dominated by the nearest-below / nearest-
       above anchor. One per-probe min finishes it.

    Shuffles: ref bucket agg, probe-bucket equi-join, per-probe min —
    all key-partitioned; nothing global but the tiny anchor window.
    """
    p = probes.select(
        F.col(probe_id).alias("__pid"),
        F.col(probe_val).alias("__pv"),
        F.floor(F.col(probe_val) / cell_size).cast("long").alias("__b"),
    )
    r = refs.select(
        F.col(ref_id).alias("__rid"),
        F.col(ref_val).alias("__rv"),
        F.floor(F.col(ref_val) / cell_size).cast("long").alias("__b"),
    )
    per_bucket = r.groupBy("__b").agg(
        F.max("__rv").alias("__hi_v"),
        F.expr("min_by(__rid, struct(-__rv, __rid))").alias("__hi_id"),
        F.min("__rv").alias("__lo_v"),
        F.expr("min_by(__rid, struct(__rv, __rid))").alias("__lo_id"),
    )
    spine = (
        p.select("__b").unionAll(r.select("__b")).distinct()
        .join(per_bucket, "__b", "left")
    )
    w_prev = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.orderBy("__b").rowsBetween(1, Window.unboundedFollowing)
    anchors = spine.select(
        "__b",
        F.last("__hi_v", ignorenulls=True).over(w_prev).alias("__below_v"),
        F.last("__hi_id", ignorenulls=True).over(w_prev).alias("__below_id"),
        F.first("__lo_v", ignorenulls=True).over(w_next).alias("__above_v"),
        F.first("__lo_id", ignorenulls=True).over(w_next).alias("__above_id"),
    )
    # bounded: per-bucket anchor aggregates — O(#range buckets), not data-sized
    pa = p.join(F.broadcast(anchors), "__b", "left")
    in_bucket = p.join(r, "__b").select(
        "__pid", "__pv", F.col("__rid").alias("__cid"), F.col("__rv").alias("__cv")
    )
    below = pa.filter(F.col("__below_v").isNotNull()).select(
        "__pid", "__pv",
        F.col("__below_id").alias("__cid"), F.col("__below_v").alias("__cv"),
    )
    above = pa.filter(F.col("__above_v").isNotNull()).select(
        "__pid", "__pv",
        F.col("__above_id").alias("__cid"), F.col("__above_v").alias("__cv"),
    )
    cand = in_bucket.unionAll(below).unionAll(above)
    w_pick = Window.partitionBy("__pid").orderBy(
        F.abs(F.col("__pv") - F.col("__cv")), "__cv", "__cid"
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w_pick))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__pid").alias(probe_id),
            F.col("__pv").alias(probe_val),
            F.col("__cid").alias("nn_id"),
            F.col("__cv").alias("nn_val"),
            F.abs(F.col("__pv") - F.col("__cv")).alias("nn_dist"),
        )
    )
