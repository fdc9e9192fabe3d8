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
    return df.join(F.broadcast(bands), cond, how)
