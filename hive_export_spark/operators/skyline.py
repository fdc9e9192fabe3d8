"""Pareto-skyline (maximal-vector) operator.

Returns every row not strictly dominated on a (minimize, maximize)
criterion pair — the classic skyline query (Borzsony/Kossmann/Stocker,
ICDE'01) that product-search and multi-objective ranking workloads run
over exported relational data.

Two-phase distributed shape:

1. **Local prune (superset filter, no shuffle).** Within each input
   partition, sort by (min_col asc, max_col desc) and drop any row whose
   preceding-rows running max of ``max_col`` strictly exceeds its own —
   such a row is dominated by a partition-mate and can never be in the
   global skyline. This is conservative on ties (equal ``max_col`` with
   smaller ``min_col`` is resolved in phase 2), so the survivor set is a
   strict superset of the skyline. At 100 TB this is the phase that does
   the work: survivors per partition are bounded by the partition's own
   skyline, typically orders of magnitude smaller than the partition.
2. **Global exact sweep on survivors.** Aggregate survivors to one row
   per ``min_col`` value (the per-value best ``max_col``), run an
   unpartitioned running max over the *distinct sorted values* (the
   survivor value set is skyline-sized — the same bounded-driver-state
   precedent as the prefix-sum bucket totals), and keep exactly the rows
   that are (a) best at their ``min_col`` value and (b) not beaten-or-met
   by any strictly smaller ``min_col`` value. Duplicate rows that tie on
   both criteria are all kept (strict dominance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Rows of ``df`` not strictly dominated on (min ``min_col``,
    max ``max_col``). Preserves the input schema."""
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.col(min_col).asc(), F.col(max_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    survivors = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__pmax", F.max(max_col).over(w_local))
        .filter(
            F.col("__pmax").isNull() | (F.col("__pmax") <= F.col(max_col))
        )
        .drop("__pid", "__pmax")
    )
    per_value = survivors.groupBy(min_col).agg(
        F.max(max_col).alias("__vbest")
    )
    w_sweep = (
        Window.orderBy(F.col(min_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_value.withColumn("__prior", F.max("__vbest").over(w_sweep))
        .filter(F.col("__prior").isNull() | (F.col("__prior") < F.col("__vbest")))
        .select(
            F.col(min_col).alias("__fmin"), F.col("__vbest").alias("__fmax")
        )
    )
    return (
        survivors.join(
            # bounded: dominance frontier — one row per distinct min-col value surviving the strict-increase filter
            F.broadcast(frontier),
            (F.col(min_col) == F.col("__fmin"))
            & (F.col(max_col) == F.col("__fmax")),
        )
        .select(*df.columns)
    )
