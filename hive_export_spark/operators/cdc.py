"""CDC / upsert operators: MERGE INTO semantics without a table format.

The reference conduit is append-only (export streams never update), but a
warehouse fed by it needs upserts downstream. Without Delta/Iceberg jars,
MERGE is emulated with pure DataFrame algebra — the classic pattern:

    merged = updates ∪ (target ⟕anti updates)        (last-write-wins upsert)
    scd2   = close-out changed rows + append new versions (full history)

Scale shape: both are one shuffle on the merge key (the anti-join and the
union are key-partitioned); at 100 TB the target side should be bucketed
on the key so repeated merges never reshuffle it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _require_unique_keys(updates: DataFrame, key: str, op: str) -> None:
    """A CDC batch with several rows per key has no well-defined merge
    result (the left join would fan out, duplicating history); callers
    must pre-reduce (e.g. latest-per-key via a version column) first."""
    dup = (
        updates.groupBy(key)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        from hive_export_spark.engine import ExportError

        raise ExportError(
            "%s: multiple update rows share key %s=%r — reduce the batch to "
            "one row per key (e.g. latest by version) before merging",
            op, key, dup[0][0],
        )


def upsert(
    target: DataFrame, updates: DataFrame, key: str, assume_unique: bool = False
) -> DataFrame:
    """Last-write-wins upsert (MERGE INTO ... WHEN MATCHED UPDATE, WHEN NOT
    MATCHED INSERT): update rows replace target rows with the same key;
    unmatched target rows pass through.

    ``assume_unique=True`` skips the duplicate-key validation pass (one
    cheap aggregate job) when the caller guarantees one row per key."""
    if not assume_unique:
        _require_unique_keys(updates, key, "upsert")
    untouched = target.join(updates, key, "left_anti")
    return untouched.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked_cols: list[str],
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
    current_flag: str = "is_current",
    batch_time: str = "2024-06-01 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension type 2: history-preserving merge.

    - rows whose tracked columns CHANGED: the open version is closed out
      (end_col = batch_time, is_current = false) and a new open version is
      appended (effective_from = batch_time);
    - unchanged and unmatched open rows pass through;
    - brand-new keys are inserted as open versions.

    ``batch_time`` is an explicit parameter (never now()): deterministic,
    replayable — the same discipline as the reference's block replay.
    """
    _require_unique_keys(updates, key, "scd2_apply")
    bt = F.lit(batch_time).cast("timestamp")
    out_cols = [key, *tracked_cols, effective_col, end_col, current_flag]
    cur = current.filter(F.col(current_flag))
    hist = current.filter(~F.col(current_flag)).select(*out_cols)

    # tag update rows so a left join can distinguish "no update" from nulls
    upd = updates.withColumn("__m", F.lit(1)).alias("upd")
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | (~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}")))
    keys_eq = F.col(f"cur.{key}") == F.col(f"upd.{key}")

    matched = cur.alias("cur").join(upd, keys_eq, "left")
    has_update = F.col("__m").isNotNull()

    closed = matched.filter(has_update & changed).select(
        F.col(f"cur.{key}").alias(key),
        *[F.col(f"cur.{c}").alias(c) for c in tracked_cols],
        F.col(f"cur.{effective_col}").alias(effective_col),
        bt.alias(end_col),
        F.lit(False).alias(current_flag),
    )
    unchanged = matched.filter(~has_update | ~changed).select(
        F.col(f"cur.{key}").alias(key),
        *[F.col(f"cur.{c}").alias(c) for c in tracked_cols],
        F.col(f"cur.{effective_col}").alias(effective_col),
        F.col(f"cur.{end_col}").alias(end_col),
        F.lit(True).alias(current_flag),
    )
    # new open versions: changed keys + brand-new keys
    upd_side = upd.join(
        cur.select(F.col(key), *[F.col(c).alias(f"__cur_{c}") for c in tracked_cols])
        .withColumn("__cm", F.lit(1))
        .alias("curk"),
        F.col(f"upd.{key}") == F.col(f"curk.{key}"),
        "left",
    )
    upd_changed = F.lit(False)
    for c in tracked_cols:
        upd_changed = upd_changed | (
            ~F.col(f"__cur_{c}").eqNullSafe(F.col(f"upd.{c}"))
        )
    new_versions = upd_side.filter(F.col("__cm").isNull() | upd_changed).select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{c}").alias(c) for c in tracked_cols],
        bt.alias(effective_col),
        F.lit(None).cast("timestamp").alias(end_col),
        F.lit(True).alias(current_flag),
    )
    return (
        hist.unionByName(closed).unionByName(new_versions).unionByName(unchanged)
    )


def apply_changelog(
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Compact a Debezium-style changelog (I/U/D ops) to final table state.

    Latest-by-``seq_col`` op per key wins; a winning delete removes the
    key entirely (tombstone). This is the stream-compaction half of MERGE
    — the shape a CDC consumer runs over an exported change stream before
    loading a warehouse table.

    Shape: one shuffle on the key (row_number window), then a filter —
    no join at all, so it scales to any changelog volume; skewed hot keys
    split fine under AQE because per-key state is the single winning row.
    ``seq_col`` must be unique per key (changelogs carry an LSN/offset);
    ties would make "latest" nondeterministic, so the window orders by
    (seq, op) and callers should treat equal-seq input as a bug upstream.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )
