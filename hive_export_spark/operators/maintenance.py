"""Table maintenance: small-file compaction for partitioned tables.

Streaming partitioned writes (the engine's R9 path) produce one file set
per micro-batch per partition; at 100 TB with minutes-level triggers that
is millions of small files — the classic lakehouse failure mode (every
query pays per-file open cost; the namenode/listing pays per-object).
Compaction rewrites each partition into size-targeted files. The reference
never needed this (Hive streaming compacted server-side); a file-based
sink must own it.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_partitioned_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict[str, int]:
    """Rewrite a partitioned table with size-targeted files per partition.

    Reads the whole table, re-routes on the partition columns, and writes
    with maxRecordsPerFile derived from the observed bytes/row, replacing
    the table atomically (write to .compacting, then swap). Returns
    {'files_before': n, 'files_after': m}.

    Scale notes: one shuffle on the partition columns (the same shuffle a
    fresh routed write pays); AQE coalesces the output partitions so small
    partitions share tasks. For petabyte tables run per-partition-subtree
    instead of whole-table (pass a partition-scoped path).
    """

    # local-filesystem implementation: the directory swap and size probes
    # use os-level calls. For object stores / HDFS, compact per partition
    # with the same read->rewrite shape and commit via the table format.
    # Scheme handling goes through urlparse so Spark's single-slash form
    # ('file:/path') normalizes the same as 'file:///path', and any
    # non-file scheme (s3a://, hdfs://) is rejected explicitly instead of
    # slipping past a substring check into os.walk as a literal path.
    parsed = urlparse(path)
    if parsed.scheme and parsed.scheme != "file":
        raise NotImplementedError(
            "compact_partitioned_table operates on local paths; for "
            f"{path!r} use a table-format-native compaction"
        )
    if parsed.scheme == "file":
        if parsed.netloc not in ("", "localhost"):
            raise NotImplementedError(
                f"remote file URI host {parsed.netloc!r} is not local"
            )
        path = parsed.path
    backup = path.rstrip("/") + ".pre_compact"
    if os.path.exists(backup):
        raise RuntimeError(
            f"stale backup {backup!r} exists — a previous compaction did "
            "not complete; inspect and remove it (it holds the pre-swap "
            "table) before compacting again"
        )

    def count_files(p: str) -> int:
        total = 0
        for _, _, files in os.walk(p):
            total += sum(1 for f in files if not f.startswith(("_", ".")))
        return total

    files_before = count_files(path)
    if files_before == 0:
        # day-zero table (a partitioned write of zero rows leaves no data
        # files): nothing to compact, and a format load would fail schema
        # inference rather than return empty (round-8 day-zero sweep)
        return {"files_before": 0, "files_after": 0}
    df = spark.read.format(fmt).load(path)
    n_rows = df.count()
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    bytes_per_row = max(total_bytes / max(n_rows, 1), 1.0)
    records_per_file = max(int(target_file_bytes / bytes_per_row), 1)

    staging = path.rstrip("/") + ".compacting"
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(staging)
    )
    import shutil

    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(backup, path)  # restore the original table
        raise
    shutil.rmtree(backup)
    return {"files_before": files_before, "files_after": count_files(path)}
