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

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _fs_for(spark: SparkSession, path: str):
    """(FileSystem, Path) resolved through Hadoop — the SAME dispatch the
    store gates use (sources.files.fs_exists): file:/ single- and
    triple-slash URIs, bare local paths, hdfs:// and s3a:// all answer
    through the path's own filesystem."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _total_bytes(fs, jpath) -> int:
    """Total bytes under jpath in ONE driver round trip
    (``getContentSummary`` — server-side walk on HDFS, one JVM walk on
    local/object stores), for BYTE-BUDGET checks only: unlike
    :func:`_count_data_files` the total INCLUDES marker/dot files
    (_SUCCESS, leases — bytes-per-file ~0), an epsilon over-count in the
    fail-safe direction for a budget bound. The per-file iterator below
    costs 4-5 py4j round trips PER FILE (round-14 probe profile: 0.17 s
    of a warm probe's driver wall was this loop over a small centroid
    dir); budgets don't need the per-file filter, so they use this."""
    return int(fs.getContentSummary(jpath).getLength())


def _count_data_files(fs, jpath) -> tuple[int, int]:
    """(data-file count, total bytes) under jpath, recursively, skipping
    _SUCCESS/_metadata/dotfiles — one recursive listing (listFiles walks
    server-side on HDFS/object stores; no per-directory round trips)."""
    it = fs.listFiles(jpath, True)
    n = total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
            total += int(st.getLen())
    return n, total


def compact_partitioned_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    sort_within: list[str] | None = None,
    transform=None,
) -> dict[str, int]:
    """Rewrite a partitioned table with size-targeted files per partition.

    Reads the whole table, re-routes on the partition columns, and writes
    with maxRecordsPerFile derived from the observed bytes/row, replacing
    the table via rename (write to .compacting, rename the old table to
    .pre_compact, rename .compacting in, delete the backup). Returns
    {'files_before': n, 'files_after': m}.

    ``transform`` (optional ``DataFrame -> DataFrame``) is applied to the
    scan before the rewrite — the hook row-level maintenance rides on
    (the IVF store passes its tombstone anti-join here, making deletes
    physical during a rewrite the compaction already pays for). It must
    preserve the partition columns; since the whole table is rewritten
    from its output, dropped rows are REMOVED, not masked.

    Scale notes: one shuffle on the partition columns (the same shuffle a
    fresh routed write pays); AQE coalesces the output partitions so small
    partitions share tasks. For petabyte tables run per-partition-subtree
    instead of whole-table (pass a partition-scoped path).

    Filesystem notes: every file operation dispatches through Hadoop's
    FileSystem on the path's OWN scheme (r9 verdict ask #7 — previously
    local-only), so hdfs:// tables compact with atomic per-directory
    renames. On rename-as-copy object stores (s3a://) the swap is
    correct but not atomic and the copies cost O(table) — prefer a
    table-format-native rewrite (Iceberg rewrite_data_files / Delta
    OPTIMIZE) there, or route writes through sinks/catalog_table.py and
    compact per partition subtree to bound the copy window.
    """
    fs, jpath = _fs_for(spark, path)
    if not fs.exists(jpath):
        # nothing ever written here (a sink that has not produced its
        # first batch): nothing to compact — same contract as the
        # zero-file table below
        return {"files_before": 0, "files_after": 0}
    backup = fs.makeQualified(
        spark._jvm.org.apache.hadoop.fs.Path(
            path.rstrip("/") + ".pre_compact"
        )
    )
    if fs.exists(backup):
        raise RuntimeError(
            f"stale backup {backup.toString()!r} exists — a previous "
            "compaction did not complete; inspect and remove it (it holds "
            "the pre-swap table) before compacting again"
        )

    files_before, total_bytes = _count_data_files(fs, jpath)
    if files_before == 0:
        # day-zero table (a partitioned write of zero rows leaves no data
        # files): nothing to compact, and a format load would fail schema
        # inference rather than return empty (round-8 day-zero sweep)
        return {"files_before": 0, "files_after": 0}
    df = spark.read.format(fmt).load(path)
    if transform is not None:
        df = transform(df)
    n_rows = df.count()
    bytes_per_row = max(total_bytes / max(n_rows, 1), 1.0)
    records_per_file = max(int(target_file_bytes / bytes_per_row), 1)

    staging_str = path.rstrip("/") + ".compacting"
    routed = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_within:
        # restore a within-partition clustering the table's readers rely
        # on (e.g. the IVF exact tier's id-sort, which appends interleave
        # across files until row-group pruning degrades): sorting inside
        # the already-routed partitions costs no extra shuffle. The sort
        # MUST lead with the partition columns: FileFormatWriter requires
        # input ordered by them and inserts its own NON-STABLE sort when
        # the incoming ordering does not lead with them — which would
        # silently destroy sort_within (probed round 11).
        routed = routed.sortWithinPartitions(
            *[F.col(c) for c in (*partition_cols, *sort_within)]
        )
    (
        routed
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(staging_str)
    )
    staging = fs.makeQualified(
        spark._jvm.org.apache.hadoop.fs.Path(staging_str)
    )
    qpath = fs.makeQualified(jpath)
    if not fs.rename(qpath, backup):
        raise RuntimeError(f"could not move {path!r} aside for the swap")
    # The second rename can fail BOTH ways: a False return (destination
    # exists, generic refusal) and a thrown IOException (HDFS safemode,
    # permissions, s3a transport errors — surfaced as Py4JJavaError).
    # Either way the table is already moved aside to .pre_compact, so the
    # original MUST be restored before propagating, or the table path is
    # left empty (r10 advisory #2; the pre-Hadoop local implementation
    # caught OSError and restored — this is the same contract through
    # the FileSystem API).
    try:
        swapped = fs.rename(staging, qpath)
    except Exception:
        fs.rename(backup, qpath)  # restore the original table
        raise
    if not swapped:
        fs.rename(backup, qpath)  # restore the original table
        raise RuntimeError(
            f"could not move compacted table into place at {path!r}"
        )
    fs.delete(backup, True)
    files_after, _ = _count_data_files(fs, qpath)
    return {"files_before": files_before, "files_after": files_after}

