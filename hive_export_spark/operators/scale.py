"""Scale techniques as first-class operators: skew salting and bucketed
co-located joins (SURVEY.md section 2.2 "broadcast / repartition /
bucketing for co-located joins, salting for skew").

AQE's skew-join splitting handles most skew automatically; explicit
salting remains necessary when the skewed side feeds an AGGREGATION (AQE
splits join partitions, not groupBy keys) or when a deterministic plan is
required. Bucketing removes the shuffle from repeated large-large joins:
both tables pre-hashed into the same bucket count on the join key join
bucket-to-bucket with zero exchanges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the LEFT side.

    Left rows get a random salt in [0, salt_buckets); the right side is
    replicated salt_buckets times (explode over the salt range). The join
    key becomes (key, salt), spreading each hot key over salt_buckets
    shuffle partitions. Cost: right side is replicated — use when right is
    much smaller than the skewed left (the common fact-x-dim skew shape)
    but too large to broadcast outright.

    The salt is F.rand-based (non-deterministic BY DESIGN — row placement
    only; join RESULTS are deterministic and verified in tests).

    Only inner/left-family joins are legal: right/full outer would emit a
    phantom null-extended row for every (key, salt) combination the left
    side's random salts did not hit.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left-family joins only, got {how!r} "
            "(right/full outer would produce spurious null-extended rows "
            "for unoccupied salt values)"
        )
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(salted_right, [on, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: pre-aggregate on
    (key, salt), then combine per key. The hot key's rows spread over
    salt_buckets partitions in phase 1; phase 2 merges salt_buckets
    partials per key — bounded regardless of key frequency.

    ``aggs``: {column: 'sum'|'count'|'min'|'max'} (decomposable aggregates
    only — that is what makes two-phase legal).
    """
    phase1_exprs = []
    phase2_exprs = []
    for col, kind in aggs.items():
        partial = f"__p_{col}"
        if kind == "count":
            phase1_exprs.append(F.count(col).alias(partial))
            phase2_exprs.append(F.sum(partial).alias(f"{kind}_{col}"))
        elif kind == "sum":
            phase1_exprs.append(F.sum(col).alias(partial))
            phase2_exprs.append(F.sum(partial).alias(f"{kind}_{col}"))
        elif kind == "min":
            phase1_exprs.append(F.min(col).alias(partial))
            phase2_exprs.append(F.min(partial).alias(f"{kind}_{col}"))
        elif kind == "max":
            phase1_exprs.append(F.max(col).alias(partial))
            phase2_exprs.append(F.max(partial).alias(f"{kind}_{col}"))
        else:
            raise ValueError(f"non-decomposable aggregate {kind!r}")
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partials = salted.groupBy(key, "__salt").agg(*phase1_exprs)
    return partials.groupBy(key).agg(*phase2_exprs)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sort-bucketed) catalog table.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (bucket i joins bucket i in place) — the payoff for
    every repeated large-large join on a stable key, e.g. orders x
    lineitem at 100 TB. Requires saveAsTable (bucket metadata lives in the
    catalog).
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_clustered(
    df,
    path: str,
    cluster_col: str,
    num_files: int = 16,
    fmt: str = "parquet",
) -> None:
    """Range-clustered layout: repartitionByRange + sortWithinPartitions
    on the cluster column before writing.

    Each output file then covers a narrow, mostly-disjoint value range,
    so parquet min/max footer statistics let readers skip whole row
    groups (and, with file-level stats in a table format, whole files)
    for selective predicates on the cluster column — the poor man's
    Z-ORDER for single-column access patterns like event time. The write
    costs one range shuffle; every later time-windowed scan pays
    proportionally to the window, not the table.

    Timestamps are written as INT64 micros for the duration of the write:
    Spark's default INT96 encoding carries NO min/max footer statistics,
    which would silently defeat the entire point of the layout.
    """
    spark = df.sparkSession
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        (
            df.repartitionByRange(num_files, cluster_col)
            .sortWithinPartitions(cluster_col)
            .write.mode("overwrite")
            .format(fmt)
            .save(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def bucket_spec(spark, table_name: str) -> dict | None:
    """Read a table's bucketing metadata from the catalog.

    Returns {'num_buckets': n, 'bucket_cols': [...], 'sort_cols': [...]},
    or None for an unbucketed table.
    """
    rows = spark.sql(f"DESCRIBE EXTENDED {table_name}").collect()
    info = {r.col_name.strip(): (r.data_type or "").strip() for r in rows}
    if "Num Buckets" not in info:
        return None

    def cols(v: str) -> list[str]:
        return [c.strip().strip("`") for c in v.strip("[]").split(",") if c.strip()]

    return {
        "num_buckets": int(info["Num Buckets"]),
        "bucket_cols": cols(info.get("Bucket Columns", "")),
        "sort_cols": cols(info.get("Sort Columns", "")),
    }


def rebucket_table(
    spark,
    table_name: str,
    num_buckets: int,
    bucket_cols: Sequence[str] | None = None,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> dict:
    """Bucket-count/layout evolution: rewrite a bucketed table in place.

    Bucket counts are load-bearing — co-located joins require matching
    counts — so growing a table eventually forces re-bucketing (e.g. 8
    buckets sized for last year's volume become 8 giant tasks). The rewrite
    goes through a staging table then swaps via two catalog renames
    (old -> backup, staging -> live); readers never see partial DATA, and a
    failed swap restores the backup — but the live NAME is briefly absent
    between the renames (the session catalog has no atomic two-table
    rename), so a concurrent reader can observe a transient miss and
    should retry.

    ``bucket_cols``/``sort_cols`` default to the table's current spec
    (the sort spec carries over even when ``bucket_cols`` is passed
    explicitly — pass ``sort_cols=[]`` to drop an existing sort).
    Evolution tip: re-bucket to a MULTIPLE of the old count and peers that
    still carry the old count keep shuffle-free joins with the new table
    under spark.sql.bucketing.coalesceBucketsInJoin.enabled.

    Exactly one full-table shuffle (the bucketing hash itself) — the same
    cost a fresh bucketed write pays; nothing is collected driver-side.
    """
    spec = bucket_spec(spark, table_name)
    if bucket_cols is None:
        if spec is None:
            raise ValueError(
                f"{table_name} is not bucketed; pass bucket_cols to bucket it"
            )
        bucket_cols = spec["bucket_cols"]
    if sort_cols is None and spec is not None and spec["sort_cols"]:
        sort_cols = spec["sort_cols"]
    staging = f"{table_name}__rebucketing"
    backup = f"{table_name}__pre_rebucket"
    if spark.catalog.tableExists(backup):
        raise RuntimeError(
            f"stale backup table {backup!r} exists — a previous rebucket "
            "did not complete; inspect and drop it before re-running"
        )
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    write_bucketed(
        spark.table(table_name), staging, bucket_cols, num_buckets, sort_cols, fmt
    )
    # swap via rename-to-backup (mirrors compact_partitioned_table): the
    # live name always resolves to the old table or the new one; on a
    # failed swap the backup is restored, never dropped first
    spark.sql(f"ALTER TABLE {table_name} RENAME TO {backup}")
    try:
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table_name}")
    except Exception:
        spark.sql(f"ALTER TABLE {backup} RENAME TO {table_name}")
        raise
    spark.sql(f"DROP TABLE {backup}")
    return {
        "num_buckets_before": spec["num_buckets"] if spec else 0,
        "num_buckets_after": num_buckets,
        "bucket_cols": list(bucket_cols),
    }

def write_zordered(
    df,
    path: str,
    cols: tuple[str, str],
    num_files: int = 16,
    bits: int = 12,
    fmt: str = "parquet",
) -> None:
    """Z-order (Morton-curve) clustered layout over TWO key columns.

    Range clustering (``write_clustered``) serves one access dimension;
    interleaving the bits of two scaled keys gives every file partial
    locality in BOTH, so parquet min/max footer stats prune selective
    predicates on either column (or both) — the layout Delta/Iceberg call
    Z-ORDER, built here from plain column expressions.

    Each key is min-max scaled to ``bits`` bits (the 1-row min/max
    aggregate is the only driver read), then interleaved with
    shiftleft/bitwiseAND — pure codegen, no UDF. The write costs one
    range shuffle on the z-value; selective scans then read
    O(selectivity) row groups instead of the whole table. At 100 TB the
    same expression feeds a table-format OPTIMIZE ZORDER rewrite.
    """
    a, b = cols
    stats = df.agg(
        F.min(a).alias("amin"),
        F.max(a).alias("amax"),
        F.min(b).alias("bmin"),
        F.max(b).alias("bmax"),
    ).first()
    top = (1 << bits) - 1

    def scaled(col: str, lo, hi):
        # day-zero guard: min/max over an EMPTY frame are NULL — scale
        # against a degenerate [0, 0] range so the (empty) write still
        # runs instead of crashing on int(None) (round-8 day-zero sweep)
        lo = int(lo) if lo is not None else 0
        hi = int(hi) if hi is not None else 0
        rng = float(max(hi - lo, 1))
        raw = ((F.col(col) - F.lit(lo)).cast("double") * top / F.lit(rng))
        return F.least(F.lit(top).cast("long"), raw.cast("long"))

    sa, sb = scaled(a, stats["amin"], stats["amax"]), scaled(b, stats["bmin"], stats["bmax"])
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate((sa, sb)):
            bit = F.shiftrightunsigned(s, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("long"), i * 2 + j)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def equidepth_bucketize(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    accuracy: int = 10000,
) -> DataFrame:
    """Equi-depth binning WITHOUT a global sort — the 100 TB shape of
    ``agg_histogram_equidepth``.

    The exact variant (ntile over a total order) is a global-sort window:
    correct, and the correctness oracle at test scale, but a single-sort
    bottleneck at 100 TB. This one computes approximate cut points with
    ``approx_percentile`` (a mergeable sketch — ONE partial-agg pass, no
    sort) and assigns bins with a map-side broadcast bucketizer, so the
    whole operator is one scan + one sketch exchange of sketch-sized
    partials. Bin populations are equal up to the sketch's rank error
    (~1/accuracy relative); tests pin the deviation bound against the
    exact ntile at fixture scale.

    Returns the input plus a ``bin`` column in [1, n_bins].
    """
    fracs = [i / n_bins for i in range(1, n_bins)]
    cuts_row = df.agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(f) for f in fracs]), F.lit(accuracy)
        ).alias("cuts")
    )
    cuts = cuts_row.select(F.explode("cuts").alias("c"))
    # broadcast the (n_bins - 1)-row cut table; bin = 1 + #cuts below value
    # bounded: cuts_row is a 1-row agg holding the (n_bins-1) cut array
    joined = df.crossJoin(F.broadcast(cuts_row))
    bin_expr = (
        F.lit(1)
        + F.expr(
            f"size(filter(cuts, c -> c < {value_col}))"
        )
    ).cast("int")
    return joined.withColumn("bin", bin_expr).drop("cuts")
