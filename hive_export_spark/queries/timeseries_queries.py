"""Time-series analytics over the events stream table: gap-filled
continuous series, hypertable-style two-level rollups, and event funnels.

These are the batch faces of the time-series operator family the
reference's export stream feeds downstream (hive-export ships events out;
consumers run exactly these shapes on what lands). Bucketing is integer
epoch arithmetic — identical in Spark and DuckDB at any timestamp
precision (the fixture's nanosecond ts included), unlike date_trunc whose
sub-second semantics differ across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_export_spark.registry import register
from hive_export_spark.sources import load_table

# 15-minute buckets over the fixture's event month (fixed range keeps the
# spine deterministic across engines; out-of-range rows are filtered on
# both sides)
_BUCKET_S = 900
_SPINE_LO = "2024-01-01 00:00:00"
_SPINE_HI = "2024-01-31 00:00:00"
_EPOCH_LO = 1704067200  # epoch of _SPINE_LO (UTC)
_EPOCH_HI = 1706659200  # epoch of _SPINE_HI (UTC)


@register(
    "ts_gap_fill_locf",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS bucket_value
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), spine AS (
  SELECT t.event_type, s.bucket_epoch
  FROM (SELECT DISTINCT event_type FROM events
        WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}') t
  CROSS JOIN (
    SELECT unnest(generate_series({_EPOCH_LO}, {_EPOCH_HI} - {_BUCKET_S}, {_BUCKET_S})) AS bucket_epoch
  ) s
)
SELECT sp.event_type, CAST(sp.bucket_epoch AS BIGINT) AS bucket_epoch,
       COALESCE(CAST(last_value(b.bucket_value IGNORE NULLS) OVER (
           PARTITION BY sp.event_type ORDER BY sp.bucket_epoch
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE),
         0.0) AS value_locf,
       CASE WHEN b.bucket_value IS NULL THEN 1 ELSE 0 END AS was_gap
FROM spine sp
LEFT JOIN buckets b
  ON b.event_type = sp.event_type AND b.bucket_epoch = sp.bucket_epoch
""",
    doc="gap-filled continuous series: 15-minute sum(value) per event "
    "type over a generated dense time spine, empty buckets filled by "
    "last-observation-carried-forward (last(ignorenulls) running window) "
    "— the hypertable gap_fill/locf primitive. The spine is "
    "sequence()-generated per type (rows = types x buckets, never a "
    "fact-sized cross join); decimal bucket sums keep LOCF values "
    "hash-identical across engines.",
)
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"),
                  F.col("value").cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("bucket_value"))
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(1).select(
                    F.explode(
                        F.sequence(
                            F.lit(_EPOCH_LO).cast("long"),
                            F.lit(_EPOCH_HI - _BUCKET_S).cast("long"),
                            F.lit(_BUCKET_S).cast("long"),
                        )
                    ).alias("bucket_epoch")
                )
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(buckets, ["event_type", "bucket_epoch"], "left")
        .select(
            "event_type",
            "bucket_epoch",
            F.coalesce(
                F.last("bucket_value", ignorenulls=True).over(w).cast("double"),
                F.lit(0.0),
            ).alias("value_locf"),
            F.when(F.col("bucket_value").isNull(), 1).otherwise(0).alias("was_gap"),
        )
    )


@register(
    "ts_rollup_two_level",
    oracle=f"""
WITH minute_rollup AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) AS minute_epoch,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(12,2))) AS sum_v,
         MIN(CAST(value AS DECIMAL(12,2))) AS min_v,
         MAX(CAST(value AS DECIMAL(12,2))) AS max_v
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(floor(minute_epoch / 3600) * 3600 AS BIGINT) AS hour_epoch,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(sum_v) AS DOUBLE) AS sum_value,
       CAST(MIN(min_v) AS DOUBLE) AS min_value,
       CAST(MAX(max_v) AS DOUBLE) AS max_value
FROM minute_rollup
GROUP BY 1, 2
""",
    doc="two-level hypertable rollup: minute-grain partial aggregates "
    "re-aggregated to hour grain FROM THE MINUTE PARTIALS (sum-of-sums, "
    "min-of-mins) — the continuous-aggregate pattern where coarse rollups "
    "derive from fine ones without touching raw data again; only "
    "decomposable aggregates, so level 2 reads rollup-sized input "
    "(1/60th) instead of the fact table. Both levels bucket with "
    "floor() on BOTH engines — a DuckDB `//` truncates toward zero "
    "and lands a pre-epoch (negative-epoch, corrupt-clock) minute in "
    "the wrong hour (round-7 wave 8)",
)
def ts_rollup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    minute = F.floor(F.unix_timestamp("ts") / 60).cast("long") * 60
    v = F.col("value").cast("decimal(12,2)")
    minute_rollup = (
        ev.select("event_type", minute.alias("minute_epoch"), v.alias("__v"))
        .groupBy("event_type", "minute_epoch")
        .agg(
            F.count("*").alias("n"),
            F.sum("__v").alias("sum_v"),
            F.min("__v").alias("min_v"),
            F.max("__v").alias("max_v"),
        )
    )
    hour = (F.floor(F.col("minute_epoch") / 3600).cast("long") * 3600)
    return (
        minute_rollup.groupBy("event_type", hour.alias("hour_epoch"))
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("sum_v").cast("double").alias("sum_value"),
            F.min("min_v").cast("double").alias("min_value"),
            F.max("max_v").cast("double").alias("max_value"),
        )
    )


@register(
    "ts_funnel_three_stage",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click_after,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase_after
""",
    doc="three-stage ordered funnel (signup -> later click -> later "
    "purchase): each stage is a per-user MIN over the fact filtered by "
    "the previous stage's timestamp — stage joins are user-keyed "
    "aggregates (dim-sized), the fact is scanned with a pushed "
    "event_type filter per stage, never self-joined row-to-row",
)
def ts_funnel_three_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").cast("bigint").alias("n_signup"))
        # bounded: global no-key .agg() — exactly 1 row per funnel stage
        .crossJoin(s2.agg(F.count("*").cast("bigint").alias("n_click_after")))
        # bounded: global no-key .agg() — exactly 1 row
        .crossJoin(s3.agg(F.count("*").cast("bigint").alias("n_purchase_after")))
    )


@register(
    "ts_sessionize_batch",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(is_new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM ordered
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS session_start_epoch,
       CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT)
         AS duration_floor_s
FROM numbered
GROUP BY user_id, session_no
""",
    doc="batch sessionization by inactivity gap (30 min): lag() marks "
    "session starts, a running sum numbers sessions, one aggregate "
    "yields per-session stats — the batch twin of the streaming session "
    "window (streaming/pipeline.py session_window), same gap semantics, "
    "verifiable against plain SQL. One shuffle on user_id serves the "
    "window AND the aggregate (same partitioning); event_id breaks "
    "same-timestamp ordering ties deterministically. Gap math runs on "
    "exact microsecond epochs: second-truncated epochs disagree across "
    "engines on gaps that straddle the threshold by a fraction.",
)
def ts_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    epoch_us = F.unix_micros("ts")
    prev_us = F.lag(epoch_us).over(w)
    new_sess = F.when(
        prev_us.isNull() | ((epoch_us - prev_us) > 1_800_000_000), 1
    ).otherwise(0)
    return (
        ev.select("user_id", "ts", "event_id", new_sess.alias("is_new_session"))
        .withColumn("session_no", F.sum("is_new_session").over(run))
        .groupBy("user_id", F.col("session_no").cast("bigint").alias("session_no"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.floor(F.unix_micros(F.min("ts")) / 1_000_000)
            .cast("bigint")
            .alias("session_start_epoch"),
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / 1_000_000
            )
            .cast("bigint")
            .alias("duration_floor_s"),
        )
    )


@register(
    "ts_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         CAST(floor(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_week
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week
           AS weeks_since
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_week, weeks_since,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity
GROUP BY cohort_week, weeks_since
""",
    doc="retention cohort matrix: users grouped by first-seen week, "
    "distinct active users per (cohort, weeks-since-cohort) cell — the "
    "standard growth-analytics triangle. The firsts aggregate is "
    "user-dim-sized and re-joins the fact on user_id; DISTINCT "
    "deduplicates within cells before the final count, two shuffles "
    "total (user_id, then the cell key). Retention requires identity: "
    "anonymous (NULL user_id) events are excluded by an EXPLICIT "
    "filter on both engines — without it Spark's window partitionBy "
    "keeps a NULL pseudo-cohort while the oracle's equi-join drops it "
    "(NULL never equals NULL; round-7 NULL-key wave).",
)
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    week = (F.floor(F.unix_timestamp("ts") / 604800)).cast("bigint")
    # first-seen week via a user-partitioned window MIN: one fact scan
    # and one user_id shuffle (an aggregate-and-rejoin would scan the
    # fact twice for the same partitioning)
    cohort = (
        F.floor(
            F.unix_timestamp(F.min("ts").over(Window.partitionBy("user_id")))
            / 604800
        )
    ).cast("bigint")
    activity = ev.select(
        "user_id",
        cohort.alias("cohort_week"),
        (week - cohort).alias("weeks_since"),
    ).distinct()
    return activity.groupBy("cohort_week", "weeks_since").agg(
        F.count("*").cast("bigint").alias("active_users")
    )


@register(
    "ts_incremental_rollup",
    oracle="""
SELECT event_type,
       CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="incremental materialized rollup (the hypertable "
    "continuous-aggregate / IVM pattern): an hourly rollup parquet is "
    "built once from the historical partition (ts < Jan 24), then a "
    "delta batch (ts >= Jan 24) is folded in by aggregating ONLY the "
    "delta and merging partial states (SUM of counts, SUM of decimal "
    "sums) with the stored rollup — count/sum are decomposable, so the "
    "merged result provably equals the full recompute the oracle runs. "
    "At 100 TB the refresh cost is O(delta + rollup), never a fact-table "
    "re-scan; the merge shuffles rollup-sized data (#types x #hours "
    "rows), not events.",
)
def ts_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from hive_export_spark.queries.connector_queries import scratch_dir

    base = scratch_dir("ts_ivm")
    shutil.rmtree(base, ignore_errors=True)
    split = "2024-01-24 00:00:00"
    ev = load_table(spark, "events", sf_dir)
    hour = (F.floor(F.unix_timestamp("ts") / 3600).cast("long") * 3600).alias(
        "hour_epoch"
    )

    def partial(df: DataFrame) -> DataFrame:
        # decimal partial sums: merge-safe and hash-stable across engines
        return df.groupBy("event_type", hour).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("__sum"),
        )

    # phase 1: historical rollup materialized once. The split must be
    # TOTAL over a nullable event time (wave-7 doctrine, round-9
    # all-NULL sweep): ts < split drops NULL-ts rows from BOTH phases,
    # silently losing the NULL-hour bucket the oracle's GROUP BY keeps —
    # clock-corrupt rows roll up under hour_epoch NULL with provenance
    # instead of vanishing
    partial(
        ev.filter(
            (F.col("ts") < F.lit(split).cast("timestamp"))
            | F.col("ts").isNull()
        )
    ).write.parquet(f"{base}/rollup")
    # phase 2: delta-only aggregation + partial-state merge
    delta = partial(ev.filter(F.col("ts") >= F.lit(split).cast("timestamp")))
    stored = spark.read.parquet(f"{base}/rollup")
    return (
        stored.unionByName(delta)
        .groupBy("event_type", "hour_epoch")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__sum").cast("double").alias("sum_value"),
        )
    )


@register(
    "ts_downsample_m4",
    oracle=f"""
WITH pts AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_epoch,
         value, ts, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
           ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)
           ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM events
)
SELECT event_type, bucket_epoch,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS v_first,
       MIN(CASE WHEN rn_z = 1 THEN value END) AS v_last,
       MIN(value) AS v_min,
       MAX(value) AS v_max,
       COUNT(*) AS n_points
FROM pts
GROUP BY event_type, bucket_epoch
""",
    doc="M4 downsampling (the lossless-for-rendering time-series "
    "reduction): per series x 1h bucket keep first/last/min/max — the "
    "four points a line plot of the bucket actually needs — plus the "
    "point count. Each series shrinks from its raw rate to 4 values per "
    "bucket regardless of input density, which is what makes dashboard "
    "queries over 100 TB of telemetry feasible. One shuffle on (series, "
    "bucket); first/last are deterministic via (ts, event_id) "
    "tie-breaks, min/max are comparisons not arithmetic, so every "
    "output double is bit-exact across engines.",
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    pts = ev.select(
        "event_type", bucket.alias("bucket_epoch"), "value", "ts", "event_id"
    )
    w = Window.partitionBy("event_type", "bucket_epoch")
    rn_a = F.row_number().over(w.orderBy("ts", "event_id"))
    rn_z = F.row_number().over(
        w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    flagged = pts.withColumn("rn_a", rn_a).withColumn("rn_z", rn_z)
    return flagged.groupBy("event_type", "bucket_epoch").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("v_first"),
        F.min(F.when(F.col("rn_z") == 1, F.col("value"))).alias("v_last"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.count(F.lit(1)).alias("n_points"),
    )


_EWMA_ALPHA = 0.2
_EWMA_K = 20
# Quantized finite-impulse EWMA weights: w_k = round(alpha*(1-alpha)^k * 1e9)
# as exact integers. Float pow() is evaluated ONCE here in Python and the
# resulting literals are shared verbatim by the Spark plan and the oracle
# SQL, so no runtime libm call can drift between engines; all per-bucket
# arithmetic below is decimal x integer (exact, order-insensitive) until a
# single identical double division at the end.
_EWMA_W = [int(round(_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k * 1e9)) for k in range(_EWMA_K)]


@register(
    "ts_interpolate_linear",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS bucket_value
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), spine AS (
  SELECT t.event_type, s.bucket_epoch
  FROM (SELECT DISTINCT event_type FROM events
        WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}') t
  CROSS JOIN (
    SELECT unnest(generate_series({_EPOCH_LO}, {_EPOCH_HI} - {_BUCKET_S}, {_BUCKET_S})) AS bucket_epoch
  ) s
), joined AS (
  SELECT sp.event_type, sp.bucket_epoch,
         CAST(b.bucket_value AS DOUBLE) AS v,
         CASE WHEN b.bucket_value IS NULL THEN 1 ELSE 0 END AS was_gap
  FROM spine sp
  LEFT JOIN buckets b
    ON b.event_type = sp.event_type AND b.bucket_epoch = sp.bucket_epoch
), anchored AS (
  SELECT event_type, bucket_epoch, v, was_gap,
         last_value(v IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN bucket_epoch END IGNORE NULLS)
           OVER w_prev AS pe,
         first_value(v IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN bucket_epoch END IGNORE NULLS)
           OVER w_next AS ne
  FROM joined
  WINDOW
    w_prev AS (PARTITION BY event_type ORDER BY bucket_epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY event_type ORDER BY bucket_epoch
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket_epoch,
       CAST(floor((CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           pv + (nv - pv) * (bucket_epoch - pe) / (ne - pe)
         WHEN pv IS NOT NULL THEN pv
         WHEN nv IS NOT NULL THEN nv
         ELSE 0.0 END) * 1000000) / 1000000.0 AS DOUBLE) AS value_interp,
       was_gap
FROM anchored
""",
    doc="gap-filled continuous series with LINEAR interpolation: empty "
    "15-minute buckets get the straight line between the nearest "
    "observed buckets either side (LOCF / NOCB at the series edges) — "
    "the hypertable interpolate() primitive, complementing "
    "ts_gap_fill_locf. Anchors come from last_value/first_value(IGNORE "
    "NULLS) windows over the dense spine — both directions reuse ONE "
    "partitioning (event_type), no self-join, no per-gap search. Bucket "
    "sums are exact decimals and the anchor epochs exact longs, so both "
    "engines feed bit-identical doubles into one identical interpolation "
    "expression; the result is floor-quantized to micro-units (round(6) "
    "tie conventions differ across engines on exact halves; floor of "
    "the same double cannot).",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"),
                  F.col("value").cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("bucket_value"))
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(1).select(
                    F.explode(
                        F.sequence(
                            F.lit(_EPOCH_LO).cast("long"),
                            F.lit(_EPOCH_HI - _BUCKET_S).cast("long"),
                            F.lit(_BUCKET_S).cast("long"),
                        )
                    ).alias("bucket_epoch")
                )
            )
        )
    )
    joined = (
        spine.join(buckets, ["event_type", "bucket_epoch"], "left")
        .select(
            "event_type",
            "bucket_epoch",
            F.col("bucket_value").cast("double").alias("v"),
            F.when(F.col("bucket_value").isNull(), 1).otherwise(0).alias("was_gap"),
        )
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    epoch_if_obs = F.when(F.col("v").isNotNull(), F.col("bucket_epoch"))
    anchored = joined.select(
        "event_type",
        "bucket_epoch",
        "v",
        "was_gap",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(epoch_if_obs, ignorenulls=True).over(w_prev).alias("pe"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(epoch_if_obs, ignorenulls=True).over(w_next).alias("ne"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("bucket_epoch") - F.col("pe"))
            / (F.col("ne") - F.col("pe")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .when(F.col("nv").isNotNull(), F.col("nv"))
        .otherwise(F.lit(0.0))
    )
    return anchored.select(
        "event_type",
        "bucket_epoch",
        # floor-quantize to micro-units instead of round(6): both engines
        # compute a BIT-IDENTICAL interpolation double, but their round()
        # tie conventions differ on exact .xxxxxx5 halves (Spark HALF_UP
        # on the shortest decimal string vs DuckDB on the true binary
        # value — observed 1-ULP flips in the round-6 hostile sweep);
        # floor of the same double is convention-free. x*1e6 <= ~1e14
        # stays exactly representable.
        (F.floor(interp * 1000000) / F.lit(1000000.0))
        .cast("double")
        .alias("value_interp"),
        "was_gap",
    )


@register(
    "ts_ewma_window",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS bucket_value
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), weights AS (
  SELECT unnest(range(0, {_EWMA_K})) AS k,
         unnest({_EWMA_W!r}) AS w
), contrib AS (
  SELECT b.event_type,
         b.bucket_epoch + wt.k * {_BUCKET_S} AS target_epoch,
         CAST(b.bucket_value * wt.w AS DECIMAL(38,2)) AS num_part,
         wt.w AS den_part
  FROM buckets b CROSS JOIN weights wt
), sums AS (
  SELECT c.event_type, c.target_epoch,
         SUM(c.num_part) AS num, SUM(c.den_part) AS den
  FROM contrib c
  JOIN buckets t
    ON t.event_type = c.event_type AND t.bucket_epoch = c.target_epoch
  GROUP BY 1, 2
)
SELECT event_type, CAST(target_epoch AS BIGINT) AS bucket_epoch,
       CAST(round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0 AS DOUBLE)
         AS ewma
FROM sums
""",
    doc="finite-impulse EWMA smoothing (alpha=0.2, 20-tap truncated "
    "kernel, weights renormalized over the taps actually present): "
    "per-series smoothed value at every observed 15-minute bucket. "
    "Spark side SCATTERS each bucket to the <=20 future buckets it "
    "contributes to (one narrow explode) and reduces with a single "
    "(series, target) aggregation — no per-row lookback join, no "
    "recursive dependency, so the shape is one shuffle at any scale. "
    "The quantized integer weight table (module constant, shared "
    "verbatim with the oracle) keeps every product and sum exact "
    "decimal/integer arithmetic; the only float ops are one identical "
    "division and round(6) on both engines.",
)
def ts_ewma_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"),
                  F.col("value").cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("bucket_value"))
    )
    kw = F.array(*[
        F.struct(F.lit(k).alias("k"), F.lit(w).alias("w"))
        for k, w in enumerate(_EWMA_W)
    ])
    contrib = (
        buckets.select(
            "event_type", "bucket_epoch", "bucket_value",
            F.explode(kw).alias("__kw"),
        )
        .select(
            "event_type",
            (F.col("bucket_epoch") + F.col("__kw.k") * _BUCKET_S).alias("target_epoch"),
            (F.col("bucket_value") * F.col("__kw.w"))
            .cast("decimal(38,2)")
            .alias("num_part"),
            F.col("__kw.w").alias("den_part"),
        )
    )
    targets = buckets.select(
        "event_type", F.col("bucket_epoch").alias("target_epoch")
    )
    sums = (
        contrib.join(targets, ["event_type", "target_epoch"])
        .groupBy("event_type", "target_epoch")
        .agg(F.sum("num_part").alias("num"), F.sum("den_part").alias("den"))
    )
    return sums.select(
        "event_type",
        F.col("target_epoch").cast("long").alias("bucket_epoch"),
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).cast("double").alias("ewma"),
    )


@register(
    "ts_cusum_changepoint",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), ranked AS (
  SELECT event_type, bucket_epoch, v,
         SUM(v) OVER (PARTITION BY event_type ORDER BY bucket_epoch
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_epoch) AS k,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(v) OVER (PARTITION BY event_type) AS s
  FROM buckets
), scored AS (
  SELECT event_type, bucket_epoch, n,
         n * r - k * s AS score,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(n * r - k * s) DESC, bucket_epoch) AS pick
  FROM ranked
)
SELECT event_type, bucket_epoch AS cp_epoch,
       CAST(score AS DOUBLE) AS score_scaled,
       CAST(n AS BIGINT) AS n_buckets
FROM scored WHERE pick = 1
""",
    doc="CUSUM change-point detection per series: the bucket where the "
    "cumulative deviation from the series mean peaks — the classic "
    "single-changepoint statistic argmax_k |sum_{{i<=k}}(v_i - mean)|. "
    "Computed SCALE-FREE of division: the statistic is multiplied "
    "through by n (score_k = n*R_k - k*S, same argmax), so every value "
    "is exact decimal/integer arithmetic — no mean division, no float "
    "drift, bit-identical across engines and reduction orders. Shape: "
    "one (series)-keyed aggregation plus windows sharing ONE Exchange; "
    "state per row is O(1).",
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"),
                  F.col("value").cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("v"))
    )
    w_ord = Window.partitionBy("event_type").orderBy("bucket_epoch")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("event_type")
    ranked = buckets.select(
        "event_type",
        "bucket_epoch",
        F.sum("v").over(w_run).alias("r"),
        F.row_number().over(w_ord).alias("k"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("v").over(w_all).alias("s"),
    )
    score = F.col("n") * F.col("r") - F.col("k") * F.col("s")
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(score).desc(), "bucket_epoch"
    )
    return (
        ranked.withColumn("score", score)
        .withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            "event_type",
            F.col("bucket_epoch").alias("cp_epoch"),
            F.col("score").cast("double").alias("score_scaled"),
            F.col("n").cast("bigint").alias("n_buckets"),
        )
    )


@register(
    "ts_seasonal_profile",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS INTEGER)
           AS hod,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(12,2))) AS sx
  FROM events GROUP BY 1, 2
), overall AS (
  SELECT event_type,
         SUM(n) AS n_all, SUM(sx) AS sx_all
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.hod, CAST(h.n AS BIGINT) AS n,
       CAST(round(CAST(h.sx AS DOUBLE) / h.n, 6) + 0 AS DOUBLE) AS mean_v,
       CAST(round((CAST(h.sx AS DOUBLE) / h.n) /
                  nullif(CAST(o.sx_all AS DOUBLE) / o.n_all, 0), 6) + 0
            AS DOUBLE)
         AS seasonal_idx
FROM hourly h JOIN overall o USING (event_type)
""",
    doc="seasonal profile extraction (hour-of-day decomposition): per "
    "series, the mean value at each UTC hour-of-day and its ratio to "
    "the series mean — the multiplicative seasonal index dashboards "
    "and forecasters subtract out before trend analysis. Sums are "
    "exact decimals (order-insensitive partials), so the two divisions "
    "and round(6) are the only float ops and run on bit-identical "
    "inputs in both engines. A series whose values sum to EXACTLY zero "
    "(offsetting charge/refund pairs — wave-5 hostile row) zeroes the "
    "series mean: try_divide/nullif pins seasonal_idx NULL on both "
    "engines instead of an ANSI crash (Spark) vs inf (DuckDB); the "
    "oracle's `+ 0` after round() pins +0.0 where DuckDB's round "
    "preserves IEEE -0.0 but Spark's BigDecimal round cannot. Shape: "
    "one (series, hod) partial "
    "aggregation — 24 x series rows — then the series totals derive "
    "from THOSE partials (no second scan); everything after the one "
    "shuffle is series-cardinality-sized.",
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hod = (
        (F.floor(F.unix_timestamp("ts")).cast("long") / F.lit(3600)).cast("long") % 24
    ).cast("int")
    hourly = (
        ev.select(
            "event_type",
            hod.alias("hod"),
            F.col("value").cast("decimal(12,2)").alias("__v"),
        )
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__v").alias("sx"))
    )
    overall = hourly.groupBy("event_type").agg(
        F.sum("n").alias("n_all"), F.sum("sx").alias("sx_all")
    )
    mean_v = F.col("sx").cast("double") / F.col("n")
    mean_all = F.col("sx_all").cast("double") / F.col("n_all")
    return (
        # bounded: per-event-type overall aggregates — one row per event type
        hourly.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "hod",
            F.col("n").cast("bigint").alias("n"),
            F.round(mean_v, 6).cast("double").alias("mean_v"),
            F.round(F.try_divide(mean_v, mean_all), 6)
            .cast("double")
            .alias("seasonal_idx"),
        )
    )


@register(
    "ts_attribution_last_touch",
    oracle="""
WITH stream AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         ts
  FROM events
), tagged AS (
  SELECT user_id, event_id, event_type, sec,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER w AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN sec END
                    IGNORE NULLS) OVER w AS click_sec
  FROM stream
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id AS purchase_id, click_id,
       CASE WHEN click_id IS NOT NULL THEN sec - click_sec END
         AS secs_since_click
FROM tagged WHERE event_type = 'purchase'
""",
    doc="last-touch attribution: each purchase credits the user's most "
    "recent STRICTLY-preceding click (the marketing-attribution "
    "primitive; unattributed purchases keep NULL). One user-keyed "
    "IGNORE-NULLS window over the event stream — no self-join, no "
    "per-purchase search, ONE shuffle regardless of events per user; "
    "the strict 1-PRECEDING frame pins the same-timestamp edge case "
    "identically in both engines. Latency is exact integer seconds.",
)
def ts_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("sec"),
        "ts",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    click_sec = F.last(
        F.when(F.col("event_type") == "click", F.col("sec")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("click_id", click_id)
        .withColumn("click_sec", click_sec)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "click_id",
            F.when(
                F.col("click_id").isNotNull(),
                F.col("sec") - F.col("click_sec"),
            ).alias("secs_since_click"),
        )
    )


@register(
    "ts_delta_rate",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
)
SELECT event_type, bucket_epoch,
       CAST(v - lag(v) OVER w AS DOUBLE) AS delta,
       CAST(bucket_epoch - lag(bucket_epoch) OVER w AS BIGINT) AS dt_s,
       CAST(round(CAST(v - lag(v) OVER w AS DOUBLE)
                  / (bucket_epoch - lag(bucket_epoch) OVER w), 6) + 0 AS DOUBLE)
         AS rate_per_s
FROM buckets
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_epoch)
QUALIFY lag(v) OVER w IS NOT NULL
""",
    doc="discrete derivative per series: delta and per-second rate "
    "between consecutive OBSERVED buckets (gap-aware — dt is the real "
    "spacing, not the nominal bucket width), the hypertable delta/rate "
    "primitive monitoring counters need. Deltas are exact decimal "
    "subtraction; the single rate division runs on bit-identical "
    "inputs with round(6) guarding it. One series-keyed lag window — "
    "one shuffle, O(1) state.",
)
def ts_delta_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"),
                  F.col("value").cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket_epoch")
    lv = F.lag("v").over(w)
    le = F.lag("bucket_epoch").over(w)
    return (
        buckets.withColumn("__lv", lv)
        .withColumn("__le", le)
        .filter(F.col("__lv").isNotNull())
        .select(
            "event_type",
            "bucket_epoch",
            (F.col("v") - F.col("__lv")).cast("double").alias("delta"),
            (F.col("bucket_epoch") - F.col("__le")).cast("bigint").alias("dt_s"),
            F.round(
                (F.col("v") - F.col("__lv")).cast("double")
                / (F.col("bucket_epoch") - F.col("__le")),
                6,
            ).cast("double").alias("rate_per_s"),
        )
    )


@register(
    "ts_autocorrelation",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), lagged AS (
  SELECT b.event_type, k.k, b.v AS x,
         lag(b.v, k.k) OVER (PARTITION BY b.event_type, k.k
                             ORDER BY b.bucket_epoch) AS y
  FROM buckets b CROSS JOIN (VALUES (1), (2), (3)) k(k)
), sums AS (
  SELECT event_type, k,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM lagged WHERE y IS NOT NULL
  GROUP BY event_type, k
)
SELECT event_type, CAST(k AS INTEGER) AS lag_k, CAST(n AS BIGINT) AS n,
       -- per-factor zero clamp: a FLATLINE series (constant value over
       -- real time) has exactly-zero — or float-cancelled tiny-negative
       -- — variance factors; sqrt must not raise (DuckDB) or NaN
       -- (Spark), and the /0 then NULLs the undefined acf on both
       -- engines (round-10 constant-fixture flatline extension)
       CAST(round(
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt(CASE WHEN fx < 0 THEN 0 ELSE fx END
                * CASE WHEN fy < 0 THEN 0 ELSE fy END),
         6) + 0 AS DOUBLE) AS acf
FROM (
  SELECT *,
         n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS fx,
         n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS fy
  FROM sums
)
""",
    doc="autocorrelation function (lags 1-3) per series over 15-minute "
    "buckets: the seasonality/persistence fingerprint forecasting "
    "pipelines read first. Lagged pairs come from lag(v, k) windows "
    "(the three literal-offset lags unroll into one union over the "
    "same series-keyed sort — rows multiply, shuffles do not); all five "
    "co-moment sums are EXACT decimals, so the Pearson formula's float "
    "ops run on bit-identical inputs in both engines, round(6)-"
    "guarded. At 100 TB this is the mergeable-co-moment pattern of "
    "agg_corr_regression applied per (series, lag).",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"),
                  F.col("value").cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("v"))
    )
    # Spark's lag() offset must be a literal, so the three lags unroll
    # into one union over the SAME (event_type)-keyed sort — Catalyst
    # reuses the exchange; rows multiply, shuffles do not.
    w = Window.partitionBy("event_type").orderBy("bucket_epoch")
    parts = [
        buckets.select(
            "event_type",
            F.lit(k).cast("int").alias("k"),
            F.col("v").alias("x"),
            F.lag("v", k).over(w).alias("y"),
        )
        for k in (1, 2, 3)
    ]
    lagged = parts[0].unionAll(parts[1]).unionAll(parts[2]).filter(
        F.col("y").isNotNull()
    )
    sums = lagged.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    # per-factor zero clamp + try_divide: flatline series have zero (or
    # float-cancelled tiny-negative) variance factors — the acf is
    # undefined there, NULL on both engines (round-10 constant sweep)
    fx = n * sxx - sx * sx
    fy = n * syy - sy * sy
    acf = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(
            F.when(fx < 0, F.lit(0.0)).otherwise(fx)
            * F.when(fy < 0, F.lit(0.0)).otherwise(fy)
        ),
    )
    return sums.select(
        "event_type",
        F.col("k").cast("int").alias("lag_k"),
        n.cast("bigint").alias("n"),
        F.round(acf, 6).cast("double").alias("acf"),
    )


@register(
    "ts_linear_forecast",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_epoch) AS t,
         MAX(bucket_epoch) OVER (PARTITION BY event_type) AS last_epoch
  FROM buckets
), fit AS (
  SELECT event_type, MAX(last_epoch) AS last_epoch,
         COUNT(*) AS n, SUM(t) AS st, SUM(t * t) AS stt,
         SUM(v) AS sv, SUM(t * v) AS stv
  FROM idx GROUP BY event_type
), coefs AS (
  SELECT event_type, last_epoch, n,
         (n * CAST(stv AS DOUBLE) - st * CAST(sv AS DOUBLE))
           / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st) AS slope,
         (CAST(sv AS DOUBLE) - (n * CAST(stv AS DOUBLE) - st * CAST(sv AS DOUBLE))
            / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st) * st) / n
           AS intercept
  FROM fit
)
SELECT c.event_type,
       CAST(c.last_epoch + h.h * {_BUCKET_S} AS BIGINT) AS forecast_epoch,
       CAST(h.h AS INTEGER) AS horizon,
       CAST(round(c.intercept + c.slope * (c.n + h.h), 6) + 0 AS DOUBLE)
         AS forecast
FROM coefs c CROSS JOIN (VALUES (1), (2), (3)) h(h)
""",
    doc="linear-trend forecast per series: OLS slope/intercept fitted "
    "over the bucket index (t = 1..n) from EXACT decimal/integer "
    "co-moment sums, extrapolated 1-3 buckets ahead — the baseline "
    "forecaster every capacity dashboard starts with. The fit sums "
    "are partial-mergeable (one shuffle to series cardinality); slope "
    "and intercept are identical float expressions over bit-identical "
    "inputs on both engines, round(6)-guarded. Horizon expansion is a "
    "3-row broadcast.",
)
def ts_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"),
                  F.col("value").cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("v"))
    )
    w_t = Window.partitionBy("event_type").orderBy("bucket_epoch")
    w_all = Window.partitionBy("event_type")
    idx = buckets.select(
        "event_type",
        "v",
        F.row_number().over(w_t).alias("t"),
        F.max("bucket_epoch").over(w_all).alias("last_epoch"),
    )
    fit = idx.groupBy("event_type").agg(
        F.max("last_epoch").alias("last_epoch"),
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum("v").alias("sv"),
        F.sum(F.col("t") * F.col("v")).alias("stv"),
    )
    n = F.col("n")
    st = F.col("st").cast("double")
    stt = F.col("stt").cast("double")
    sv = F.col("sv").cast("double")
    stv = F.col("stv").cast("double")
    # try_divide: a day-one single-bucket series has zero t-variance
    # (n*stt - st^2 = 0) — the least-squares slope is undefined; DuckDB /
    # yields NULL there, ANSI Spark crashes (round-8 single-row sweep)
    slope = F.try_divide(n * stv - st * sv, n * stt - st * st)
    coefs = fit.select(
        "event_type",
        "last_epoch",
        "n",
        slope.alias("slope"),
        ((sv - slope * st) / n).alias("intercept"),
    )
    hs = spark.range(1, 4).select(F.col("id").cast("int").alias("h"))
    return (
        # bounded: hs is spark.range(1, 4) — a literal 3-row horizon table
        coefs.crossJoin(F.broadcast(hs))
        .select(
            "event_type",
            (F.col("last_epoch") + F.col("h") * _BUCKET_S)
            .cast("bigint")
            .alias("forecast_epoch"),
            F.col("h").cast("int").alias("horizon"),
            F.round(
                F.col("intercept") + F.col("slope") * (F.col("n") + F.col("h")), 6
            ).cast("double").alias("forecast"),
        )
    )


@register(
    "ts_bollinger_bands",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), framed AS (
  SELECT event_type, bucket_epoch,
         SUM(v) OVER w AS sx,
         SUM(v * v) OVER w AS sxx,
         COUNT(*) OVER w AS n
  FROM buckets
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_epoch
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket_epoch, CAST(n AS BIGINT) AS n_window,
       CAST(round(CAST(sx AS DOUBLE) / n, 6) AS DOUBLE) AS mid,
       CAST(round(CAST(sx AS DOUBLE) / n
                  + 2 * sqrt(greatest(CAST(sxx AS DOUBLE) / n
                             - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0)),
                  6) AS DOUBLE) AS upper_band,
       CAST(round(CAST(sx AS DOUBLE) / n
                  - 2 * sqrt(greatest(CAST(sxx AS DOUBLE) / n
                             - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0)),
                  6) + 0 AS DOUBLE) AS lower_band
FROM framed
""",
    doc="Bollinger bands (20-bucket trailing mean +/- 2 population sigma) "
    "per series: the volatility envelope, computed from DECIMAL frame "
    "sums (sum and sum-of-squares over a ROWS frame are exact and "
    "order-free), so both engines feed bit-identical doubles into the "
    "identical mean/sigma expressions; round(6) guards the output. One "
    "series-keyed sort, O(1) running state — the same frame machinery "
    "as window_sliding_avg, upgraded to second-moment envelopes.",
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"),
                  F.col("value").cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("v"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(-19, Window.currentRow)
    )
    framed = buckets.select(
        "event_type",
        "bucket_epoch",
        F.sum("v").over(w).alias("sx"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("sxx"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    mean = F.col("sx").cast("double") / F.col("n")
    # variance can float-round to a tiny negative on near-constant
    # frames (DuckDB sqrt raises on negatives; Spark returns NaN) —
    # clamp identically on both sides
    sigma = F.sqrt(
        F.greatest(
            F.col("sxx").cast("double") / F.col("n") - mean * mean,
            F.lit(0.0),
        )
    )
    return framed.select(
        "event_type",
        "bucket_epoch",
        F.col("n").cast("bigint").alias("n_window"),
        F.round(mean, 6).cast("double").alias("mid"),
        F.round(mean + 2 * sigma, 6).cast("double").alias("upper_band"),
        F.round(mean - 2 * sigma, 6).cast("double").alias("lower_band"),
    )


@register(
    "ts_flatline_runs",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         COUNT(*) AS n_events
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), flagged AS (
  SELECT event_type, bucket_epoch, n_events,
         CASE WHEN lag(n_events) OVER w IS NULL
                OR lag(n_events) OVER w <> n_events THEN 1 ELSE 0 END
           AS new_run
  FROM buckets
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_epoch)
), runs AS (
  SELECT event_type, bucket_epoch, n_events,
         SUM(new_run) OVER (PARTITION BY event_type ORDER BY bucket_epoch
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_id
  FROM flagged
)
SELECT event_type,
       CAST(MIN(bucket_epoch) AS BIGINT) AS run_start_epoch,
       CAST(n_events AS BIGINT) AS stuck_value,
       COUNT(*) AS run_len
FROM runs
GROUP BY event_type, run_id, n_events
HAVING COUNT(*) >= 4
""",
    doc="flatline/stuck-sensor detection: maximal runs of consecutive "
    "buckets with an IDENTICAL reading (per-bucket event count — exact "
    "integers, so run boundaries are unambiguous), reported when the "
    "run reaches 4+ buckets (an hour of identical telemetry = a stuck "
    "pipeline, the DQ smell rule suites can't express). Gaps-and-"
    "islands via lag + running sum — the same one-shuffle machinery as "
    "sessionization, applied to value-equality instead of time "
    "proximity.",
)
def ts_flatline_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S)
    buckets = (
        ev.select("event_type", bucket.alias("bucket_epoch"))
        .groupBy("event_type", "bucket_epoch")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket_epoch")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lagv = F.lag("n_events").over(w)
    flagged = buckets.withColumn(
        "new_run",
        F.when(lagv.isNull() | (lagv != F.col("n_events")), 1).otherwise(0),
    )
    runs = flagged.withColumn("run_id", F.sum("new_run").over(w_run))
    return (
        runs.groupBy("event_type", "run_id", "n_events")
        .agg(
            F.min("bucket_epoch").cast("bigint").alias("run_start_epoch"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .filter(F.col("run_len") >= 4)
        .select(
            "event_type",
            "run_start_epoch",
            F.col("n_events").cast("bigint").alias("stuck_value"),
            "run_len",
        )
    )


@register(
    "ts_rolling_corr",
    oracle=f"""
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS sv
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
    AND event_type IN ('click', 'purchase')
  GROUP BY 1, 2
), xy AS (
  SELECT c.bucket_epoch, c.sv AS x, p.sv AS y
  FROM (SELECT * FROM b WHERE event_type = 'click') c
  JOIN (SELECT * FROM b WHERE event_type = 'purchase') p USING (bucket_epoch)
), w AS (
  SELECT bucket_epoch,
         COUNT(*)  OVER win AS n,
         SUM(x)    OVER win AS sx,
         SUM(y)    OVER win AS sy,
         SUM(x*x)  OVER win AS sxx,
         SUM(y*y)  OVER win AS syy,
         SUM(x*y)  OVER win AS sxy
  FROM xy
  WINDOW win AS (ORDER BY bucket_epoch ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT bucket_epoch,
       -- per-factor zero clamp: a flatline frame's variance factor is
       -- exactly 0 (or float-cancels tiny-negative); sqrt must not
       -- raise, the /0 NULLs the undefined correlation on both engines
       -- (round-10 constant-fixture flatline extension)
       CAST(round(
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt(CASE WHEN fx < 0 THEN 0 ELSE fx END
                  * CASE WHEN fy < 0 THEN 0 ELSE fy END), 6) + 0
         AS DOUBLE) AS corr_r
FROM (
  SELECT *,
         n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS fx,
         n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS fy
  FROM w
) WHERE n = 24
""",
    doc="rolling 24-bucket (6-hour) Pearson correlation between the "
    "click and purchase per-bucket volume series — the co-movement "
    "screen behind metric-drift alerting. All six rolling moments are "
    "EXACT decimal window sums (order-insensitive within the frame), "
    "with only the final correlation computed in double via the same "
    "operand order on both engines. Scale shape: the raw stream folds "
    "to per-bucket sums first (one partial-agg exchange); every window "
    "after that runs over the BUCKET table (range/bucket-count-sized, "
    "~2.9k rows/month regardless of event volume), so the unpartitioned "
    "ordered frame never touches data-sized input.",
)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
        & F.col("event_type").isin("click", "purchase")
    )
    bucket = F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S
    b = (
        ev.select(
            "event_type",
            bucket.alias("bucket_epoch"),
            F.col("value").cast("decimal(12,2)").alias("__v"),
        )
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("sv"))
    )
    c = b.where(F.col("event_type") == "click").select(
        "bucket_epoch", F.col("sv").alias("x")
    )
    p = b.where(F.col("event_type") == "purchase").select(
        "bucket_epoch", F.col("sv").alias("y")
    )
    xy = c.join(p, "bucket_epoch")
    win = Window.orderBy("bucket_epoch").rowsBetween(-23, 0)
    x, y = F.col("x"), F.col("y")
    w = xy.select(
        "bucket_epoch",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum(x).over(win).alias("sx"),
        F.sum(y).over(win).alias("sy"),
        F.sum(x * x).over(win).alias("sxx"),
        F.sum(y * y).over(win).alias("syy"),
        F.sum(x * y).over(win).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    # per-factor zero clamp + try_divide: flatline frames have zero (or
    # float-cancelled tiny-negative) variance — correlation undefined,
    # NULL on both engines (round-10 constant sweep)
    fx = n * sxx - sx * sx
    fy = n * syy - sy * sy
    corr = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(
            F.when(fx < 0, F.lit(0.0)).otherwise(fx)
            * F.when(fy < 0, F.lit(0.0)).otherwise(fy)
        ),
    )
    return w.where(n == 24).select(
        "bucket_epoch",
        F.round(corr, 6).cast("double").alias("corr_r"),
    )


@register(
    "ts_markov_transitions",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM o WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT prev_type, SUM(n) AS n_from FROM pairs GROUP BY prev_type
)
SELECT p.prev_type, p.next_type, CAST(p.n AS BIGINT) AS n,
       CAST(round(CAST(p.n AS DOUBLE) / t.n_from, 6) AS DOUBLE) AS p_r
FROM pairs p JOIN tot t USING (prev_type)
""",
    doc="first-order Markov transition matrix over per-user event "
    "sequences: LAG within each user's (ts, event_id)-ordered stream "
    "(the id tiebreak makes the order total, hence deterministic on "
    "both engines), pair counts, and row-normalized transition "
    "probabilities — the product-analytics building block behind "
    "next-action prediction and session modeling. Scale shape: one "
    "shuffle to partition by user (windows stay user-local — no global "
    "sort), then the pair aggregate folds to a "
    "|event types|^2-row matrix; the row-total join is a broadcast "
    "of a type-cardinality table.",
)
def ts_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    pairs = (
        o.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    # bounded: per-event-type transition totals — one row per event type
    return pairs.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("n_from"), 6)
        .cast("double")
        .alias("p_r"),
    )


@register(
    "ts_rolling_median",
    oracle=f"""
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), w AS (
  SELECT event_type, bucket_epoch,
         list(v) OVER win AS frame_vals
  FROM b
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket_epoch
                 ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket_epoch,
       CAST(len(frame_vals) AS INTEGER) AS n_window,
       CAST(list_sort(frame_vals)[CAST(floor((len(frame_vals) - 1) / 2) AS BIGINT) + 1]
            AS DOUBLE) AS median_r
FROM w WHERE len(frame_vals) = 15
""",
    doc="rolling exact median (15-bucket frame) per series — the robust "
    "denoiser a spiky operational series needs where a rolling mean "
    "chases outliers. No engine median() is trusted: the frame is "
    "collected, sorted, and indexed with the pinned lower-middle "
    "convention floor((n-1)/2) on BOTH engines, over exact decimal "
    "bucket sums, so tied and even-count frames are deterministic. "
    "Scale shape: the frame collect runs over the per-series BUCKET "
    "table (bucket-count-sized, never raw events) with a constant "
    "15-element frame — O(w log w) per bucket, series-partitioned, no "
    "global sort.",
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = F.floor(F.unix_timestamp("ts") / _BUCKET_S).cast("long") * _BUCKET_S
    b = (
        ev.select(
            "event_type",
            bucket.alias("bucket_epoch"),
            F.col("value").cast("decimal(12,2)").alias("__v"),
        )
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("v"))
    )
    win = (
        Window.partitionBy("event_type").orderBy("bucket_epoch").rowsBetween(-14, 0)
    )
    w = b.select(
        "event_type",
        "bucket_epoch",
        F.collect_list("v").over(win).alias("frame_vals"),
    )
    n = F.size("frame_vals")
    med = F.element_at(
        F.array_sort("frame_vals"),
        (F.floor((n - 1) / 2) + 1).cast("int"),
    )
    return w.where(n == 15).select(
        "event_type",
        "bucket_epoch",
        n.cast("int").alias("n_window"),
        med.cast("double").alias("median_r"),
    )


_DECOMP_BUCKET = 3600


@register(
    "ts_decompose_additive",
    oracle=f"""
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {_DECOMP_BUCKET}) * {_DECOMP_BUCKET} AS BIGINT) AS bucket_epoch,
         SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
  GROUP BY 1, 2
), tr AS (
  SELECT event_type, bucket_epoch, v,
         COUNT(*) OVER win AS n_tr,
         SUM(v) OVER win AS s_tr
  FROM b
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket_epoch
                 ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), dt AS (
  SELECT event_type, bucket_epoch,
         CAST(round((CAST(v AS DOUBLE) - CAST(s_tr AS DOUBLE) / n_tr) * 1000000)
              AS BIGINT) AS detr_micro,
         CAST(s_tr AS DOUBLE) / n_tr AS trend,
         CAST(floor((bucket_epoch % 86400) / 3600) AS BIGINT) AS hod
  FROM tr WHERE n_tr = 25
), se AS (
  SELECT event_type, hod,
         CAST(SUM(detr_micro) AS DOUBLE) / COUNT(*) / 1000000 AS seasonal
  FROM dt GROUP BY event_type, hod
)
SELECT d.event_type, d.bucket_epoch,
       CAST(round(d.trend, 6) AS DOUBLE) AS trend_r,
       CAST(round(s.seasonal, 6) + 0 AS DOUBLE) AS seasonal_r,
       CAST(round(d.detr_micro / 1000000.0 - s.seasonal, 6) + 0 AS DOUBLE) AS resid_r
FROM dt d JOIN se s ON d.event_type = s.event_type AND d.hod = s.hod
""",
    doc="additive time-series decomposition (STL-lite): trend = centered "
    "25-hour moving average from exact decimal frame sums; seasonal = "
    "hour-of-day mean of the detrended series; residual = remainder. "
    "The detrended values are QUANTIZED to integer micro-units before "
    "the cross-row seasonal mean — summing raw doubles across rows is "
    "reduction-order-dependent and engine-divergent, summing int64 "
    "micro-units is exact — the same quantize-before-sum discipline "
    "the chi-square and perplexity queries use. Scale shape: all "
    "windows run over per-series bucket tables; the seasonal "
    "aggregation is a 24-row-per-series fold; the final join "
    "broadcasts the tiny seasonal profile.",
)
def ts_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
    )
    bucket = (
        F.floor(F.unix_timestamp("ts") / _DECOMP_BUCKET).cast("long")
        * _DECOMP_BUCKET
    )
    b = (
        ev.select(
            "event_type",
            bucket.alias("bucket_epoch"),
            F.col("value").cast("decimal(12,2)").alias("__v"),
        )
        .groupBy("event_type", "bucket_epoch")
        .agg(F.sum("__v").alias("v"))
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(-12, 12)
    )
    tr = b.select(
        "event_type",
        "bucket_epoch",
        "v",
        F.count(F.lit(1)).over(win).alias("n_tr"),
        F.sum("v").over(win).alias("s_tr"),
    )
    trend = F.col("s_tr").cast("double") / F.col("n_tr")
    dt = tr.where(F.col("n_tr") == 25).select(
        "event_type",
        "bucket_epoch",
        F.round((F.col("v").cast("double") - trend) * 1000000)
        .cast("long")
        .alias("detr_micro"),
        trend.alias("trend"),
        F.floor((F.col("bucket_epoch") % 86400) / 3600)
        .cast("long")
        .alias("hod"),
    )
    se = dt.groupBy("event_type", "hod").agg(
        (F.sum("detr_micro").cast("double") / F.count("*") / 1000000).alias(
            "seasonal"
        )
    )
    # bounded: per-(event_type, hour-of-day) profile — <= 24 x #event types rows
    return dt.join(F.broadcast(se), ["event_type", "hod"]).select(
        "event_type",
        "bucket_epoch",
        F.round("trend", 6).cast("double").alias("trend_r"),
        F.round("seasonal", 6).cast("double").alias("seasonal_r"),
        F.round(F.col("detr_micro") / 1000000.0 - F.col("seasonal"), 6)
        .cast("double")
        .alias("resid_r"),
    )


@register(
    "ts_holt_linear",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS x
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
    AND value IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), ser AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         x
  FROM daily
), rec AS (
  SELECT a.user_id, CAST(2 AS BIGINT) AS rn, a.x AS l, b.x - a.x AS b
  FROM ser a JOIN ser b ON a.user_id = b.user_id AND a.rn = 1 AND b.rn = 2
  UNION ALL
  SELECT r.user_id, r.rn + 1,
         0.5e0 * s.x + 0.5e0 * (r.l + r.b) AS l,
         0.3e0 * ((0.5e0 * s.x + 0.5e0 * (r.l + r.b)) - r.l) + 0.7e0 * r.b AS b
  FROM rec r JOIN ser s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT r.user_id, CAST(m.n AS BIGINT) AS n_obs,
       r.l AS level, r.b AS trend,
       r.l + 3.0e0 * r.b AS forecast_3
FROM rec r
JOIN (SELECT user_id, MAX(rn) AS mx, MAX(n) AS n FROM ser GROUP BY 1 HAVING MAX(n) >= 2) m
  ON r.user_id = m.user_id AND r.rn = m.mx
""",
    doc="Holt double-exponential smoothing (level + trend, alpha=0.5, "
    "beta=0.3) fit per user over the daily value series, emitting the "
    "final state and the 3-step-ahead forecast. The recurrence is "
    "inherently sequential per series, so it runs as a JVM-side "
    "higher-order fold: each user's (day, x) pairs collect to a "
    "SORTED array (bounded by the series length — days, not events; "
    "the same per-key bound every per-series model fit assumes) and "
    "F.aggregate folds the Holt update exactly once per observation — "
    "one shuffle on user_id, no Python, no driver loop, series "
    "processed in parallel across the cluster. The oracle runs the "
    "identical recurrence as a recursive CTE; both sides evaluate the "
    "same IEEE-754 double expression tree in the same order (init "
    "l=x1, b=x2-x1, then fold x3..xn), so the states agree bitwise, "
    "not just to tolerance. Daily sums aggregate in DECIMAL first — "
    "reduction-order-proof — and cast to double once.",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    daily = (
        ev.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d"),
            F.col("value").cast("decimal(12,2)").alias("__v"),
        )
        .groupBy("user_id", "d")
        .agg(F.sum("__v").cast("double").alias("x"))
    )
    per_user = (
        daily.groupBy("user_id")
        .agg(
            F.expr("transform(sort_array(collect_list(struct(d, x))), s -> s.x)")
            .alias("xs")
        )
        .withColumn("n_obs", F.size("xs"))
        .filter(F.col("n_obs") >= 2)
    )
    state = F.expr(
        "aggregate("
        "  case when n_obs > 2 then slice(xs, 3, n_obs - 2) "
        "       else slice(xs, 1, 0) end,"
        "  struct(xs[0] as l, xs[1] - xs[0] as b),"
        "  (acc, x) -> struct("
        "    0.5d * x + 0.5d * (acc.l + acc.b) as l,"
        "    0.3d * ((0.5d * x + 0.5d * (acc.l + acc.b)) - acc.l)"
        "      + 0.7d * acc.b as b))"
    )
    return per_user.select(
        "user_id",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        (state["l"] + F.lit(3.0) * state["b"]).alias("forecast_3"),
    )


# shared daily-series CTE for the trend estimators below: per-type daily
# DECIMAL sums cast to double once. NULL event_type is excluded
# EXPLICITLY on both sides (anonymous-series policy, round-7 wave 7:
# the pairwise equi-self-join would drop NULL silently while the
# per-type aggregates kept it — make the policy total, not accidental).
_DAILY_SQL = f"""
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS x
  FROM events
  WHERE ts >= TIMESTAMP '{_SPINE_LO}' AND ts < TIMESTAMP '{_SPINE_HI}'
    AND value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
"""


def _daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("ts") >= F.lit(_SPINE_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(_SPINE_HI).cast("timestamp"))
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    )
    return (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("d"),
            F.col("value").cast("decimal(12,2)").alias("__v"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("__v").cast("double").alias("x"))
    )


@register(
    "ts_mann_kendall",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
pairs AS (
  SELECT a.event_type, CAST(sign(b.x - a.x) AS BIGINT) AS sg
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
), s AS (
  SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat FROM pairs GROUP BY 1
), nn AS (
  SELECT event_type, COUNT(*) AS n FROM daily GROUP BY 1
), ties AS (
  SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tt
  FROM (SELECT event_type, x, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
), v AS (
  SELECT n.event_type, n.n,
         CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tt AS DOUBLE) / 18.0e0 AS var_s
  FROM nn n JOIN ties t ON n.event_type = t.event_type
), z AS (
  SELECT v.event_type, CAST(v.n AS BIGINT) AS n_obs, s.s_stat, v.var_s,
         CASE WHEN s.s_stat = 0 THEN 0.0e0
              WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE) / sqrt(v.var_s)
              ELSE CAST(s.s_stat + 1 AS DOUBLE) / sqrt(v.var_s) END AS z_stat
  FROM v JOIN s ON v.event_type = s.event_type
)
SELECT event_type, n_obs, s_stat, var_s, z_stat,
       CASE WHEN z_stat IS NULL THEN 'undefined'
            WHEN z_stat > 1.96 THEN 'increasing'
            WHEN z_stat < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM z
""",
    doc="Mann-Kendall monotonic-trend test per event_type over the daily "
    "value series: S = sum of sign(x_j - x_i) over ordered day pairs, "
    "tie-corrected variance n(n-1)(2n+5)/18 - sum t(t-1)(2t+5)/18, "
    "continuity-corrected z, and the trend verdict at alpha=0.05 — the "
    "standard nonparametric drift detector for pipeline health series "
    "(robust to outliers and any monotone transform, unlike the OLS "
    "slope in ts_linear_forecast). S and both variance terms are pure "
    "INTEGER aggregates (sign of decimal-sourced doubles is exact), so "
    "the only float ops are two final per-row expressions. The pairwise "
    "self-join is keyed on the series id and bounded by days-per-series "
    "squared — per-SERIES quadratic like every exact MK implementation "
    "(for multi-year series at 100 TB switch to the O(n log n) "
    "merge-sort inversion-count formulation per series; the shuffle "
    "shape — one key, bounded state — is unchanged). An all-tied "
    "series (constant sweep) has var_s = 0 AND S = 0: the S=0 arm "
    "short-circuits z to 0.0 before the 0/0, on both engines.",
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_by_type(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.signum(F.col("b.x") - F.col("a.x")).cast("bigint").alias("sg"),
    )
    s = pairs.groupBy("event_type").agg(F.sum("sg").cast("bigint").alias("s_stat"))
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tt")
        )
    )
    n = F.col("n")
    v = nn.join(ties, "event_type").select(
        "event_type",
        n.cast("bigint").alias("n_obs"),
        ((n * (n - 1) * (2 * n + 5) - F.col("tt")).cast("double") / F.lit(18.0)).alias(
            "var_s"
        ),
    )
    z = (
        F.when(F.col("s_stat") == 0, F.lit(0.0))
        .when(
            F.col("s_stat") > 0,
            F.try_divide((F.col("s_stat") - 1).cast("double"), F.sqrt(F.col("var_s"))),
        )
        .otherwise(
            F.try_divide((F.col("s_stat") + 1).cast("double"), F.sqrt(F.col("var_s")))
        )
    )
    out = v.join(s, "event_type").select(
        "event_type", "n_obs", "s_stat", "var_s", z.alias("z_stat")
    )
    return out.select(
        "event_type",
        "n_obs",
        "s_stat",
        "var_s",
        "z_stat",
        F.when(F.col("z_stat").isNull(), F.lit("undefined"))
        .when(F.col("z_stat") > 1.96, F.lit("increasing"))
        .when(F.col("z_stat") < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


@register(
    "ts_theil_sen",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
pairs AS (
  SELECT a.event_type, (b.x - a.x) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
), ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS np
  FROM pairs
), sl AS (
  SELECT event_type, CAST(np AS BIGINT) AS n_pairs, slope
  FROM ranked WHERE rn = (np + 1) // 2
), resid AS (
  SELECT d.event_type, d.x - sl.slope * CAST(d.d AS DOUBLE) AS b
  FROM daily d JOIN sl ON d.event_type = sl.event_type
), rranked AS (
  SELECT event_type, b,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nb
  FROM resid
)
SELECT sl.event_type,
       CAST(nn.n AS BIGINT) AS n_obs, sl.n_pairs, sl.slope,
       rr.b AS intercept
FROM sl
JOIN (SELECT event_type, COUNT(*) AS n FROM daily GROUP BY 1) nn
  ON sl.event_type = nn.event_type
JOIN rranked rr ON sl.event_type = rr.event_type AND rr.rn = (rr.nb + 1) // 2
""",
    doc="Theil-Sen robust trend per event_type over the daily value "
    "series: slope = LOWER MEDIAN of all pairwise day-slopes "
    "(deterministic median convention — averaging the two middles "
    "would be fine too, but the lower median makes the pick a single "
    "existing value on both engines), intercept = lower median of the "
    "per-day residuals x - slope*d. Up to ~29% contaminated "
    "observations cannot move the estimate — the robust companion to "
    "the OLS ts_linear_forecast, and the estimator of choice for "
    "pipeline-health series with outlier days. Slopes are identical "
    "single-division float expressions; medians are picked by rank, "
    "not averaged, so cross-engine agreement is exact. Pair "
    "generation is per-series quadratic in DAYS (bounded, like every "
    "exact Theil-Sen; repeated-median or sampled variants trade for "
    "longer series) keyed on the series id — shuffle state stays "
    "per-key bounded at any corpus size.",
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_by_type(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.x") - F.col("a.x")) / (F.col("b.d") - F.col("a.d")).cast("double")).alias(
            "slope"
        ),
    )
    w_rank = Window.partitionBy("event_type").orderBy("slope")
    w_cnt = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_cnt).alias("np"),
    )
    sl = ranked.filter(
        F.col("rn") == F.expr("(np + 1) div 2")
    ).select("event_type", F.col("np").cast("bigint").alias("n_pairs"), "slope")
    resid = daily.join(sl, "event_type").select(
        "event_type",
        (F.col("x") - F.col("slope") * F.col("d").cast("double")).alias("b"),
    )
    w_brank = Window.partitionBy("event_type").orderBy("b")
    rranked = resid.select(
        "event_type",
        "b",
        F.row_number().over(w_brank).alias("rn"),
        F.count(F.lit(1)).over(w_cnt).alias("nb"),
    )
    ic = rranked.filter(F.col("rn") == F.expr("(nb + 1) div 2")).select(
        "event_type", F.col("b").alias("intercept")
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    return (
        sl.join(nn, "event_type")
        .join(ic, "event_type")
        .select("event_type", "n_obs", "n_pairs", "slope", "intercept")
    )
