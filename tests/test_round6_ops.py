"""Round-6 pins: the four advisory fixes (quality-classifier overflow,
bootstrap scale path, CDC restart recovery, snapshot-diff key domain)
plus the Poisson-bootstrap twin comparison and an independent python
recompute of its CI."""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hive_export_spark.plans import audit
from hive_export_spark.sources import load_table


# --- llm_quality_classifier: BIGINT arithmetic + empty-doc guard -------


def test_quality_classifier_survives_long_and_empty_docs(spark, tmp_path):
    """ANSI Spark raised ARITHMETIC_OVERFLOW at 1000000 * n_alpha (INT32)
    for any doc with >= ~2148 alphabetic chars, and DIVIDE_BY_ZERO for an
    empty doc. Both must now work: BIGINT features, NULL for empty."""
    from hive_export_spark.queries.llm_queries import llm_quality_classifier

    long_text = "the quick brown fox " * 300  # 6000 chars, ~4800 alpha
    rows = [
        (1, long_text, "en", "web", len(long_text)),
        (2, "", "en", "web", 0),
        (3, "a plain short doc of the usual kind", "en", "web", 35),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))
    out = {r.doc_id: r for r in llm_quality_classifier(spark, str(tmp_path)).collect()}
    assert out[1].score_micro is not None  # would have overflowed before
    assert out[1].score_micro > 0
    assert out[2].score_micro is None  # empty doc -> NULL, not a crash
    assert out[2].keep is None
    assert out[3].score_micro is not None


# --- stats_bootstrap_poisson ------------------------------------------


def _poisson_expected(sf_dir: str):
    """Independent pure-python recompute of the whole query (exact
    integer LCG + Decimal sums), mirroring the pinned convention."""
    import duckdb

    B = 50
    thresholds = (
        1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291,
    )
    rows = duckdb.sql(
        f"SELECT event_type, event_id, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    m32 = 4294967296

    def mix32(h: int) -> int:
        h = ((h >> 16) ^ h) * 73244475 % m32
        h = ((h >> 16) ^ h) * 73244475 % m32
        return (h >> 16) ^ h

    acc: dict[tuple[str, int], tuple[Decimal, int]] = {}
    pt: dict[str, tuple[Decimal, int]] = {}
    for et, eid, val in rows:
        v = Decimal(val).quantize(Decimal("0.01"), ROUND_HALF_UP)
        sv, cv = pt.get(et, (Decimal(0), 0))
        pt[et] = (sv + v, cv + 1)
        for b in range(1, B + 1):
            u = mix32(((eid % m32) * 40503 + b * 2654435761 + 986419) % m32)
            w = 6
            for k, t in enumerate(thresholds):
                if u < t:
                    w = k
                    break
            s, c = acc.get((et, b), (Decimal(0), 0))
            acc[(et, b)] = (s + w * v, c + w)
    means: dict[str, list[tuple[float, int]]] = {}
    for (et, b), (s, c) in acc.items():
        means.setdefault(et, []).append((float(s) / c, b))
    lo_rn = int(math.floor(0.025 * (B - 1)))
    hi_rn = int(math.floor(0.975 * (B - 1)))
    out = {}
    for et, ms in means.items():
        ms.sort()
        sv, cv = pt[et]
        out[et] = (cv, float(sv) / cv, ms[lo_rn][0], ms[hi_rn][0])
    return out


def test_bootstrap_poisson_matches_python_recompute(spark, sf_dir):
    from hive_export_spark.queries.stats_queries import stats_bootstrap_poisson

    got = {r.event_type: r for r in stats_bootstrap_poisson(spark, sf_dir).collect()}
    want = _poisson_expected(sf_dir)
    assert set(got) == set(want)
    for et, (n, mean_v, lo, hi) in want.items():
        r = got[et]
        assert r.n == n
        assert r.mean_r == pytest.approx(mean_v, abs=1e-6)
        assert r.ci_lo_r == pytest.approx(lo, abs=1e-6)
        assert r.ci_hi_r == pytest.approx(hi, abs=1e-6)


def test_bootstrap_poisson_agrees_with_exact_twin(spark, sf_dir):
    """The Poisson bootstrap is the scale-safe rewrite; the exact-LCG
    index bootstrap is its statistical oracle. Same point estimate,
    bracketing CI, and comparable width (both estimate the same sampling
    distribution; B=50 keeps endpoints noisy, hence the loose band)."""
    from hive_export_spark.queries.stats_queries import (
        stats_bootstrap_ci,
        stats_bootstrap_poisson,
    )

    exact = {r.event_type: r for r in stats_bootstrap_ci(spark, sf_dir).collect()}
    pois = {r.event_type: r for r in stats_bootstrap_poisson(spark, sf_dir).collect()}
    assert set(exact) == set(pois)
    for et in exact:
        e, p = exact[et], pois[et]
        assert p.n == e.n
        assert p.mean_r == pytest.approx(e.mean_r, abs=1e-6)  # identical formula
        assert p.ci_lo_r <= p.mean_r <= p.ci_hi_r
        assert p.ci_lo_r < p.ci_hi_r
        we, wp = e.ci_hi_r - e.ci_lo_r, p.ci_hi_r - p.ci_lo_r
        assert 0.5 * we < wp < 2.0 * we


def test_bootstrap_cis_match_clt_width(spark, sf_dir):
    """The regression that motivated the hash fix: with lattice (affine
    LCG) draws, sd(mean_b) came out ~4x below sigma/sqrt(n). Both
    variants' 95% CI width must now sit near the CLT's 2*1.96*se
    (loose band: B=50 makes discrete-quantile endpoints noisy)."""
    import duckdb

    from hive_export_spark.queries.stats_queries import (
        stats_bootstrap_ci,
        stats_bootstrap_poisson,
    )

    se = {
        et: sd / math.sqrt(n)
        for et, sd, n in duckdb.sql(
            f"""SELECT event_type, stddev_pop(CAST(value AS DECIMAL(12,2))),
                       COUNT(*)
                FROM '{sf_dir}/events.parquet' GROUP BY event_type"""
        ).fetchall()
    }
    for fn in (stats_bootstrap_ci, stats_bootstrap_poisson):
        for r in fn(spark, sf_dir).collect():
            width = r.ci_hi_r - r.ci_lo_r
            assert 1.5 * se[r.event_type] < width < 8.0 * se[r.event_type], (
                fn.__name__, r.event_type, width, se[r.event_type],
            )


def test_bootstrap_poisson_plan_is_scale_safe(spark, sf_dir):
    """The property the rewrite exists for: NO broadcast hint anywhere
    (the exact twin force-broadcasts the O(n) value table), a single
    B-row-per-series Window (the twin needs a data-sized rank window),
    and map-side partial aggregation folding the exploded weights before
    the only data shuffle."""
    import inspect

    from hive_export_spark.queries.stats_queries import stats_bootstrap_poisson

    src = inspect.getsource(stats_bootstrap_poisson)
    assert "F.broadcast" not in src  # no explicit broadcast hint anywhere
    plan = audit.executed_plan(stats_bootstrap_poisson(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("Window") == 1  # only the B-means ranking window
    assert "partial_sum" in plan  # map-side combine before the shuffle
    # joins exist only between the two 5-row aggregated frames (pt, ci)
    n_joins = sum(plan.count(j) for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins <= 1, plan


# --- cdc_snapshot_diff: collision-free synthetic keys ------------------


def test_snapshot_diff_key_domains_disjoint(spark, sf_dir):
    from hive_export_spark.queries.relational_queries import cdc_snapshot_diff

    orders = load_table(spark, "orders", sf_dir)
    keys = [r.o_orderkey for r in orders.select("o_orderkey").collect()]
    assert all(k >= 0 for k in keys)  # fixture includes orderkey 0
    out = cdc_snapshot_diff(spark, sf_dir).collect()
    by_type: dict[str, set[int]] = {}
    for r in out:
        by_type.setdefault(r.change_type, set()).add(r.k)
    # synthetic inserts are -(k+1): strictly negative, never collide
    assert by_type["added"] == {-(k + 1) for k in keys if k % 11 == 0}
    assert all(k < 0 for k in by_type["added"])
    assert by_type["removed"] == {k for k in keys if k % 13 == 0}
    assert by_type["changed"] == {
        k for k in keys if k % 7 == 0 and k % 13 != 0
    }


# --- stream_cdc_apply: restart recovers state from disk ----------------


def test_cdc_merge_restart_recovers_from_disk(spark, tmp_path):
    """Genuine restart simulation: stream waves 1-2 through one query,
    stop, append wave 3, start a NEW query (fresh foreachBatch closure)
    on the SAME checkpoint. The checkpoint skips batches 0-1, so the
    first new merge must find snapshot v00001 on disk — with the old
    in-memory pointer this rebuilt state from nothing and dropped the
    earlier waves."""
    from hive_export_spark.queries.streaming_queries import (
        cdc_committed_snapshots,
        cdc_merge_fn,
    )

    src, ckpt, state = (
        str(tmp_path / "chg"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "state"),
    )
    waves = [
        [(1, 1, "I", "O"), (2, 1, "I", "O"), (3, 1, "I", "O")],
        [(2, 2, "U", "F")],
        [(3, 3, "D", None), (4, 3, "I", "P")],
    ]
    schema = "o_orderkey long, seq int, op string, status string"

    def write_wave(w):
        spark.createDataFrame(w, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(cdc_merge_fn(state))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_wave(waves[0])
    write_wave(waves[1])
    run_stream()  # process waves 1-2, then "crash"
    assert len(cdc_committed_snapshots(state)) >= 1
    write_wave(waves[2])
    run_stream()  # restart: new closure, same checkpoint

    final = spark.read.parquet(cdc_committed_snapshots(state)[-1])
    rows = {r.o_orderkey: (r.op, r.status) for r in final.collect()}
    assert rows[1] == ("I", "O")  # wave-1 state survived the restart
    assert rows[2] == ("U", "F")  # wave-2 update survived
    assert rows[3][0] == "D"  # wave-3 delete tombstone applied
    assert rows[4] == ("I", "P")  # wave-3 insert applied


def test_sf_scratch_key_tracks_fixture_fingerprint(tmp_path):
    """Regenerating a fixture in place must move every derived-cache key
    (IVF index, MinHash signature store, export blocks): a stale index
    over new fixtures would silently wrong-answer the probe queries."""
    import time

    from hive_export_spark.queries.connector_queries import sf_scratch_dir

    fx = tmp_path / "sfX"
    fx.mkdir()
    p = fx / "embeddings.parquet"
    p.write_bytes(b"v1-bytes")
    k1 = sf_scratch_dir("ivf_index", str(fx))
    assert k1 == sf_scratch_dir("ivf_index", str(fx))  # stable key
    time.sleep(0.01)
    p.write_bytes(b"v2-bytes!")  # regenerate: new mtime (and size)
    k2 = sf_scratch_dir("ivf_index", str(fx))
    assert k2 != k1
    # different derived artifacts under the same fixture stay separate
    assert sf_scratch_dir("minhash_store", str(fx)) != k2


def test_cdc_half_written_snapshot_is_invisible(tmp_path):
    from hive_export_spark.queries.streaming_queries import (
        cdc_committed_snapshots,
    )

    state = str(tmp_path / "state")
    os.makedirs(os.path.join(state, "v00000"))
    open(os.path.join(state, "v00000", "_SUCCESS"), "w").close()
    os.makedirs(os.path.join(state, "v00001"))  # crashed mid-write
    snaps = cdc_committed_snapshots(state)
    assert [os.path.basename(s) for s in snaps] == ["v00000"]
    assert cdc_committed_snapshots(state, below=0) == []
