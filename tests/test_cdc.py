"""MERGE-emulation tests: last-write-wins upsert and SCD2 history."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_export_spark.operators.cdc import scd2_apply, upsert


def test_upsert_last_write_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], ["k", "name", "v"]
    )
    out = {r.k: (r.name, r.v) for r in upsert(target, updates, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k int, city string, effective_from timestamp, "
        "effective_to timestamp, is_current boolean"
    )


def test_scd2_change_insert_unchanged(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    current = _dim(
        spark,
        [
            (1, "berlin", t0, None, True),
            (2, "paris", t0, None, True),
            (3, "rome", t0, None, True),
            # an already-closed historical row must pass through untouched
            (1, "bonn", dt.datetime(2023, 1, 1), t0, False),
        ],
    )
    updates = spark.createDataFrame(
        [(1, "hamburg"), (2, "paris"), (4, "madrid")], "k int, city string"
    )
    out = scd2_apply(
        current, updates, "k", ["city"], batch_time="2024-06-01 00:00:00"
    ).collect()
    bt = dt.datetime(2024, 6, 1)

    rows = {(r.k, r.city, r.is_current): (r.effective_from, r.effective_to) for r in out}
    # changed key 1: old version closed at batch time, new open version
    assert rows[(1, "berlin", False)] == (t0, bt)
    assert rows[(1, "hamburg", True)] == (bt, None)
    # unchanged key 2 passes through open
    assert rows[(2, "paris", True)] == (t0, None)
    # untouched key 3 passes through open
    assert rows[(3, "rome", True)] == (t0, None)
    # new key 4 inserted open
    assert rows[(4, "madrid", True)] == (bt, None)
    # prior history untouched
    assert rows[(1, "bonn", False)] == (dt.datetime(2023, 1, 1), t0)
    assert len(out) == 6


def test_scd2_idempotent_on_identical_updates(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    current = _dim(spark, [(1, "berlin", t0, None, True)])
    updates = spark.createDataFrame([(1, "berlin")], "k int, city string")
    out = scd2_apply(current, updates, "k", ["city"]).collect()
    assert len(out) == 1
    assert out[0].is_current and out[0].effective_to is None
