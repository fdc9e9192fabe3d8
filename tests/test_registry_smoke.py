"""Registry-wide guards: every registered query must execute and every
oracle must parse — cheap protection against breaking a registry entry in
a later round without running the full oracle gate."""

from __future__ import annotations

import duckdb
import pytest

from hive_export_spark.registry import all_oracles, all_queries

SIDE_EFFECT_QUERIES = {
    # these write files / run streaming queries — exercised by their own
    # tests and the oracle gate; excluded from the per-query smoke loop
    "parity_partitioned_write",
    "stream_export_e2e",
}


@pytest.mark.parametrize("name", sorted(all_queries().keys() - SIDE_EFFECT_QUERIES))
def test_query_executes(spark, name):
    fn = all_queries()[name]
    df = fn(spark, "/root/testdata/sf0.001")
    rows = df.limit(5).collect()
    assert df.columns  # stable, non-empty schema
    assert rows is not None


def test_every_oracle_parses_in_duckdb():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    bad = []
    for name, sql in all_oracles().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:120]))
    assert not bad, bad


def test_registry_is_consistent():
    qs, os_ = all_queries(), all_oracles()
    # every oracle refers to a registered query
    assert set(os_) <= set(qs)
    # documented minimum surface (guards accidental deregistration)
    assert len(qs) >= 95
    assert len(os_) >= 89


def test_driver_window_contract():
    """The driver verifies only queries() positions 0-49; pin them.

    Every window entry must carry an oracle (full hash gate) except the
    genuinely approximate ops, which get the weaker rows-only check.
    """
    from hive_export_spark.registry import DRIVER_WINDOW

    qs, os_ = all_queries(), all_oracles()
    assert len(DRIVER_WINDOW) == 50
    assert list(qs)[:50] == list(DRIVER_WINDOW)
    # round 3: the driver has NO rows-only path (r2 verdict) — every window
    # entry must carry an oracle; approximate ops use oracle-able
    # reformulations (exact values + within-tolerance booleans)
    assert [n for n in DRIVER_WINDOW if n not in os_] == []
    # oracle iteration order matches the window too (driver zips them)
    assert [n for n in os_ if n in set(DRIVER_WINDOW)][:5] == [
        n for n in DRIVER_WINDOW if n in os_
    ][:5]


def test_round15_head_is_valid():
    """The pinned next-round rotation head must be typo-free NOW — a
    misspelled name would burn a driver slot when the r15 window is
    rebuilt from it (round-8 planning discipline, r9 verdict ask #2)."""
    from hive_export_spark.registry import DRIVER_WINDOW, ROUND15_HEAD

    qs = all_queries()
    assert len(ROUND15_HEAD) == 50
    assert len(set(ROUND15_HEAD)) == 50
    assert [n for n in ROUND15_HEAD if n not in qs] == []
    # a name already earning fresh evidence this round wastes a slot
    assert set(ROUND15_HEAD) & set(DRIVER_WINDOW) == set()


def test_round15_head_closes_the_stale_pool():
    """After r14+r15 land green, no query's newest driver row may predate
    r10 — the r15 head must therefore contain EVERY query whose newest
    green CORRECTNESS row is r9 or older and which is not already in
    this round's window (evidence-closure invariant, r8 verdict ask #2,
    extended per the r10-r13 verdict ask #1)."""
    import glob
    import json
    import os
    import re

    from hive_export_spark.registry import DRIVER_WINDOW, ROUND15_HEAD

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("err") in (None, "")
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is not False
            ):
                newest[name] = max(newest.get(name, 0), rnd)
    pool = {
        n
        for n in all_queries()
        if newest.get(n, 0) <= 9 and n not in set(DRIVER_WINDOW)
    }
    assert pool <= set(ROUND15_HEAD), sorted(pool - set(ROUND15_HEAD))
