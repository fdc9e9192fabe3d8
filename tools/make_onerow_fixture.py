"""Build a DAY-ONE fixture: every table with exactly ONE row, physical
schemas preserved, and the TPC-H-ish rows referentially COHERENT (the
lineitem row belongs to the orders row, which belongs to the customer
row) so join paths stay populated.

The first trickle of real data is adversarial in ways neither the
hostile fixture (n=1 SERIES inside multi-row tables) nor the day-zero
fixture (0 rows: aggregates mostly vanish) reaches, because singleton
GROUPS now flow through every estimator: sample variance divides by
n-1 = 0 with a NON-NULL numerator (ANSI crash where DuckDB's / yields
NULL); a single-bucket series has zero t-variance under a least-squares
slope; a pivot over a 2-way split leaves one side NULL into a
NULL-propagating sketch merge; a "late" duplicate of the earliest event
is not actually late when the earliest event is also the latest (its
window is still open); recall floors (min_hits) exceed the achievable
neighbor count; fraction-band checks ([0.1,0.3]*n) contain NO integers
at n=1; and a one-file table cannot have its file count reduced. The
round-8 day-one sweep found 9 such failures — fixed and pinned in
tests/test_day_one.py.

Rows are selected with DuckDB over pyarrow tables and cast back to the
source schema, so physical parquet types survive.

Usage:
    python tools/make_onerow_fixture.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow.parquet as pq


def build(src_dir: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    picks = [
        ("orders", "SELECT * FROM src ORDER BY o_orderkey LIMIT 1"),
        (
            "lineitem",
            "SELECT * FROM src WHERE l_orderkey = (SELECT MIN(o_orderkey) "
            f"FROM '{src_dir}/orders.parquet') ORDER BY l_linenumber LIMIT 1",
        ),
        (
            "customer",
            "SELECT * FROM src WHERE c_custkey = (SELECT o_custkey FROM "
            f"'{src_dir}/orders.parquet' ORDER BY o_orderkey LIMIT 1) LIMIT 1",
        ),
        ("supplier", "SELECT * FROM src ORDER BY s_suppkey LIMIT 1"),
        ("part", "SELECT * FROM src ORDER BY p_partkey LIMIT 1"),
        ("nation", "SELECT * FROM src ORDER BY n_nationkey LIMIT 1"),
        ("region", "SELECT * FROM src ORDER BY r_regionkey LIMIT 1"),
        ("events", "SELECT * FROM src ORDER BY event_id LIMIT 1"),
        ("documents", "SELECT * FROM src ORDER BY doc_id LIMIT 1"),
        ("embeddings", "SELECT * FROM src ORDER BY vec_id LIMIT 1"),
    ]
    for t, q in picks:
        tab = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        con.register("src", tab)
        res = con.execute(q).fetch_arrow_table().cast(tab.schema)
        pq.write_table(res, os.path.join(out, f"{t}.parquet"))
        con.unregister("src")
    con.close()
    print(f"day-one fixture written to {out}")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/onerow_fixture"
    build(src, out)


if __name__ == "__main__":
    main()
