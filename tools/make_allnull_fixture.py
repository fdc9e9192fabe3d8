"""Build an ALL-NULL-PAYLOAD fixture: every table with K referentially
coherent rows whose KEY columns are real (distinct PKs, valid FKs) but
whose every other column is NULL, physical schemas preserved.

Why this is its own generation (round 9, after constant-series): the
hostile fixture laces individual NULL-payload rows into healthy tables,
so every operator sees NULLs WITH non-NULL rows to hide behind — modal
probes, min/max seeds, first()-legs and "drop NULL measurements at the
scan" conventions all still find a value. Here there is NO value
anywhere: all-NULL groups reach aggregates whole-table (min/max/avg
NULL, percentile over an empty filtered set, modal dimension of zero
valid vectors), every date/window filter drops every row (day-zero
paths re-entered THROUGH a non-empty scan), and text operators see a
corpus that exists but says nothing.

Construction mirrors make_constant_fixture: the day-one coherent row of
each table replicated K times with offset keys; every non-key column is
replaced by NULL. Region/nation stay single-row and intact (fixed dims;
NULLing their names would just break every join legend, which the FK
coherence already covers).

Usage:
    python tools/make_allnull_fixture.py [src_sf_dir] [out_dir] [K]
    python tools/check_oracle.py <out_dir>            # then sweep
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow.parquet as pq

_OFF = 1_000_003  # same non-colliding stride as make_constant_fixture

# key columns kept real, everything else NULLed
_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_OFFSET_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(src_dir: str, out: str, k: int = 4) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    picks = {
        "orders": "SELECT * FROM src ORDER BY o_orderkey LIMIT 1",
        "lineitem": (
            "SELECT * FROM src WHERE l_orderkey = (SELECT MIN(o_orderkey) "
            f"FROM '{src_dir}/orders.parquet') ORDER BY l_linenumber LIMIT 1"
        ),
        "customer": (
            "SELECT * FROM src WHERE c_custkey = (SELECT o_custkey FROM "
            f"'{src_dir}/orders.parquet' ORDER BY o_orderkey LIMIT 1) LIMIT 1"
        ),
        "supplier": "SELECT * FROM src ORDER BY s_suppkey LIMIT 1",
        "part": "SELECT * FROM src ORDER BY p_partkey LIMIT 1",
        "nation": "SELECT * FROM src ORDER BY n_nationkey LIMIT 1",
        "region": "SELECT * FROM src ORDER BY r_regionkey LIMIT 1",
        "events": "SELECT * FROM src ORDER BY event_id LIMIT 1",
        "documents": "SELECT * FROM src ORDER BY doc_id LIMIT 1",
        "embeddings": "SELECT * FROM src ORDER BY vec_id LIMIT 1",
    }
    for t, q in picks.items():
        tab = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        con.register("src", tab)
        keys = _KEYS.get(t)
        if keys is None:  # nation/region: single intact row
            rq = q
        else:
            off = _OFFSET_KEYS[t]
            # CASE WHEN TRUE THEN NULL ELSE col END keeps the column's
            # own type on the NULL (a bare NULL literal types as int32
            # and breaks the pyarrow cast back to timestamps/lists)
            cols = ", ".join(
                f"{c} + i * {_OFF} AS {c}"
                if c in off
                else (
                    c
                    if c in keys
                    else f"CASE WHEN TRUE THEN NULL ELSE {c} END AS {c}"
                )
                for c in [f.name for f in tab.schema]
            )
            rq = (
                f"SELECT {cols} FROM ({q}) one, range({k}) t(i) "
                f"ORDER BY {off[0]}"
            )
        res = con.execute(rq).fetch_arrow_table().cast(tab.schema)
        pq.write_table(res, os.path.join(out, f"{t}.parquet"))
        con.unregister("src")
    con.close()
    print(f"all-null-payload fixture written to {out}")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/allnull_fixture"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    build(src, out, k)


if __name__ == "__main__":
    main()
