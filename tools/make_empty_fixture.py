"""Build a DAY-ZERO fixture: every table present with its exact schema
and ZERO rows.

This is the first day of any production pipeline — the tables exist
(created by DDL / a first empty write) but nothing has arrived yet — and
it is adversarial in ways the hostile fixture is not: global aggregates
must emit their 1-row summary while grouping LATTICES emit nothing
(Spark's Expand feeds zero groups, including the () set, where DuckDB
emits the grand-total row); partitioned writes of zero rows leave NO
data files, so every read-back needs an explicit schema; min/max probes
return NULL into int() guards; spark.ml fit() raises on empty frames.
The round-8 day-zero sweep found 17 such failures across 7 classes —
all fixed and pinned by tests/test_day_zero.py.

Schemas are copied field-for-field with pyarrow (NOT rewritten through
an engine: DuckDB COPY would re-encode physical types, and the events
table's timestamp encoding must survive exactly).

Usage:
    python tools/make_empty_fixture.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        empty = pa.table(
            {f.name: pa.array([], type=f.type) for f in schema}, schema=schema
        )
        pq.write_table(empty, os.path.join(out, f"{t}.parquet"))
    print(f"day-zero fixture written to {out}")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/empty_fixture"
    build(src, out)


if __name__ == "__main__":
    main()
