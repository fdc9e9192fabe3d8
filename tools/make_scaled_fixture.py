"""Derive a FACTOR-x scaled copy of a fixture dir for scaling probes.

The driver ships sf0.001/0.01/0.1; the 100 TB question needs at least
one more measured decade. This tool replicates each table FACTOR times
with key offsets, preserving the workload's *density character* so
growth ratios stay interpretable:

- Fact/dim keys (orderkey, custkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id) shift by replica * (max_key + 1), so key
  uniqueness, join fan-out per key, and rows-per-order stay EXACTLY the
  source's. More users / more orders — not longer histories — is how
  real corpora grow.
- region/nation stay as-is (genuinely fixed dimensions).
- documents: every whitespace-run-delimited token in replica k > 0 gets
  an `_rK` suffix. Within a replica, every pair's shingle-set Jaccard is
  IDENTICAL to the source corpus (both members transformed the same
  way), so planted near-dup density per doc is preserved; across
  replicas every shingle differs, so no spurious duplicate inflation
  (10 verbatim copies of each doc would turn exact/near-dedup into a
  quadratically different workload and poison the growth ratio).
  n_chars is recomputed to match the transformed text.
- embeddings: element 0 shifts by replica * 1e-3 — keeps vectors
  realistic while preventing cross-replica exact-duplicate vectors from
  skewing near-dup counts.
- events: value/props/ts unchanged; each replica is a fresh user
  population emitting the same traffic shape.

This is measurement tooling (like make_hostile_fixture): outputs feed
bench/shuffle probes, never the correctness oracle gate.

Usage:
    python tools/make_scaled_fixture.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb


def build(src: str, out: str, factor: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT range AS k FROM range({factor})")

    def scaled(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )

    def copy(table: str) -> None:
        scaled(table, f"SELECT * FROM '{src}/{table}.parquet'")

    copy("region")
    copy("nation")

    def off(col: str, table: str) -> str:
        return (
            f"{col} + k * ((SELECT max({col}) + 1 FROM '{src}/{table}.parquet'))"
        )

    scaled("supplier", f"""
        SELECT {off('s_suppkey', 'supplier')} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM '{src}/supplier.parquet', reps""")
    scaled("customer", f"""
        SELECT {off('c_custkey', 'customer')} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet', reps""")
    scaled("part", f"""
        SELECT {off('p_partkey', 'part')} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM '{src}/part.parquet', reps""")
    scaled("orders", f"""
        SELECT o_orderkey + k * ((SELECT max(o_orderkey) + 1
                                  FROM '{src}/orders.parquet')) AS o_orderkey,
               o_custkey + k * ((SELECT max(c_custkey) + 1
                                 FROM '{src}/customer.parquet')) AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', reps""")
    scaled("lineitem", f"""
        SELECT l_orderkey + k * ((SELECT max(o_orderkey) + 1
                                  FROM '{src}/orders.parquet')) AS l_orderkey,
               l_partkey + k * ((SELECT max(p_partkey) + 1
                                 FROM '{src}/part.parquet')) AS l_partkey,
               l_suppkey + k * ((SELECT max(s_suppkey) + 1
                                 FROM '{src}/supplier.parquet')) AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', reps""")
    scaled("events", f"""
        SELECT event_id + k * ((SELECT max(event_id) + 1
                                FROM '{src}/events.parquet')) AS event_id,
               ts,
               user_id + k * ((SELECT max(user_id) + 1
                               FROM '{src}/events.parquet')) AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet', reps""")
    scaled("documents", f"""
        SELECT {off('doc_id', 'documents')} AS doc_id,
               CASE WHEN k = 0 OR text IS NULL THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_r' || k, 'g')
               END AS text,
               lang, source,
               CASE WHEN text IS NULL THEN NULL
                    ELSE length(CASE WHEN k = 0 THEN text
                                ELSE regexp_replace(text, '(\\S+)', '\\1_r' || k, 'g') END)
               END AS n_chars
        FROM '{src}/documents.parquet', reps""")
    scaled("embeddings", f"""
        SELECT {off('vec_id', 'embeddings')} AS vec_id,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE list_prepend(embedding[1] + k * 0.001,
                                      embedding[2:]) END AS embedding,
               label
        FROM '{src}/embeddings.parquet', reps""")
    con.close()
    print(f"{factor}x scaled fixture written to {out}")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_scaled"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, out, factor)


if __name__ == "__main__":
    main()
