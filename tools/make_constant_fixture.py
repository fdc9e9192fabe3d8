"""Build a CONSTANT-SERIES fixture: every table with K referentially
coherent rows whose key columns are DISTINCT but whose value/payload
columns are all IDENTICAL (same price, same event value, same timestamp,
same document text, same embedding), physical schemas preserved.

Why this is its own generation (round 9): the day-one fixture's
singleton groups are caught by n==1 / n-1==0 guards, but a CONSTANT
series has n > 1 — it sails past those guards into the n-1 > 0 branch
with an exactly-zero (or float-cancellation-tiny) variance, an
all-equal rank ordering, a zero time span (max_ts == min_ts), a
zero-width histogram range (min == max), and an all-pairs-duplicate
dedup corpus. Real pipelines produce exactly this shape: a stuck
sensor, a default-valued backfill, a retry storm writing one payload
under fresh ids, day one of a single-SKU shop.

Construction: the day-one coherent row of each table is replicated K
times; primary keys (and the foreign keys pointing at them) are offset
per replica so uniqueness and join fan-out survive; every other column
repeats verbatim. lineitem k belongs to order k; all orders belong to
THE one customer (the other K-1 customers exist with no orders — also
adversarial for anti-joins). Rows are built with DuckDB over pyarrow
tables and cast back to the source schema so physical parquet types
survive (TIMESTAMP(NANOS) in events.ts included).

Usage:
    python tools/make_constant_fixture.py [src_sf_dir] [out_dir] [K]
    python tools/check_oracle.py <out_dir>            # then sweep
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow.parquet as pq

# one offset per replica, far above any fixture key domain. NOT a
# multiple of 10 and NOT the 10M offset cdc_upsert_current uses to
# synthesize its insert keys: a 10M replica stride made that query's
# derived batch carry the same key twice (replica k's insert == replica
# k+1's update), which its duplicate-key guard CORRECTLY rejects — a
# fixture/query offset collision, not a product bug
_OFF = 1_000_003


def build(src_dir: str, out: str, k: int = 6) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # (table, one-coherent-row query, key columns to offset per replica)
    picks = [
        ("orders", "SELECT * FROM src ORDER BY o_orderkey LIMIT 1",
         ["o_orderkey"]),
        (
            "lineitem",
            "SELECT * FROM src WHERE l_orderkey = (SELECT MIN(o_orderkey) "
            f"FROM '{src_dir}/orders.parquet') ORDER BY l_linenumber LIMIT 1",
            ["l_orderkey"],
        ),
        (
            "customer",
            "SELECT * FROM src WHERE c_custkey = (SELECT o_custkey FROM "
            f"'{src_dir}/orders.parquet' ORDER BY o_orderkey LIMIT 1) LIMIT 1",
            ["c_custkey"],
        ),
        ("supplier", "SELECT * FROM src ORDER BY s_suppkey LIMIT 1",
         ["s_suppkey"]),
        ("part", "SELECT * FROM src ORDER BY p_partkey LIMIT 1",
         ["p_partkey"]),
        # genuinely fixed dims: keep single-row (offsetting nationkey
        # would orphan every FK into them)
        ("nation", "SELECT * FROM src ORDER BY n_nationkey LIMIT 1", []),
        ("region", "SELECT * FROM src ORDER BY r_regionkey LIMIT 1", []),
        ("events", "SELECT * FROM src ORDER BY event_id LIMIT 1",
         ["event_id"]),
        ("documents", "SELECT * FROM src ORDER BY doc_id LIMIT 1",
         ["doc_id"]),
        ("embeddings", "SELECT * FROM src ORDER BY vec_id LIMIT 1",
         ["vec_id"]),
    ]
    for t, q, keys in picks:
        tab = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        con.register("src", tab)
        if t == "events":
            # Round-10 extension: the single replicated base row only ever
            # carries ONE event_type, so every estimator behind an
            # event_type filter (welch click/error, mann-whitney
            # view/purchase, rolling corr click+purchase) never saw a
            # constant series — the round-10 driver-fixture regen proved
            # the class real when agg_stats_moments' oracle crashed on a
            # sqrt of a float-cancelled negative variance. Two shapes per
            # registered filter type:
            #   - a constant BURST (k rows, one shared ts): zero variance,
            #     all-tied ranks, zero timespan, n > 1;
            #   - a FLATLINE (30 bucket-spaced ts steps inside the
            #     timeseries spine window): constant value over real time,
            #     reaching the bucketed rolling/lagged moments (ACF,
            #     rolling corr at its n=24 frame, bollinger) with exact
            #     zero-variance frames.
            base = f"({q}) one"
            legs = [
                f"SELECT * EXCLUDE (i) REPLACE "
                f"(event_id + i * {_OFF} AS event_id) "
                f"FROM {base}, range({k}) t(i)"
            ]
            block = k
            for typ in ("view", "purchase", "click", "error"):
                legs.append(
                    f"SELECT * EXCLUDE (i) REPLACE "
                    f"(event_id + ({block} + i) * {_OFF} AS event_id, "
                    f"'{typ}' AS event_type) "
                    f"FROM {base}, range({k}) t(i)"
                )
                block += k
            for typ in ("view", "purchase", "click", "error"):
                legs.append(
                    f"SELECT * EXCLUDE (i) REPLACE "
                    f"(event_id + ({block} + i) * {_OFF} AS event_id, "
                    f"'{typ}' AS event_type, "
                    f"TIMESTAMP '2024-01-10 00:00:00' "
                    f"+ i * INTERVAL '900 seconds' AS ts) "
                    f"FROM {base}, range(30) t(i)"
                )
                block += 30
            rq = (
                "SELECT * FROM ("
                + " UNION ALL ".join(legs)
                + ") ORDER BY event_id"
            )
        elif keys:
            repl = ", ".join(f"{c} + i * {_OFF} AS {c}" for c in keys)
            rq = (
                f"SELECT * EXCLUDE (i) REPLACE ({repl}) FROM ({q}) one, "
                f"range({k}) t(i) ORDER BY {keys[0]}"
            )
        else:
            rq = q
        res = con.execute(rq).fetch_arrow_table().cast(tab.schema)
        pq.write_table(res, os.path.join(out, f"{t}.parquet"))
        con.unregister("src")
    con.close()
    print(f"constant-series fixture written to {out}")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/constant_fixture"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    build(src, out, k)


if __name__ == "__main__":
    main()
