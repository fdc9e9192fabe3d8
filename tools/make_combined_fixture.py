"""Build a COMBINED-ADVERSITY fixture: degenerate classes INTERACTING in
single rows, laced into an intact copy of a clean fixture.

Why this is its own generation (round 10, after all-NULL-payload): the six
prior generations sweep each degenerate class in isolation — hostile laces
one class per row, day-zero/day-one/constant/all-null degrade whole tables
one way at a time. The round-9 all-NULL wave proved isolation hides bugs
(30 failures invisible to six prior sweeps, because degenerate rows behaved
differently once they could not hide behind healthy ones). This generation
probes the INVERSE blind spot: two or more degenerate classes landing on
the SAME row, where each class's pinned handling can disable or distort the
other's —
  * a duplicate-PK document whose text is NULL: the duplicate-PK DQ rule
    must still count it while the NULL-text signature-scan drop removes it
    from MinHash before it can form a clique;
  * a constant-zero event series that CONTAINS the epoch-0 and pre-epoch
    clock-corruption rows: zero variance, zero mean, zero sum AND negative-
    epoch bucketing/watermark quarantine on the same series;
  * a guest-checkout order (NULL custkey) dated the 9999-12-31 sentinel:
    the NULL-FK group and the year-9999 calendar ceiling on one row;
  * an orphan lineitem with zero quantity, 100 % discount and a sentinel
    shipdate: anti-join visibility with every ratio feature degenerate;
  * an SCD duplicate customer where only ONE version lost its nation FK:
    asymmetric join fanout across versions of the same business key;
  * an at-least-once duplicate event that is both anonymous (NULL user_id)
    and measurement-less (NULL value);
  * a burst (one shared timestamp, n>1) whose every value is NULL;
  * a duplicate-PK zero-vector embedding with a NULL label, and a NULL
    embedding that is its label's ONLY row (a singleton group with zero
    valid vectors).

Construction mirrors make_hostile_fixture: every original row is kept (the
fixture-shape properties queries rely on keep holding) and each file's
exact parquet schema is preserved (pyarrow concat + cast — a DuckDB rewrite
would silently retype timestamps). Laced keys use the 910001+ / 3.1e9
ranges, disjoint from the hostile fixture's 900001+ / 3.0e9 so the two
generations could ever be unioned, and away from cdc_upsert_current's +10M
synthetic insert offset (the round-9 stride rule).

Divergent-attribute duplicates follow the hostile precedent: byte-identical
payloads wherever a query could make a per-key arbitrary pick (documents,
events, embeddings); the customer SCD pair is attribute-divergent like the
hostile BIG+10 pair because every registered per-key pick there is
explicitly ordered.

Usage:
    python tools/make_combined_fixture.py [src_sf_dir] [out_dir]
    python tools/check_oracle.py <out_dir>            # then sweep
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

BIG2 = 3_100_000_000  # > int32, disjoint from the hostile fixture's 3.0e9


def _append(src: str, out: str, table_name: str, rows: list[dict]) -> None:
    t = pq.read_table(os.path.join(src, f"{table_name}.parquet"))
    schema = t.schema.remove_metadata()
    if rows:
        cols = {}
        for field in schema:
            cols[field.name] = pa.array(
                [r.get(field.name) for r in rows], type=field.type
            )
        extra = pa.table(cols, schema=schema)
        t = pa.concat_tables([t.replace_schema_metadata(None), extra])
    pq.write_table(t, os.path.join(out, f"{table_name}.parquet"))


def build(src: str, out: str) -> None:
    """Write the combined-adversity copy of ``src`` into ``out``
    (importable entry point — check_oracle.py --combined-fixture calls
    this)."""
    os.makedirs(out, exist_ok=True)

    _append(src, out, "documents", [
        # duplicate PK x all-NULL payload: the DQ duplicate-pk rule must
        # count the pair while the NULL-text drop keeps it out of every
        # MinHash/shingle path (no j=1.0 clique, no xxhash64(NULL)
        # constant signature). Byte-identical rows keep per-id picks
        # content-invariant.
        dict(doc_id=910001, text=None, lang=None, source=None,
             n_chars=None),
        dict(doc_id=910001, text=None, lang=None, source=None,
             n_chars=None),
        # empty text x NULL routing keys: every ratio/langid/route
        # expression degenerates on the same row its classification
        # keys are missing
        dict(doc_id=910002, text="", lang=None, source=None, n_chars=0),
        # whitespace-only text x NULL lang/source x NULL n_chars: trim
        # yields empty AND the recorded length is unknown
        dict(doc_id=910003, text=" \t ", lang=None, source=None,
             n_chars=None),
    ])

    mid = datetime(2024, 6, 15, 12, 0, 0)
    _append(src, out, "events", [
        # constant-ZERO series CONTAINING the clock-corruption rows: a
        # stuck sensor with an unset clock. Zero variance (corr/stddev
        # guards), zero mean AND zero sum (every normalize-by-mean/sum),
        # pre-epoch + epoch-0 bucketing (floor vs truncate, watermark
        # quarantine) — one series, five pinned conventions interacting.
        dict(event_id=910001, ts=datetime(1969, 12, 31, 23, 30, 0),
             user_id=16, event_type="frozen", value=0.0, props="{}"),
        dict(event_id=910002, ts=datetime(1970, 1, 1, 0, 0, 0),
             user_id=16, event_type="frozen", value=0.0, props="{}"),
        dict(event_id=910003, ts=mid, user_id=16, event_type="frozen",
             value=0.0, props="{}"),
        dict(event_id=910004, ts=datetime(2024, 6, 15, 13, 0, 0),
             user_id=16, event_type="frozen", value=0.0, props="{}"),
        # at-least-once duplicate x anonymous x measurement-less: the
        # same delivery twice, no user, no value. Exactly-once consumers
        # collapse by event_id; plain scans count both; NULL group and
        # NULL-measurement conventions apply to the SAME rows.
        dict(event_id=910010, ts=datetime(2024, 6, 15, 14, 0, 0),
             user_id=None, event_type="view", value=None, props="{}"),
        dict(event_id=910010, ts=datetime(2024, 6, 15, 14, 0, 0),
             user_id=None, event_type="view", value=None, props="{}"),
        # zero-timespan burst x all-NULL values: n>1, dt == 0, nothing
        # to measure — delta/rate sees zero intervals over NULLs,
        # rank-by-value must pin NULLS LAST with a non-ts tiebreak
        dict(event_id=910021, ts=datetime(2024, 6, 15, 15, 0, 0),
             user_id=17, event_type="nullburst", value=None, props="{}"),
        dict(event_id=910022, ts=datetime(2024, 6, 15, 15, 0, 0),
             user_id=17, event_type="nullburst", value=None, props="{}"),
        dict(event_id=910023, ts=datetime(2024, 6, 15, 15, 0, 0),
             user_id=17, event_type="nullburst", value=None, props="{}"),
    ])

    _append(src, out, "orders", [
        # guest checkout x sentinel "never" date x boundary price: the
        # NULL-custkey group gains a row whose date sits on the calendar
        # ceiling — customer joins drop it, date arithmetic must pin the
        # past-9999 NULL convention, money casts sit at the top of the
        # DECIMAL(12,2) domain
        dict(o_orderkey=BIG2, o_custkey=None, o_orderstatus="O",
             o_totalprice=999999.99, o_orderdate=datetime(9999, 12, 31),
             o_orderpriority="5-LOW"),
    ])

    _append(src, out, "lineitem", [
        # orphan (parent order never landed) x zero quantity x 100 %
        # discount x sentinel shipdate x >int32 key: anti-joins must
        # surface it, inner joins drop it, and every surviving ratio
        # (revenue, discount share, qty stats) is degenerate at once
        dict(l_orderkey=BIG2 + 50, l_partkey=1, l_suppkey=1,
             l_linenumber=1, l_quantity=0.0, l_extendedprice=0.01,
             l_discount=1.0, l_tax=0.0, l_returnflag="N",
             l_linestatus="O", l_shipdate=datetime(9999, 12, 31)),
    ])

    _append(src, out, "customer", [
        # botched SCD merge x failed enrichment ON ONE VERSION ONLY x
        # negative balance: the same business key fans out to DIFFERENT
        # cardinalities through nation joins (v1 drops, v2 survives).
        # Attribute-divergent like the hostile SCD pair — every
        # registered per-key pick is explicitly ordered.
        dict(c_custkey=BIG2 + 10, c_name="Customer#combined-v1",
             c_nationkey=None, c_acctbal=-42.0, c_mktsegment="BUILDING"),
        dict(c_custkey=BIG2 + 10, c_name="Customer#combined-v2",
             c_nationkey=1, c_acctbal=42.0, c_mktsegment="MACHINERY"),
    ])

    dim = 64
    _append(src, out, "embeddings", [
        # duplicate PK x zero vector x NULL label: an at-least-once
        # writer re-emitted a degenerate embedding nobody labelled.
        # Exactly-once ANN keys on vec_id; cosine guards the zero norm;
        # label grouping gains a NULL member. Byte-identical pair.
        dict(vec_id=910001, embedding=[0.0] * dim, label=None),
        dict(vec_id=910001, embedding=[0.0] * dim, label=None),
        # NULL embedding that is its label's ONLY row: a singleton group
        # with zero valid vectors — per-label centroids/stats must emit
        # the group with NULL aggregates (or drop it identically), never
        # crash fitting nothing
        dict(vec_id=910002, embedding=None, label=98),
    ])

    for t in ("region", "nation", "supplier", "part"):
        _append(src, out, t, [])

    print(f"combined-adversity fixture written to {out}")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/combined_fixture"
    build(src, out)


if __name__ == "__main__":
    main()
