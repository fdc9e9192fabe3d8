"""Property-based tests (SURVEY.md section 5.4): JSON encode round-trips
and partition-routing invariants over generated data."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_export_spark.config import UNSPECIFIED_TOKEN, parse_partition_spec
from hive_export_spark.operators.parity import to_partitioned_json

# keep Spark jobs small and unhurried: hypothesis deadlines don't fit JVM
# round-trips
SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

safe_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)
payload_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.one_of(st.none(), safe_text),
        st.one_of(st.none(), safe_text),
    ),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(rows=payload_rows)
def test_json_roundtrip(spark, rows):
    # from_json(to_json(x)) == x for arbitrary (int, string?, string?) rows
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
            T.StructField("pcol", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    encoded = to_partitioned_json(df, ["pcol"])
    decoded = encoded.select(
        F.from_json(
            "json_payload",
            T.StructType(schema.fields[:2]),
        ).alias("s")
    ).select("s.a", "s.b")
    from collections import Counter

    assert Counter((r.a, r.b) for r in decoded.collect()) == Counter(
        (a, b) for a, b, _ in rows
    )


@SETTINGS
@given(rows=payload_rows)
def test_partition_routing_invariants(spark, rows):
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
            T.StructField("pcol", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = to_partitioned_json(df, ["pcol"]).collect()
    # every input row lands in exactly one output row
    assert len(out) == len(rows)
    for r in out:
        # the partition value is never null and never blank
        assert r.pcol is not None
        assert r.pcol.strip() != ""
        # partition column is diverted out of the payload
        assert set(json.loads(r.json_payload).keys()) == {"a", "b"}
    # token appears exactly for null-or-blank inputs
    n_blank = sum(1 for _, _, p in rows if p is None or p.strip() == "")
    n_token = sum(1 for r in out if r.pcol == UNSPECIFIED_TOKEN)
    assert n_token >= n_blank  # >=: a literal token value in data also counts


spec_tables = st.lists(
    st.tuples(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        st.lists(
            st.text(alphabet="xyzw", min_size=1, max_size=5),
            min_size=1,
            max_size=3,
            unique=True,
        ),
    ),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)


@settings(max_examples=50, deadline=None)
@given(tables=spec_tables)
def test_partition_spec_grammar_roundtrip(tables):
    spec = ",".join(f"{t}:{'|'.join(cols)}" for t, cols in tables)
    parsed = parse_partition_spec(spec)
    assert parsed == {t.upper(): [c.upper() for c in cols] for t, cols in tables}


point_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),   # price
        st.integers(min_value=0, max_value=12),   # size
    ),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(pts=point_sets)
def test_skyline_definition_holds(spark, pts):
    """For arbitrary point sets (heavy ties by construction): the
    distributed skyline equals the definitional strict-dominance filter,
    including duplicate rows."""
    from hive_export_spark.operators.skyline import skyline_2d

    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = sorted(
        (r.id, r.price, r.size)
        for r in skyline_2d(df, "price", "size").collect()
    )
    want = sorted(
        (i, float(p), s)
        for i, (p, s) in enumerate(pts)
        if not any(
            q[0] <= p and q[1] >= s and (q[0] < p or q[1] > s) for q in pts
        )
    )
    assert got == want


edge_sets = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(raw=edge_sets)
def test_pagerank_mass_and_orientation_invariance(spark, raw):
    """Rank mass stays ~BASE and the result is independent of input
    partitioning for arbitrary small graphs."""
    from hive_export_spark.operators.graph import _PR_BASE, pagerank_int

    edges = sorted({(min(u, v), max(u, v)) for u, v in raw})
    df = spark.createDataFrame(edges, "u long, v long")
    r1 = {r.node: r.rank_int for r in pagerank_int(df, 2).collect()}
    r2 = {
        r.node: r.rank_int
        for r in pagerank_int(df.repartition(3), 2).collect()
    }
    assert r1 == r2
    n = len(r1)
    # each div step floors away < 1 unit per node per iteration (plus the
    # teleport rounding), so total loss is bounded by ~200 * n
    assert 0 <= _PR_BASE - sum(r1.values()) + n <= 400 * n + _PR_BASE // max(n, 1)
