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
