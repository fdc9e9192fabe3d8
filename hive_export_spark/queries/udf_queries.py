"""Pandas-UDF surface (SURVEY.md section 2.2: "pandas_udf scalar /
grouped-agg / grouped-map (applyInPandas) — the only sanctioned escape
hatch"). These exist to pin the Arrow seams; equivalent built-ins are
preferred in real pipelines (and the oracles prove the equivalence).

Determinism notes: scalar UDFs are elementwise float64 ops — bit-identical
to the SQL oracle. Grouped-map outputs use unique sort keys so pandas-side
ordering cannot flap the hash.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_export_spark.registry import register
from hive_export_spark.sources import load_table


@F.pandas_udf(T.DoubleType())
def _net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    # vectorized Arrow batch math; elementwise double ops == JVM/SQL doubles
    return price * (1.0 - discount)


@register(
    "udf_scalar_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS net_price
FROM lineitem WHERE l_orderkey <= 2000
""",
    doc="scalar pandas_udf (Arrow-vectorized): elementwise net price — "
    "bit-identical to the built-in expression it stands in for",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "udf_grouped_map_pandas",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS seq
FROM orders WHERE o_custkey <= 500
""",
    doc="grouped-map applyInPandas: per-customer order sequencing inside a "
    "pandas DataFrame per group (Arrow batches; deterministic via unique "
    "sort key) — the grouped escape hatch for logic windows can't express",
)
def udf_grouped_map_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 500)

    def sequence_orders(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o_orderkey")
        pdf["seq"] = range(1, len(pdf) + 1)
        return pdf[["o_custkey", "o_orderkey", "seq"]]

    return o.select("o_custkey", "o_orderkey").groupBy("o_custkey").applyInPandas(
        sequence_orders, schema="o_custkey long, o_orderkey long, seq long"
    )


@register(
    "udf_grouped_agg_pandas",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY o_orderstatus
""",
    doc="grouped-agg pandas_udf: per-group reduction in pandas — summed in "
    "exact decimal pennies to stay order-independent (a raw float sum "
    "would be partition-order-dependent)",
)
def udf_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)

    @F.pandas_udf("double")
    def penny_sum(v: pd.Series) -> float:
        # NULLs arrive as NaN; astype(int64) RAISES on them, and a group
        # of only NULLs must return NULL like SQL SUM, not 0.0 (round-9
        # all-NULL sweep)
        v = v.dropna()
        if v.empty:
            return None
        # exact integer-penny arithmetic -> order-independent
        return float(round(v.mul(100).round().astype("int64").sum()) / 100.0)

    return o.groupBy("o_orderstatus").agg(
        penny_sum("o_totalprice").alias("total_price")
    )


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS net_price
FROM lineitem WHERE l_orderkey <= 2000
""",
    doc="mapInArrow (Spark 4): whole-partition transform over raw "
    "pyarrow.RecordBatch objects — the zero-copy tier below pandas UDFs "
    "(no pandas materialization, columns stay Arrow buffers end to end). "
    "The batch math runs in Arrow's C++ compute kernels, so elementwise "
    "float64 results are bit-identical to the SQL oracle. This is the "
    "seam for vectorized Python libraries that speak Arrow natively "
    "(tokenizers, image codecs) without the pandas round-trip tax.",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )

    def add_net_price(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            net = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), net],
                ["l_orderkey", "l_linenumber", "net_price"],
            )

    return li.mapInArrow(
        add_net_price, "l_orderkey long, l_linenumber int, net_price double"
    )


@register(
    "udtf_word_positions",
    oracle="""
SELECT doc_id, CAST(pos AS BIGINT) AS pos, word FROM (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE doc_id <= 200
) WHERE pos <= 5
""",
    doc="Python UDTF (Spark 4): a user-defined TABLE function applied per "
    "row via LATERAL join — each document expands to its first five "
    "(position, word) rows. UDTFs are the sanctioned seam for "
    "one-row-to-many-rows Python logic (parsers, tokenizers) that scalar "
    "UDFs cannot express; Catalyst plans the lateral as a distributed "
    "generate, never a driver loop. Equivalent built-in (posexplode of "
    "split) proven by the oracle.",
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, word string")
    class HeadWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")[:5], start=1):
                yield i, w

    spark.udtf.register("__head_words", HeadWords)
    load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") <= 200
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM __udtf_docs d, LATERAL __head_words(d.text) t
        """
    )


@register(
    "udf_scalar_iter_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS net_price_iter
FROM lineitem WHERE l_orderkey <= 2000
""",
    doc="iterator-form scalar pandas_udf (Iterator[Series] -> "
    "Iterator[Series]): same elementwise net price as udf_scalar_pandas "
    "but through the batch-iterator protocol — the variant that "
    "amortizes expensive one-time setup (model load, dictionary mmap) "
    "across ALL Arrow batches of a partition instead of paying it per "
    "batch. Setup-once semantics pinned by construction: the "
    "'initialized' state is created before the loop and reused.",
)
def udf_scalar_iter_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def net_price_iter(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # one-time setup lives here, before the batch loop
        one = 1.0
        for price, disc in batches:
            yield price * (one - disc)

    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price_iter("l_extendedprice", "l_discount").alias("net_price_iter"),
    )


@register(
    "udf_window_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(round(AVG(CAST(l_quantity AS DECIMAL(12,2))) OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS DOUBLE)
         AS running_avg_qty
FROM lineitem WHERE l_orderkey <= 2000
""",
    doc="pandas_udf as a WINDOW function (grouped-agg UDF over a running "
    "frame): the third pandas-UDF execution mode after scalar and "
    "grouped-agg — Spark evaluates the Arrow-batched aggregate once "
    "per frame. The UDF computes the running mean of exact decimal "
    "quantities; the oracle is the built-in windowed AVG over the same "
    "pinned frame, so the UDF must agree with the engine's own "
    "aggregate to 6 decimals. Frame and (linenumber, partkey) order "
    "pinned on both sides.",
)
def udf_window_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    @F.pandas_udf("double")
    def mean_qty(q: pd.Series) -> float:
        return float(q.mean())

    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") <= 2000)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            mean_qty(F.col("l_quantity").cast("decimal(12,2)").cast("double")).over(w),
            6,
        ).cast("double").alias("running_avg_qty"),
    )
