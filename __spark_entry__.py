"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on /root/testdata/sf0.001 (smoke, rows>0)
queries()     -> {name: (spark, sf_dir) -> DataFrame} for every operator
oracle_sql()  -> {name: ANSI SQL} DuckDB twins for the t2 correctness gate

Implementation lives in the hive_export_spark package; this module is a
thin shim over its registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_export_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's entire reason for existing as one
    pipeline — typed encode -> partition-token substitution -> schema-order
    JSON payload -> partition routing (SURVEY.md section 3.3) on events."""
    from hive_export_spark.queries.parity_queries import parity_json_encode

    return parity_json_encode(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
