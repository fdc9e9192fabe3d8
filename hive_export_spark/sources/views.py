"""SQL frontend: register every fixture table as a temp view so users can
run plain Spark SQL against the engine (the reference has no SQL surface;
SURVEY.md section 2 lists the SQL frontend as committed extension)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_export_spark.sources.tables import TABLE_NAMES, load_table


def register_views(
    spark: SparkSession, sf_dir: str | None = None, prefix: str = ""
) -> list[str]:
    """Register all fixture tables as temp views (optionally prefixed);
    returns the view names."""
    names = []
    for t in TABLE_NAMES:
        name = f"{prefix}{t}"
        load_table(spark, t, sf_dir).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run a SQL query against the registered fixture views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
