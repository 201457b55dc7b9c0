"""User-facing SQL catalog: register the engine's tables as views and run
ad-hoc SQL (the ``engine.sql(...)`` surface from SURVEY.md §3.4).

The reference has no SQL layer at all — its "queries" are two hand-built
pipelines. Here, every table the driver ships plus the derived ``edges``
graph view becomes queryable ANSI SQL, compiled by Catalyst with the same
pushdown/pruning/AQE treatment as the declared DataFrame queries.

Views are lazy: registering costs nothing until a query scans one, and a
query touching one view reads only that parquet — so `open_catalog` at
100 TB is free until you ask for data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pagerank_giraph_vs_mapreduce_spark.sources.tables import (
    TABLES,
    derived_edges,
    load_table,
)


def open_catalog(spark: SparkSession, sf_dir: str) -> None:
    """Register every engine table (and the derived ``edges`` graph) as a
    temp view so ``spark.sql`` / :func:`sql` can reference them by name."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    derived_edges(spark, sf_dir).createOrReplaceTempView("edges")


def sql(spark: SparkSession, statement: str) -> DataFrame:
    """Run an ANSI-SQL statement against the registered catalog."""
    return spark.sql(statement)
