"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the PageRank kernel — the
reference's entire raison d'être — over the derived edges graph at
sf0.001). ``queries()``/``oracle_sql()`` expose the declared operator
surface registered in pagerank_giraph_vs_mapreduce_spark/plans/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from pagerank_giraph_vs_mapreduce_spark.plans.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full PageRank (converged, d=0.85) on the sf0.001 graph,
    returning the top-50 vertices — the reference's headline artifact
    (pagerankTop_50.txt, MR/PageRankDriver.java:352-384)."""
    from pyspark.sql import functions as F

    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank, top_k
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import derived_edges

    edges = derived_edges(spark, "/root/testdata/sf0.001")
    result = pagerank(edges, damping=0.85, max_iter=30, tol=1e-8, min_iter=5)
    return top_k(result.ranks, 50).select("id", F.round("pr", 9).alias("pr"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all_queries()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all_queries()
    return dict(ORACLES)
