"""PySpark-native analytics engine with the capability surface of
AkanthaWang/PageRank-Giraph-vs-MapReduce (reference: /root/reference).

The reference implements PageRank (damping, dangling-mass redistribution,
L1 convergence) twice — as chained Hadoop MapReduce jobs and as a Giraph
BSP computation. This engine re-expresses that surface idiomatically in
PySpark: cached DataFrames + a driver-side superstep loop (the Spark-native
rendering of both reference designs, cf. SURVEY.md §7.0), plus the
relational and LLM-data-pipeline operator surface built on Spark SQL.
"""

from pagerank_giraph_vs_mapreduce_spark.catalog import open_catalog, sql
from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import (
    pagerank,
    personalized_pagerank,
    top_k,
)
from pagerank_giraph_vs_mapreduce_spark.session import get_spark

__all__ = [
    "pagerank",
    "personalized_pagerank",
    "top_k",
    "get_spark",
    "open_catalog",
    "sql",
]
__version__ = "0.1.0"
