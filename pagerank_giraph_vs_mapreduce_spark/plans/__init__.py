from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
    QUERIES,
    ORACLES,
    query,
    load_all_queries,
)

__all__ = ["QUERIES", "ORACLES", "query", "load_all_queries"]
