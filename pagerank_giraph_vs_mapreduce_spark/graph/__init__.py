from pagerank_giraph_vs_mapreduce_spark.graph.builder import GraphTables, build_graph
from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import PageRankResult, pagerank

__all__ = ["build_graph", "GraphTables", "pagerank", "PageRankResult"]
