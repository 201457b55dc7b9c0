from pagerank_giraph_vs_mapreduce_spark.sources.edgelist import read_edgelist
from pagerank_giraph_vs_mapreduce_spark.sources.tables import derived_edges, load_table

__all__ = ["read_edgelist", "load_table", "derived_edges"]
