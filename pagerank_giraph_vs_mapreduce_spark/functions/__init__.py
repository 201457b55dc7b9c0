from pagerank_giraph_vs_mapreduce_spark.functions import hashing

__all__ = ["hashing"]
