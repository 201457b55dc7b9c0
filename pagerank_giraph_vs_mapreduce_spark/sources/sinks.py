"""Output sinks matching the reference's file contracts (S6-S9, FIXTURES.md F4).

- final_scores: ``id\tpr`` lines, pr formatted %.10f (the reference's final
  merge+strip pass, MR/PageRankDriver.java:323-350; C4 formatting
  MR/PageRankReducer.java:119). Intermediate iterations are NOT written —
  keeping state cached instead of HDFS-round-tripping it is the entire
  Giraph-vs-MR lesson (README.md:256-257).
- top-k: ``id\tscore`` descending (MR/PageRankDriver.java:352-384).
- timings CSV: ``Phase,Duration_ms`` (GI/PageRankMasterCompute.java:125-143;
  MR/PerformanceMonitor.java:83-99).
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import PageRankResult, top_k


def write_final_scores(ranks: DataFrame, path: str, coalesce: int | None = None) -> None:
    """S8: ``id\tpr`` TSV. ``coalesce=1`` reproduces the reference's single
    merged part file; leave None at scale (one file per partition)."""
    out = ranks.select(
        F.col("id").cast("string").alias("id"),
        F.format_string("%.10f", F.col("pr")).alias("pr"),
    )
    if coalesce:
        out = out.coalesce(coalesce)
    out.write.mode("overwrite").option("sep", "\t").csv(path)


def write_top_k(ranks: DataFrame, path: str, k: int = 50) -> None:
    """T1 sink: top-k is tiny by construction, single file is correct."""
    (
        top_k(ranks, k)
        .select(
            F.col("id").cast("string").alias("id"),
            F.format_string("%.10f", F.col("pr")).alias("score"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .csv(path)
    )


def write_timings_csv(result: PageRankResult, path: str) -> None:
    """O1/S9: driver-side metrics dict → ``Phase,Duration_ms`` CSV."""
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["Phase", "Duration_ms"])
        for it in result.history:
            w.writerow([f"Superstep_{it.iteration}", round(it.seconds * 1000.0, 3)])
