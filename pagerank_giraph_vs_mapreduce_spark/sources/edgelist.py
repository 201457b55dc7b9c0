"""SNAP edge-list text source (reference operators S1-S3, P1).

The reference scans SNAP files line-by-line, dropping blank lines and
``#`` comments (MR/GraphBuilderMapper.java:23-26), whitespace-splitting into
(src, dst) and silently dropping malformed rows (<2 tokens, non-numeric —
MR/GraphBuilderMapper.java:29-38, MR/PageRankDriver.java:362-371). We keep
the drop-don't-fail policy but count rejects with ``observe()`` metrics
(Spark-native replacement for the reference's DataQuality counters,
MR/PageRankReducer.java:50-52,64-67).

Scale notes: a pure-projection pipeline over ``spark.read.text`` — no
shuffle, whole-stage-codegen'd, splits across executors by HDFS block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def parse_edgelist(lines: DataFrame, observation: Observation | None = None) -> DataFrame:
    """Parse a one-string-column DataFrame of SNAP lines into edges(src, dst).

    Malformed rows (blank, comment, <2 tokens, non-integer token) are dropped,
    mirroring MR/GraphBuilderMapper.java:23-38's silent-drop policy.
    """
    col = lines.columns[0]
    trimmed = lines.select(F.trim(F.col(col)).alias("line"))
    if observation is not None:
        trimmed = trimmed.observe(
            observation,
            F.count(F.lit(1)).alias("lines_total"),
            F.count(F.when(F.col("line").startswith("#"), 1)).alias("lines_comment"),
            F.count(F.when(F.col("line") == "", 1)).alias("lines_blank"),
        )
    tokens = (
        trimmed.filter((F.col("line") != "") & ~F.col("line").startswith("#"))
        .select(F.split("line", r"\s+").alias("t"))
    )
    return (
        tokens.select(
            F.col("t").getItem(0).try_cast("bigint").alias("src"),
            F.col("t").getItem(1).try_cast("bigint").alias("dst"),
        )
        # try_cast: non-numeric tokens become NULL and are dropped
        # (reference: NumberFormatException swallowed, PageRankDriver.java:362-371)
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )


def read_edgelist(spark: SparkSession, path: str) -> DataFrame:
    """S1: scan a SNAP-format text file/dir into edges(src BIGINT, dst BIGINT)."""
    return parse_edgelist(spark.read.text(path))
