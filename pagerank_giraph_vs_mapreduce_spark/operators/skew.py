"""Skew-mitigation utilities.

The reference documents its hub-vertex hot-key pathology explicitly
(README.md:417-418: all PR votes for a high-in-degree vertex land on one
reducer; README.md:386: Giraph's per-node memory skew). In this engine the
first line of defense is AQE (``spark.sql.adaptive.skewJoin`` is on in
session.py — it splits oversized shuffle partitions at runtime). Salting
is the explicit fallback for joins AQE can't fix (e.g. when the skewed
side must stay on one key for a later stage) and for non-algebraic
aggregations (collect_list/distinct) where map-side combine doesn't help.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot keys spread over ``salt_n`` shuffle partitions.

    The (large, skewed) ``left`` gets a random salt per row; the (smaller)
    ``right`` is replicated salt_n times — so each hot key's rows land on
    salt_n different reducers instead of one. Output matches a plain
    ``left.join(right, key, how)`` for ``how`` in {inner, left, left_semi,
    left_anti, cross}; right/full outer joins are rejected, because the
    replicated right side would emit every unmatched right row salt_n
    times (deduplicating them needs a second shuffle — at that point use
    AQE's skew-join handling instead).

    The salt uses a hash of the row's full content rather than rand() so
    results stay deterministic and retry-safe (a rand() salt changes on
    task retry, corrupting joins under speculative execution).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "right side duplicates unmatched right rows under right/full "
            "outer joins"
        )
    lsalt = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt_n)).cast("int")
    )
    rsalt = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt_n).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return lsalt.join(rsalt, [key, "_salt"], how).drop("_salt")


def salted_collect_set(
    df: DataFrame, key: str, value: str, salt_n: int = 8
) -> DataFrame:
    """Two-phase collect_set for skewed keys: per-(key, salt) partial sets,
    then a flatten-distinct merge — bounds any single task's set size."""
    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt_n)).cast("int")
        )
        .groupBy(key, "_salt")
        .agg(F.collect_set(value).alias("_part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.array_distinct(F.flatten(F.collect_list("_part"))).alias("values"))
    )
