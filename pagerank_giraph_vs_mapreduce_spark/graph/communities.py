"""Synchronous label propagation (community detection): a third iterative
kernel on the cached-DataFrame superstep skeleton (SURVEY.md §7.0), with
fully deterministic semantics so a fixed round count is expressible as an
unrolled SQL oracle.

Per round, every vertex adopts the most frequent label among its
neighbors' previous-round labels, ties broken by the smallest label
(Raghavan et al.'s LPA with a deterministic tie-break instead of the
usual random one — determinism is what makes the result verifiable and
retry/speculation-safe on a cluster).

Scale shape: identical to WCC — the symmetrized edge table shuffles once
and is cached sorted by src; each round shuffles only V-row label/vote
tables ((dst, label) partial counts combine map-side, then one max_by
aggregate per vertex); eager localCheckpoint truncates lineage per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """``rounds`` synchronous LPA rounds over the undirected deduped view
    of edges(src, dst), self-loops dropped. Returns (id, label)."""
    noself = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    sym = (
        noself.unionAll(
            noself.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition("src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    for _ in range(rounds):
        votes = (
            sym.join(labels.select(F.col("id").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # argmax by (count desc, label asc): max_by over (n, -label)
        labels = (
            votes.groupBy("id")
            .agg(
                F.max_by(
                    "label", F.struct(F.col("n"), (-F.col("label")).alias("nl"))
                ).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return labels
