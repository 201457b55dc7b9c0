"""HITS (hubs & authorities) — the other classic link-analysis kernel of
the PageRank family (Kleinberg 1999), on the same cached-DataFrame
superstep skeleton.

Fixed-round, deterministic formulation so an unrolled SQL oracle can
reproduce it exactly: per round, authority = L1-normalized in-sum of hub
scores, then hub = L1-normalized out-sum of the NEW authority scores
(the standard alternating update; L1 instead of L2 normalization keeps
the arithmetic sqrt-free). All sums accumulate as exact DECIMAL(38,12)
before one double division + 9-dp round — the same cross-engine numeric
discipline as the PageRank/k-means oracles.

Scale shape per round: two E-row equi-joins against the cached edge
table (each followed by a map-side-combined sum) and two in-plan 1-row
L1 aggregates broadcast back — only V-row score tables move between
rounds; no driver-side values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _l1_normalize(scores: DataFrame, col: str) -> DataFrame:
    """Divide ``col`` by its exact-decimal L1 sum, round to 9 dp."""
    total = scores.agg(
        F.sum(F.col(col).cast("decimal(38,12)")).cast("double").alias("_l1")
    )
    return scores.crossJoin(F.broadcast(total)).select(
        "id", F.round(F.col(col) / F.col("_l1"), 9).alias(col)
    )


def hits(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """``rounds`` alternating authority/hub updates over the deduped
    directed edges(src, dst). Returns (id, auth, hub) for every vertex in
    the universe; vertices without in-(out-)edges score 0 authority
    (hub) pre-normalization. ``rounds`` must be >= 1 — with zero rounds
    there is no authority frame to return."""
    if rounds < 1:
        raise ValueError(f"hits() needs rounds >= 1, got {rounds}")
    e = edges.select("src", "dst").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    hub = verts.select("id", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(rounds):
        in_sum = (
            e.join(hub.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("hub").cast("decimal(38,12)")).cast("double").alias("auth"))
        )
        auth = verts.join(in_sum, "id", "left").select(
            "id", F.coalesce("auth", F.lit(0.0)).alias("auth")
        )
        auth = _l1_normalize(auth, "auth").localCheckpoint(eager=True)
        out_sum = (
            e.join(auth.select(F.col("id").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("auth").cast("decimal(38,12)")).cast("double").alias("hub"))
        )
        hub = verts.join(out_sum, "id", "left").select(
            "id", F.coalesce("hub", F.lit(0.0)).alias("hub")
        )
        hub = _l1_normalize(hub, "hub").localCheckpoint(eager=True)
    e.unpersist()
    return auth.join(hub, "id").select("id", "auth", "hub")
