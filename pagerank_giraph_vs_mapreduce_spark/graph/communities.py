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

from pagerank_giraph_vs_mapreduce_spark.graph.builder import dedup_src_sorted


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """``rounds`` synchronous LPA rounds over the undirected deduped view
    of edges(src, dst), self-loops dropped. Returns (id, label)."""
    noself = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    # ONE E-row shuffle (dedup_src_sorted), cached sorted by src.
    sym = dedup_src_sorted(
        noself.unionAll(
            noself.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
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


def louvain_one_level(
    edges: DataFrame, rounds: int = 2, weight_col: str | None = None
) -> DataFrame:
    """``rounds`` synchronous one-level MODULARITY-optimization sweeps
    (the local-move phase of Louvain/Leiden, determinized): every vertex
    simultaneously evaluates, for each community among its neighbors
    plus its own, the modularity gain of joining it,

        score(i -> C) = k_{i,C} - k_i * (Sigma_tot(C) - [c_i = C] k_i) / 2m

    (Blondel et al. 2008 eq. 2 with the constant 1/2m factor dropped —
    argmax-invariant), and adopts the argmax community, ties broken by
    the SMALLEST community id. Candidates are RESTRICTED to communities
    with id <= the vertex's current one ("monotone labels", the same
    min-id drain discipline as WCC): unrestricted synchronous sweeps
    oscillate — two singleton neighbors adopt each other's label forever
    and modularity can drop (the known parallel-Louvain swap problem);
    the restriction breaks every 2-cycle because only one side of a swap
    is ever allowed. Synchronous sweeps still carry no universal
    monotonicity theorem, so the modularity non-decrease property is
    pinned empirically on seeded fixtures
    (tests/test_round10_ops.py::test_louvain_modularity_nondecreasing_per_round).
    Deterministic (no vertex-visit order, no randomness), so a fixed
    round count unrolls into an exact SQL oracle — the same discipline
    as label_propagation above. Returns (id, community) over the
    undirected deduped self-loop-free graph.

    Cross-engine exactness: k, k_in, Sigma_tot and 2m are integers; the
    score is two exact integer-valued double products plus ONE division
    and one subtraction — bit-identical IEEE in Spark and DuckDB, so the
    double argmax (and its tie-break) agrees across engines.

    Scale shape: identical to LPA — the symmetrized edge table shuffles
    once and is cached; each round moves only V-row community tables and
    (id, community)-grained neighbor counts (map-side combined), plus a
    community-count-row Sigma_tot aggregate; 2m rides a broadcast 1-row
    crossJoin, never the driver; eager localCheckpoint truncates lineage
    per round."""
    if weight_col is None:
        # unweighted: symmetrize + DEDUP (a reciprocal directed pair is
        # ONE undirected edge of weight 1 — the certified g_louvain_r2
        # semantics), then attach w = 1
        noself = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
        sym0 = dedup_src_sorted(
            noself.unionAll(
                noself.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
        ).select("src", "dst", F.lit(1).alias("w"))
    else:
        # weighted: symmetrize, MERGING parallel/reverse edges by INTEGER
        # weight sum — weighted modularity stays exact because every
        # quantity below (w, k, kin, tot, 2m) remains an integer
        noself = edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col(weight_col).cast("bigint").alias("w")
        )
        sym0 = dedup_src_sorted(
            noself.unionAll(
                noself.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
                )
            ),
            agg=[F.sum("w").alias("w")],
        )
    # dedup_src_sorted already leaves sym0 hash-partitioned + sorted by
    # src in ONE shuffle (previously: distinct/groupBy exchange PLUS a
    # repartition("src") exchange).
    sym = sym0.persist(StorageLevel.MEMORY_AND_DISK)
    kdeg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").alias("k")
    )
    m2 = sym.agg(F.sum("w").cast("double").alias("m2"))  # = 2m
    comm = kdeg.select("id", F.col("id").alias("c"))
    for _ in range(rounds):
        ctot = (
            comm.join(kdeg, "id")
            .groupBy("c")
            .agg(F.sum("k").alias("tot"))
        )
        nbr = (
            sym.join(comm.select(F.col("id").alias("dst"), F.col("c").alias("cc")), "dst")
            .groupBy(F.col("src").alias("id"), "cc")
            .agg(F.sum("w").alias("kin"))
        )
        own = comm.select("id", F.col("c").alias("cc"), F.lit(0).alias("kin"))
        cand = (
            nbr.unionByName(own)
            .groupBy("id", "cc")
            .agg(F.sum("kin").alias("kin"))
        )
        scored = (
            cand.join(kdeg, "id")
            .join(comm, "id")
            .filter(F.col("cc") <= F.col("c"))  # monotone labels: no swaps
            .join(ctot.select(F.col("c").alias("cc"), "tot"), "cc")
            .crossJoin(F.broadcast(m2))
            .select(
                "id",
                "cc",
                (
                    F.col("kin").cast("double")
                    - F.col("k").cast("double")
                    * (
                        F.col("tot")
                        - F.when(F.col("cc") == F.col("c"), F.col("k")).otherwise(
                            F.lit(0)
                        )
                    ).cast("double")
                    / F.col("m2")
                ).alias("score"),
            )
        )
        comm = (
            scored.groupBy("id")
            .agg(
                F.max_by(
                    "cc", F.struct(F.col("score"), (-F.col("cc")).alias("nc"))
                ).alias("c")
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return comm.select("id", F.col("c").alias("community"))


def louvain_two_level(
    edges: DataFrame, rounds1: int = 2, rounds2: int = 2
) -> DataFrame:
    """The FULL Louvain loop, one aggregation deep: level-1 local-move
    sweeps (louvain_one_level), then the classic community-aggregation
    phase — each level-1 community becomes a super-vertex of the
    condensed weighted multigraph, INCLUDING the self-loop rows that
    carry its internal half-edge mass (w(C,C) = 2 x internal edges; this
    is what makes the super-vertex degree k_C = 2*in_C + cut_C correct)
    — and ``rounds2`` weighted sweeps on the condensed graph. Final
    assignment maps every original vertex through both levels.

    Level-2 scoring detail: the self-loop mass counts toward k_i and
    Sigma_tot (it moves WITH the super-vertex) but is EXCLUDED from
    k_{i,C} even for the own community — a self-loop is not a link to a
    neighbor, and counting it would bias every super-vertex toward
    staying put by exactly its internal mass. All quantities remain
    integers, so cross-engine exactness matches the one-level kernels;
    the level-2 modularity improvement is pinned on seeded fixtures
    (two bridged 4-cliques reach the true optimum partition, Q 0.24 ->
    0.42, where one level leaves the bridge community unmerged).

    Scale shape: the condensed graph has |C1| vertices — typically
    orders of magnitude smaller than V — so level 2 costs a small
    fraction of level 1; the aggregation itself is one E-row join to
    the V-row assignment plus a map-side-combined count."""
    c1 = louvain_one_level(edges, rounds=rounds1)
    noself = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    sym1 = noself.unionAll(
        noself.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    cond = (
        sym1.join(
            c1.select(F.col("id").alias("src"), F.col("community").alias("cu")),
            "src",
        )
        .join(
            c1.select(F.col("id").alias("dst"), F.col("community").alias("cv")),
            "dst",
        )
        .groupBy(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)  # reused every level-2 round
    )
    kdeg = cond.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    m2 = cond.agg(F.sum("w").cast("double").alias("m2"))
    links = cond.filter(F.col("src") != F.col("dst"))  # self mass not a link
    comm = kdeg.select("id", F.col("id").alias("c"))
    for _ in range(rounds2):
        ctot = comm.join(kdeg, "id").groupBy("c").agg(F.sum("k").alias("tot"))
        nbr = (
            links.join(
                comm.select(F.col("id").alias("dst"), F.col("c").alias("cc")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "cc")
            .agg(F.sum("w").alias("kin"))
        )
        own = comm.select("id", F.col("c").alias("cc"), F.lit(0).alias("kin"))
        cand = (
            nbr.unionByName(own).groupBy("id", "cc").agg(F.sum("kin").alias("kin"))
        )
        scored = (
            cand.join(kdeg, "id")
            .join(comm, "id")
            .filter(F.col("cc") <= F.col("c"))  # monotone labels: no swaps
            .join(ctot.select(F.col("c").alias("cc"), "tot"), "cc")
            .crossJoin(F.broadcast(m2))
            .select(
                "id",
                "cc",
                (
                    F.col("kin").cast("double")
                    - F.col("k").cast("double")
                    * (
                        F.col("tot")
                        - F.when(F.col("cc") == F.col("c"), F.col("k")).otherwise(
                            F.lit(0)
                        )
                    ).cast("double")
                    / F.col("m2")
                ).alias("score"),
            )
        )
        comm = (
            scored.groupBy("id")
            .agg(
                F.max_by(
                    "cc", F.struct(F.col("score"), (-F.col("cc")).alias("nc"))
                ).alias("c")
            )
            .localCheckpoint(eager=True)
        )
    return c1.join(
        comm.select(F.col("id").alias("community"), F.col("c").alias("c2")),
        "community",
    ).select("id", F.col("c2").alias("community"))
