"""Breadth-first shortest paths (hop counts) from a source vertex — a third
iterative kernel on the cached-DataFrame superstep skeleton (SURVEY.md §7.0,
same I1-I4 machinery as graph/pagerank.py and graph/components.py).

The reference implements only PageRank (MR/PageRankDriver.java,
GI/PageRankVertex.java); BFS demonstrates the same scatter/gather loop with
frontier semantics: per superstep, ONLY the frontier (vertices first reached
last hop) joins the edge table — message volume is O(frontier out-degree),
not O(E), so supersteps get *cheaper* as the frontier collapses.

Scale notes (100 TB): the edge table shuffles once at build (repartition by
src, cached); each hop shuffles frontier-out-neighbors only. The settled
`dist` table grows monotonically to V rows; `localCheckpoint` per hop keeps
its lineage flat. For huge-diameter graphs the loop count is the diameter —
acceptable because per-hop cost tracks frontier size, not graph size.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from pagerank_giraph_vs_mapreduce_spark.graph.builder import dedup_src_sorted


@dataclass
class BfsResult:
    distances: DataFrame  # (id BIGINT, dist BIGINT) — only reached vertices
    iterations: int
    history: list[tuple[int, int, float]] = field(default_factory=list)
    # (hop, frontier_size, seconds)


def bfs_distances(edges: DataFrame, source: int, max_hops: int = 10) -> BfsResult:
    """Minimum hop count from ``source`` along directed edges(src, dst).

    Returns only vertices reachable within ``max_hops`` (the source itself
    at dist 0). Duplicate edges are deduped (A2 semantics); unreachable
    vertices are absent, mirroring a recursive-SQL BFS oracle.
    """
    spark = edges.sparkSession
    # ONE E-row shuffle (dedup_src_sorted). Sorted cache: if a hop's
    # frontier is big enough for a sort-merge join, the E side needs
    # neither Exchange nor Sort per hop.
    links = dedup_src_sorted(edges.select("src", "dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    dist = spark.createDataFrame([(int(source), 0)], "id bigint, dist bigint").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    frontier = dist.select("id")

    history: list[tuple[int, int, float]] = []
    iterations = 0
    for hop in range(1, max_hops + 1):
        t0 = time.monotonic()
        # Scatter from the frontier only; anti-join drops settled vertices —
        # BFS's "first arrival is the minimum" invariant.
        reached = (
            links.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist.select("id"), "id", "left_anti")
            .select("id", F.lit(hop).cast("bigint").alias("dist"))
        )
        # Lazy localCheckpoint both truncates lineage and stores the RDD —
        # the count below is the hop's single action and materializes it.
        # Counting this hop's rows directly on the checkpointed frame keeps
        # the bookkeeping correct even if a hop re-executes (the previous
        # history-sum subtraction assumed exactly-once accounting).
        new_dist = dist.unionAll(reached).localCheckpoint(eager=False)
        n_new = new_dist.filter(F.col("dist") == hop).count()
        dist.unpersist()
        dist = new_dist
        frontier = dist.filter(F.col("dist") == hop).select("id")
        iterations = hop
        history.append((hop, int(n_new), time.monotonic() - t0))
        if n_new == 0:
            break

    links.unpersist()
    return BfsResult(distances=dist, iterations=iterations, history=history)


def multi_bfs(
    edges: DataFrame, sources: list[int], max_hops: int = 10
) -> BfsResult:
    """Hop counts from EVERY source in ``sources`` in ONE shared traversal:
    the frontier is (vertex, source) pairs, so each hop makes a single pass
    over the cached edge table no matter how many sources are live — the
    standard batched-BFS trick behind diameter/closeness estimation, where
    running K independent BFS kernels would scan the edges K times per hop.

    Returns distances(id, source, dist) for every (vertex, source) pair
    reachable within ``max_hops``. Worst-case frontier is K·V pairs, so K
    is a memory knob, not a wall-clock multiplier; per-hop cost tracks the
    COMBINED frontier's out-degree. Settled pairs are dropped by a
    composite-key anti-join (first arrival = minimum hops, per source)."""
    if not sources:
        raise ValueError("multi_bfs needs at least one source")
    spark = edges.sparkSession
    links = dedup_src_sorted(edges.select("src", "dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources],
        "id bigint, source bigint, dist bigint",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    frontier = dist.select("id", "source")

    history: list[tuple[int, int, float]] = []
    iterations = 0
    for hop in range(1, max_hops + 1):
        t0 = time.monotonic()
        reached = (
            links.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "source")
            .distinct()
            .join(dist.select("id", "source"), ["id", "source"], "left_anti")
            .select("id", "source", F.lit(hop).cast("bigint").alias("dist"))
        )
        new_dist = dist.unionAll(reached).localCheckpoint(eager=False)
        n_new = new_dist.filter(F.col("dist") == hop).count()
        dist.unpersist()
        dist = new_dist
        frontier = dist.filter(F.col("dist") == hop).select("id", "source")
        iterations = hop
        history.append((hop, int(n_new), time.monotonic() - t0))
        if n_new == 0:
            break

    links.unpersist()
    return BfsResult(distances=dist, iterations=iterations, history=history)


def random_walks(
    edges: DataFrame, sources: DataFrame, steps: int = 3
) -> DataFrame:
    """Deterministic random walks (the corpus-generation step of
    node2vec/DeepWalk-style graph embeddings): one walk per row of
    ``sources`` (a 1-column ``id`` frame), each step moving to the
    out-neighbor with the smallest md5 of ``walk|step|dst`` — a
    hash-seeded uniform choice that is row-local and replayable, so a SQL
    oracle (and a retried task) picks the identical successor, where
    ``rand()`` would not survive either. Walks reaching a dangling vertex
    simply end (no rows for later steps).

    Returns (walk, step, vertex) for steps 0..``steps``. Scale shape: the
    edge table shuffles once (repartition by src, cached); each step is
    frontier-join + per-walk struct-min aggregate — message volume is
    O(live walks x avg out-degree) per step, never O(E), and the walk id
    is the aggregation key so skew tracks walk count, not graph shape.
    """
    links = dedup_src_sorted(edges.select("src", "dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cur = sources.select(
        F.col("id").alias("walk"),
        F.col("id").alias("vertex"),
        F.lit(0).cast("int").alias("step"),
    )
    out = cur
    for s in range(1, steps + 1):
        h = F.md5(
            F.concat_ws("|", F.col("walk"), F.lit(str(s)), F.col("dst"))
        )
        cur = (
            cur.join(links, cur["vertex"] == links["src"])
            .groupBy("walk")
            .agg(
                F.min(
                    F.struct(h.alias("h"), F.col("dst").alias("dst"))
                ).alias("m")
            )
            .select(
                "walk",
                F.col("m.dst").alias("vertex"),
                F.lit(s).cast("int").alias("step"),
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(cur)
    links.unpersist()
    return out

def sssp_distances(
    edges: DataFrame,
    source: int,
    rounds: int = 10,
    weight_col: str = "w",
) -> BfsResult:
    """Weighted single-source shortest paths: Bellman-Ford on the same
    cached-DataFrame superstep skeleton, with the delta-frontier
    optimization — per round only vertices whose distance IMPROVED last
    round scatter ``dist + w`` along their out-edges. Relaxing only the
    improved set is result-identical to relaxing every settled vertex
    (a vertex that did not improve in round t already scattered its final
    value in the round after it last improved), so a k-round run matches
    the fully-unrolled Bellman-Ford oracle exactly.

    Parallel edges are collapsed to their MIN weight (the only one that
    can ever win a relaxation). Distances are BIGINT — integer-exact, no
    float tolerance in the oracle comparison. Terminates early when a
    round improves nothing (the fixpoint for non-negative weights).

    Scale shape: identical to BFS — E-rows shuffled once into the sorted
    src-partitioned cache; each round moves O(frontier out-degree) relax
    messages plus a V-row min-merge, one driver action per round,
    localCheckpoint keeping lineage flat.
    """
    spark = edges.sparkSession
    links = dedup_src_sorted(
        edges.select("src", "dst", weight_col),
        agg=[F.min(weight_col).alias("w")],
    ).persist(StorageLevel.MEMORY_AND_DISK)

    dist = spark.createDataFrame(
        [(int(source), 0)], "id bigint, dist bigint"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    frontier = dist

    history: list[tuple[int, int, float]] = []
    iterations = 0
    for rnd in range(1, rounds + 1):
        t0 = time.monotonic()
        relax = (
            links.join(
                frontier.select(
                    F.col("id").alias("src"), F.col("dist").alias("fd")
                ),
                "src",
            )
            .select(
                F.col("dst").alias("id"), (F.col("fd") + F.col("w")).alias("cand")
            )
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        improved = (
            relax.join(dist.select("id", F.col("dist").alias("old")), "id", "left")
            .filter(F.col("old").isNull() | (F.col("cand") < F.col("old")))
            .select("id", F.col("cand").alias("dist"))
        )
        # min-merge old + improved — V-row groupBy, then one action
        new_dist = (
            dist.unionAll(improved)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        n_changed = improved.count()
        dist.unpersist()
        dist = new_dist
        frontier = improved
        iterations = rnd
        history.append((rnd, int(n_changed), time.monotonic() - t0))
        if n_changed == 0:
            break

    links.unpersist()
    return BfsResult(distances=dist, iterations=iterations, history=history)


def truncated_betweenness(
    edges: DataFrame,
    sources: list[int],
    max_hops: int = 3,
    normalized: bool = False,
) -> DataFrame:
    """Sampled-source, hop-limited betweenness centrality — the Brandes
    (2001) accumulation truncated at ``max_hops`` (a.k.a. ego/bounded
    betweenness, the standard approximation when exact all-pairs Brandes
    is off the table: sample sources, bound the horizon).

    Forward sweep: per-(source, vertex) shortest-path counts sigma,
    level by level — each level is one edge join + an anti-join against
    all earlier levels (first arrival = shortest), with the sources
    BATCHED through a source column the way ``multi_bfs`` does, so K
    sources cost one edge pass per hop, not K. Backward sweep: the
    dependency fold delta_h(v) = sum over successors w at level h+1 of
    sigma_v/sigma_w * (1 + delta_{h+1}(w)), horizon level as leaves.
    Returns (id, bc) where bc sums each vertex's delta over sources
    (vertices with zero dependency are absent). ``normalized=True``
    applies the standard directed-Brandes rescale exactly as NetworkX
    does: bc * n / (|sources| * (n-1) * (n-2)) — the 1/((n-1)(n-2))
    pair normalization combined with the n/k sampled-source estimator
    correction (within the truncation horizon and with all vertices as
    sources this is networkx.betweenness_centrality(normalized=True)
    verbatim — pinned by a seeded-random-digraph property test).
    Unnormalized output is byte-identical to the pre-normalization
    operator (no rescale, matching NetworkX's directed unnormalized
    behavior, which skips the n/k correction too).

    Every level/delta frame is eagerly localCheckpoint'ed: each is
    consumed twice (next forward level + backward fold), and the chain
    would otherwise recompute quadratically. Shuffle per hop is the
    frontier's out-edge fan-out — the multi-BFS bound — and the
    backward joins move only (source, vertex, sigma/delta) rows."""
    if not sources:
        raise ValueError("truncated_betweenness needs at least one source")
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    spark = edges.sparkSession
    links = dedup_src_sorted(edges.select("src", "dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    l0 = spark.createDataFrame(
        [(int(s), int(s), 1.0) for s in sources],
        "s bigint, v bigint, sigma double",
    )
    levels: list[DataFrame] = [l0]
    seen = l0.select("s", "v")
    for _hop in range(1, max_hops + 1):
        nxt = (
            levels[-1]
            .join(links.withColumnRenamed("src", "v"), "v")
            .select("s", F.col("dst").alias("v"), "sigma")
            .join(seen, ["s", "v"], "left_anti")
            .groupBy("s", "v")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        levels.append(nxt)
        seen = seen.unionAll(nxt.select("s", "v"))

    deltas: dict[int, DataFrame] = {}
    top = len(levels) - 1
    for h in range(top - 1, 0, -1):
        succ = levels[h + 1].select(
            F.col("s").alias("s2"),
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
        )
        if h + 1 in deltas:
            succ = succ.join(
                deltas[h + 1].select(
                    F.col("s").alias("s2"),
                    F.col("v").alias("w"),
                    F.col("delta").alias("delta_w"),
                ),
                ["s2", "w"],
                "left",
            )
        else:  # horizon level: leaves, delta = 0
            succ = succ.withColumn("delta_w", F.lit(None).cast("double"))
        deltas[h] = (
            levels[h]
            .join(links.withColumnRenamed("src", "v"), "v")
            .join(
                succ,
                (F.col("s") == F.col("s2")) & (F.col("dst") == F.col("w")),
            )
            .groupBy("s", "v")
            .agg(
                F.sum(
                    F.col("sigma")
                    / F.col("sigma_w")
                    * (F.lit(1.0) + F.coalesce(F.col("delta_w"), F.lit(0.0)))
                ).alias("delta")
            )
            .localCheckpoint(eager=True)
        )

    links.unpersist()
    if not deltas:
        return spark.createDataFrame([], "id bigint, bc double")
    allc = None
    for d in deltas.values():
        allc = d if allc is None else allc.unionAll(d)
    bc = F.sum("delta")
    if normalized:
        # NetworkX _rescale for directed graphs: 1/((n-1)(n-2)) pair
        # normalization times the n/k sampled-source correction; n <= 2
        # leaves the zeros as zeros either way
        n = (
            edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id")))
            .distinct()
            .count()
        )
        if n > 2:
            bc = bc * F.lit(float(n) / (len(sources) * (n - 1) * (n - 2)))
    return (
        allc.groupBy("v")
        .agg(F.round(bc, 9).alias("bc"))
        .select(F.col("v").alias("id"), "bc")
    )
