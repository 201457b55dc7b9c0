"""Connected components vs a pure-Python union-find oracle."""

from __future__ import annotations

from pagerank_giraph_vs_mapreduce_spark.graph.components import (
    connected_components,
)
from tests.conftest import make_edges


def uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_two_components_and_self_loop(spark):
    edges = [(1, 2), (2, 3), (10, 11), (12, 12)]
    res = connected_components(make_edges(spark, edges), max_iter=20)
    got = {r["id"]: r["component"] for r in res.components.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 12}
    assert res.converged


def test_random_graph_matches_union_find(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    res = connected_components(make_edges(spark, edges), max_iter=60)
    got = {r["id"]: r["component"] for r in res.components.collect()}
    want = uf_components(edges)
    assert res.converged
    assert got == want


def test_chain_converges_in_diameter_steps(spark):
    # path graph 0-1-2-...-9: diameter 9, label 0 must reach the far end
    edges = [(i, i + 1) for i in range(9)]
    res = connected_components(make_edges(spark, edges), max_iter=30)
    got = {r["component"] for r in res.components.collect()}
    assert got == {0}


def test_label_propagation_two_triangles(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.communities import (
        label_propagation,
    )

    # Two disconnected triangles; after 2 deterministic rounds every vertex
    # carries its component's minimum id.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)],
        "src bigint, dst bigint",
    )
    got = {r["id"]: r["label"] for r in label_propagation(edges, rounds=2).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_label_propagation_tie_breaks_to_min_label(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.communities import (
        label_propagation,
    )

    # Path 1-2-3: after round 1, vertex 2 sees labels {1, 3} (tied counts)
    # and must take the smaller.
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    got = {r["id"]: r["label"] for r in label_propagation(edges, rounds=1).collect()}
    assert got == {1: 2, 2: 1, 3: 2}


def test_hits_star_graph(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.hits import hits

    # Star: 1,2,3 all point at 4. Vertex 4 is the only authority; 1,2,3
    # are equal hubs; 4 has no out-edges so hub(4) = 0.
    edges = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4)], "src bigint, dst bigint"
    )
    got = {r["id"]: (r["auth"], r["hub"]) for r in hits(edges, rounds=2).collect()}
    assert got[4][0] == 1.0 and got[4][1] == 0.0
    for v in (1, 2, 3):
        assert got[v][0] == 0.0
        assert abs(got[v][1] - 1 / 3) < 1e-9


def test_incremental_wcc_matches_full_recompute_random(spark):
    import random

    from pagerank_giraph_vs_mapreduce_spark.graph.components import (
        connected_components,
        connected_components_incremental,
    )

    rng = random.Random(23)
    for trial in range(3):
        n = 30
        base = list({(rng.randrange(n), rng.randrange(n)) for _ in range(25)})
        delta = list(
            {(rng.randrange(n + 10), rng.randrange(n + 10)) for _ in range(6)}
        )
        base_df = spark.createDataFrame(base, "src bigint, dst bigint")
        delta_df = spark.createDataFrame(delta, "src bigint, dst bigint")
        prev = connected_components(base_df)
        inc = connected_components_incremental(
            prev.components, base_df.unionAll(delta_df), delta_df
        )
        full = connected_components(base_df.unionAll(delta_df))
        got = {r["id"]: r["component"] for r in inc.components.collect()}
        want = {r["id"]: r["component"] for r in full.components.collect()}
        assert got == want, f"trial {trial}"
        assert inc.converged


def test_incremental_wcc_noop_delta_converges_immediately(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.components import (
        connected_components,
        connected_components_incremental,
    )

    # delta edge inside an existing component: nothing can change —
    # one superstep, zero label updates
    base = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "src bigint, dst bigint"
    )
    delta = spark.createDataFrame([(0, 2)], "src bigint, dst bigint")
    prev = connected_components(base)
    inc = connected_components_incremental(
        prev.components, base.unionAll(delta), delta
    )
    assert inc.converged and inc.iterations == 1
    assert inc.history[0][1] == 0
    got = {r["id"]: r["component"] for r in inc.components.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_incremental_wcc_bridges_components_and_new_vertices(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.components import (
        connected_components,
        connected_components_incremental,
    )

    # two chains merged by a delta bridge, plus a delta edge to a brand-
    # new vertex 99
    base = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (11, 12)], "src bigint, dst bigint"
    )
    delta = spark.createDataFrame([(2, 10), (12, 99)], "src bigint, dst bigint")
    prev = connected_components(base)
    inc = connected_components_incremental(
        prev.components, base.unionAll(delta), delta
    )
    got = {r["id"]: r["component"] for r in inc.components.collect()}
    assert got == {v: 0 for v in (0, 1, 2, 10, 11, 12, 99)}


def test_shared_sym_cache_matches_unshared(spark):
    """r14: both phases of the incremental-vs-full A/B share one
    build_sym_cache — results must be identical to per-phase builds,
    and the shared cache must survive both phases (caller-owned)."""
    import random

    from pagerank_giraph_vs_mapreduce_spark.graph.components import (
        build_sym_cache,
        connected_components,
        connected_components_incremental,
    )

    rng = random.Random(41)
    n = 40
    base = list({(rng.randrange(n), rng.randrange(n)) for _ in range(30)})
    delta = list(
        {(rng.randrange(n + 15), rng.randrange(n + 15)) for _ in range(8)}
    )
    base_df = spark.createDataFrame(base, "src bigint, dst bigint")
    delta_df = spark.createDataFrame(delta, "src bigint, dst bigint")
    updated = base_df.unionAll(delta_df)
    prev = connected_components(base_df)

    sym = build_sym_cache(updated)
    inc_shared = connected_components_incremental(
        prev.components, updated, delta_df, sym_edges=sym
    )
    full_shared = connected_components(updated, sym_edges=sym)
    # cache is caller-owned: still usable after both phases ran
    assert sym.count() > 0
    sym.unpersist()

    inc_own = connected_components_incremental(
        prev.components, updated, delta_df
    )
    full_own = connected_components(updated)

    def labels(res):
        return {r["id"]: r["component"] for r in res.components.collect()}

    assert labels(inc_shared) == labels(inc_own)
    assert labels(full_shared) == labels(full_own)
    assert labels(full_shared) == labels(inc_shared)
    assert inc_shared.iterations == inc_own.iterations
