"""Triangle counting (degree-oriented) and bounded 2-hop counts on
hand-built graphs with known answers."""

from __future__ import annotations

from itertools import combinations

from conftest import make_edges

from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
    triangle_count,
    two_hop_count,
)


def n_triangles(pairs) -> int:
    """Pure-python oracle: count triangles in the undirected simple graph."""
    und = {tuple(sorted((a, b))) for a, b in pairs if a != b}
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return sum(
        1
        for u, v, w in combinations(sorted(adj), 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )


def test_triangle_simple(spark):
    # one triangle + a pendant edge + a duplicate + a self-loop
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (2, 1), (5, 5)]
    got = triangle_count(make_edges(spark, pairs)).first()["n_triangles"]
    assert got == 1 == n_triangles(pairs)


def test_triangle_k5_complete(spark):
    pairs = [(a, b) for a in range(5) for b in range(5) if a != b]
    got = triangle_count(make_edges(spark, pairs)).first()["n_triangles"]
    assert got == 10 == n_triangles(pairs)


def test_triangle_hub_with_low_id(spark):
    # Hub vertex 0 (lowest id, highest degree) connected to everyone; spokes
    # form a ring. Low-id orientation would key all wedges on the hub; the
    # degree-oriented plan must still return the exact count.
    n = 30
    pairs = [(0, i) for i in range(1, n)]
    pairs += [(i, i % (n - 1) + 1) for i in range(1, n)]
    got = triangle_count(make_edges(spark, pairs)).first()["n_triangles"]
    assert got == n_triangles(pairs)


def test_triangle_directed_both_ways_counts_once(spark):
    # A directed 3-cycle and its reverse is still one undirected triangle.
    pairs = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]
    got = triangle_count(make_edges(spark, pairs)).first()["n_triangles"]
    assert got == 1


def test_two_hop_exact(spark):
    # 1 -> {2, 3}; 2 -> {3, 4}; 3 -> {4}; so 2-hop(1) = {3, 4}
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    df = two_hop_count(make_edges(spark, pairs), mid_outdeg_cap=None)
    got = {r["id"]: r["n_two_hop"] for r in df.collect()}
    assert got == {1: 2, 2: 1}


def test_two_hop_cap_excludes_hub_mid(spark):
    # mid 9 has out-degree 3 (> cap 2): paths through it must not count.
    pairs = [(1, 9), (9, 2), (9, 3), (9, 4), (1, 5), (5, 6)]
    df = two_hop_count(make_edges(spark, pairs), mid_outdeg_cap=2)
    got = {r["id"]: r["n_two_hop"] for r in df.collect()}
    assert got == {1: 1}  # only 1 -> 5 -> 6 transits

    exact = two_hop_count(make_edges(spark, pairs), mid_outdeg_cap=None)
    got_exact = {r["id"]: r["n_two_hop"] for r in exact.collect()}
    assert got_exact == {1: 4}


def test_kcore_peeling_cascade(spark):
    """Triangle 1-2-3 survives 2-core peeling; the pendant chain peels
    away over successive rounds (4 -> gone round 1; nothing else)."""
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import kcore_survivors

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    got = {r["id"] for r in kcore_survivors(make_edges(spark, pairs), k=2, rounds=4).collect()}
    assert got == {1, 2, 3}
    # one round only: 5 peels (degree 1), 4 still sees two neighbors
    one = {r["id"] for r in kcore_survivors(make_edges(spark, pairs), k=2, rounds=1).collect()}
    assert one == {1, 2, 3, 4}


def test_motifs_random_graphs_vs_python(spark):
    """Seeded random digraphs: triangle count, capped two-hop, and k-core
    survivors must all match pure-python oracles."""
    import random

    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import kcore_survivors

    rng = random.Random(3)
    for trial in range(4):
        n = rng.randint(8, 20)
        pairs = list(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randint(10, 60))
            }
        )
        edges = make_edges(spark, pairs)

        assert (
            triangle_count(edges).first()["n_triangles"] == n_triangles(pairs)
        ), f"triangles trial {trial}"

        cap = rng.choice([2, 3, 100])
        dedup = {(a, b) for a, b in pairs}
        outdeg: dict[int, int] = {}
        adj: dict[int, set[int]] = {}
        for a, b in dedup:
            outdeg[a] = outdeg.get(a, 0) + 1
            adj.setdefault(a, set()).add(b)
        want = {}
        for s in adj:
            reach = set()
            for m in adj[s]:
                if outdeg.get(m, 0) <= cap:
                    reach |= adj.get(m, set())
            if reach:
                want[s] = len(reach)
        got = {
            r["id"]: r["n_two_hop"]
            for r in two_hop_count(edges, mid_outdeg_cap=cap).collect()
        }
        assert got == want, f"two_hop trial {trial} cap {cap}"

        k = rng.choice([1, 2, 3])
        und = {tuple(sorted((a, b))) for a, b in dedup if a != b}
        uadj: dict[int, set[int]] = {}
        for u, v in und:
            uadj.setdefault(u, set()).add(v)
            uadj.setdefault(v, set()).add(u)
        surv = set(uadj)
        for _ in range(3):
            surv = {x for x in surv if len(uadj[x] & surv) >= k}
        got_k = {
            r["id"]
            for r in kcore_survivors(edges, k=k, rounds=3).collect()
        }
        assert got_k == surv, f"kcore trial {trial} k {k}"


def test_local_clustering_known_graph(spark):
    """K4 minus edge 3-4, plus a pendant pair: coefficients by hand.
    T(1)=T(2)=2 with d=3 -> 2/3; T(3)=T(4)=1 with d=2 -> 1.0; the pendant
    vertices have d=1 -> 0.0."""
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import local_clustering

    edges = make_edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (5, 6)]
    )
    got = {r["id"]: r["clustering"] for r in local_clustering(edges).collect()}
    assert got == {
        1: round(2 / 3, 9),
        2: round(2 / 3, 9),
        3: 1.0,
        4: 1.0,
        5: 0.0,
        6: 0.0,
    }
