"""Round-9 first wave: k-truss convergence mode and its under-peel proof.

- ktruss_edges(rounds=None) reaches the true peeling fixpoint on a
  triangular-grid fixture that erodes one boundary ring per round —
  the shape where ANY fixed round count under-peels (round 4 still
  removes edges), which is exactly what VERDICT r08 item 4 asked to
  pin down.
- The fixed 3-round slice provably under-peels the same fixture.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from tests.conftest import make_edges


def _py_ktruss_fixpoint(pairs, k):
    """Reference peel to convergence: loop until the edge set is stable."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        nxt = {e for e in edges if len(adj[e[0]] & adj[e[1]]) >= k - 2}
        if nxt == edges:
            return edges
        edges = nxt


def _py_ktruss_rounds(pairs, k, rounds):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    for _ in range(rounds):
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        edges = {e for e in edges if len(adj[e[0]] & adj[e[1]]) >= k - 2}
    return edges


def _tri_grid(m):
    """Planar triangulated grid (vertices (r, c), r+c <= m): every
    interior edge sits in exactly 2 triangles, boundary edges in 1, so
    a 4-truss peel erodes exactly one boundary ring per round — the
    slow-support-decay shape where a fixed round count under-peels."""
    vid = lambda r, c: r * (m + 1) + c  # noqa: E731
    edges = []
    for r in range(m + 1):
        for c in range(m + 1 - r):
            if c + 1 <= m - r:
                edges.append((vid(r, c), vid(r, c + 1)))
            if r + 1 <= m and c <= m - r - 1:
                edges.append((vid(r, c), vid(r + 1, c)))
            if r + 1 <= m and c - 1 >= 0:
                edges.append((vid(r, c), vid(r + 1, c - 1)))
    return edges


def test_ktruss_convergence_reaches_fixpoint(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import ktruss_edges

    # grid erodes ring-by-ring to nothing; the disjoint K5 (each edge in
    # 3 triangles) is a genuine 4-truss and must be the exact fixpoint
    k5 = [(9000 + a, 9000 + b) for a, b in combinations(range(5), 2)]
    pairs = _tri_grid(8) + k5
    # the fixture peels gradually: round 4 must still be removing edges
    # (the property that makes a fixed 3-round slice insufficient)
    r3 = _py_ktruss_rounds(pairs, 4, 3)
    r4 = _py_ktruss_rounds(pairs, 4, 4)
    assert len(r4) < len(r3), "fixture must still peel at round 4"
    fix = _py_ktruss_fixpoint(pairs, 4)
    assert fix == {tuple(sorted(e)) for e in k5}
    got = {
        (r["u"], r["v"])
        for r in ktruss_edges(make_edges(spark, pairs), k=4, rounds=None).collect()
    }
    assert got == fix


def test_ktruss_fixed_rounds_underpeel_vs_convergence(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import ktruss_edges

    pairs = _tri_grid(8)
    edges = make_edges(spark, pairs)
    got3 = {(r["u"], r["v"]) for r in ktruss_edges(edges, k=4, rounds=3).collect()}
    gotc = {(r["u"], r["v"]) for r in ktruss_edges(edges, k=4, rounds=None).collect()}
    assert got3 == _py_ktruss_rounds(pairs, 4, 3)
    assert gotc == _py_ktruss_fixpoint(pairs, 4) == set()
    assert gotc < got3, "3 rounds must under-peel this fixture"
