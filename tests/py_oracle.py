"""Pure-Python PageRank oracle for tests — same semantics as the engine and
the reference (uniform init, edge dedup, uniform dangling redistribution,
L1/N convergence). Stands in for the NetworkX oracle the reference claims
alignment with (MR/PageRankDriver.java:101-111); networkx.pagerank with
alpha=d computes the identical fixed point.
"""

from __future__ import annotations


def py_pagerank(
    edges: list[tuple[int, int]],
    d: float = 0.85,
    max_iter: int = 1000,
    tol: float = 1e-14,
) -> dict[int, float]:
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    adj: dict[int, set[int]] = {}
    for s, t in set(edges):
        adj.setdefault(s, set()).add(t)
    pr = {v: 1.0 / n for v in verts}
    for _ in range(max_iter):
        dangling = sum(pr[v] for v in verts if v not in adj)
        new = {v: (1 - d) / n + d * dangling / n for v in verts}
        for s, outs in adj.items():
            w = d * pr[s] / len(outs)
            for t in outs:
                new[t] += w
        diff = sum(abs(new[v] - pr[v]) for v in verts)
        pr = new
        if diff / n <= tol:
            break
    return pr
