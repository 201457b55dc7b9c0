"""Round-10 operator tests: ASOF join, one-level modularity (Louvain),
the real-codec seam composition, and the shared ASCII-fixture pin the
video-container oracles rely on (ADVICE r09)."""

from __future__ import annotations

import glob

import duckdb


def _modularity(pairs, comm):
    """Exact (Fraction) Newman modularity of an undirected simple graph
    given as one-direction pairs, under community assignment ``comm``:
    Q = (1/2m) sum_C in_C - sum_C (tot_C / 2m)^2."""
    from collections import Counter
    from fractions import Fraction

    sym = set()
    for u, v in pairs:
        if u != v:
            sym.add((u, v))
            sym.add((v, u))
    m2 = len(sym)
    k = Counter(u for u, _ in sym)
    inside = sum(1 for u, v in sym if comm[u] == comm[v])
    tot = Counter()
    for i, ki in k.items():
        tot[comm[i]] += ki
    return Fraction(inside, m2) - sum(
        Fraction(t, m2) ** 2 for t in tot.values()
    )


def test_louvain_modularity_nondecreasing_per_round(spark):
    """Each synchronous local-move sweep must not decrease modularity on
    the seeded fixtures (VERDICT r09 item 3) — computed EXACTLY with
    Fractions from the returned assignments, so double noise in the
    in-engine scores can't mask a regression. Also pins that two
    4-cliques joined by one bridge separate into the two obvious
    communities."""
    from tests.conftest import make_edges

    from pagerank_giraph_vs_mapreduce_spark.graph.communities import (
        louvain_one_level,
    )

    def clique(ids):
        return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]

    import random

    fixtures = {
        "two_cliques_bridge": clique([0, 1, 2, 3])
        + clique([10, 11, 12, 13])
        + [(3, 10)],
        "ring8": [(i, (i + 1) % 8) for i in range(8)],
        "barbell": clique([0, 1, 2]) + clique([5, 6, 7]) + [(2, 3), (3, 4), (4, 5)],
    }
    rng = random.Random(7)
    for t in range(3):
        fixtures[f"gnp12_{t}"] = [
            (a, b)
            for a in range(12)
            for b in range(a + 1, 12)
            if rng.random() < 0.3
        ]
    for name, pairs in fixtures.items():
        edges = make_edges(spark, pairs)
        verts = sorted({x for p in pairs for x in p})
        prev_q = _modularity(pairs, {v: v for v in verts})  # singletons
        for rounds in (1, 2, 3):
            got = {
                r["id"]: r["community"]
                for r in louvain_one_level(edges, rounds=rounds).collect()
            }
            q = _modularity(pairs, got)
            assert q >= prev_q, (name, rounds, float(prev_q), float(q))
            prev_q = q
        if name == "two_cliques_bridge":
            cs = {got[i] for i in (0, 1, 2, 3)}, {got[i] for i in (10, 11, 12, 13)}
            assert len(cs[0]) == 1 and len(cs[1]) == 1 and cs[0] != cs[1], got


def test_asof_join_plan_has_no_join_nodes(spark, sf_oracle_dir):
    """rel_asof_join's scale contract (VERDICT r09 item 2): the as-of
    must compile to tagged-union + per-key window — ZERO join operators
    of any kind (no CartesianProduct, no BroadcastNestedLoopJoin, no
    per-event subquery), one hash exchange on the key. Pinned on the
    EXECUTED plan so AQE can't sneak a strategy in."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    df = QUERIES["rel_asof_join"](spark, sf_oracle_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_documents_fixture_is_ascii_only():
    """The mm_ivf_frames and mm_y4m_frames oracles index CHARACTERS
    (length/ascii/substr) while the Spark side slices UTF-8 BYTES — the
    two agree iff the documents fixture is pure ASCII (ADVICE r09,
    multimodal_queries.py mm_ivf_frames/mm_y4m_frames oracles). This pin
    is the shared guard both queries cite: if the driver ever generates
    non-ASCII text, this fails loudly instead of the oracles silently
    diverging."""
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        (n,) = duckdb.sql(
            f"SELECT count(*) FROM '{path}' "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()
        assert n == 0, f"non-ASCII document text in {path}: {n} rows"
