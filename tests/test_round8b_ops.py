"""Round-8 second wave: k-truss peeling, integer-exact weighted
systematic sampling, and the two-phase per-domain cap.

- ktruss_edges vs a pure-Python peel oracle on a fixture graph, plus
  the support invariant on the derived sf0.001 graph.
- pipeline_weighted_sample: Σ n_picks == K exactly, heavy rows always
  picked, selection independent of input partitioning.
- pipeline_domain_cap: two-phase top-k == the naive single-window
  answer regardless of partition layout, and the cap binds.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import make_edges


def _py_ktruss(pairs, k, rounds):
    """Reference peel: canonical edge set, per-round triangle support."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    for _ in range(rounds):
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        supp = {}
        for u, v in edges:
            supp[(u, v)] = len(adj[u] & adj[v])
        edges = {e for e in edges if supp[e] >= k - 2}
    return edges


def test_ktruss_matches_python_oracle(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import ktruss_edges

    # Two 4-cliques sharing a vertex, plus a triangle tail and a path:
    # the 4-truss is exactly the two cliques; the triangle and path peel.
    cliques = [
        (a, b)
        for grp in ([0, 1, 2, 3], [3, 4, 5, 6])
        for i, a in enumerate(grp)
        for b in grp[i + 1 :]
    ]
    extra = [(6, 7), (7, 8), (6, 8), (8, 9), (9, 10)]
    pairs = cliques + extra
    for k, rounds in [(3, 2), (4, 3), (5, 3)]:
        got = {
            (r["u"], r["v"])
            for r in ktruss_edges(make_edges(spark, pairs), k, rounds).collect()
        }
        assert got == _py_ktruss(pairs, k, rounds), (k, rounds)


def test_ktruss_derived_graph_matches_python(spark, sf_dir):
    """Spark peel == Python peel on the real sf0.001 derived graph (not
    just the hand fixture). Note the invariant that "every survivor
    closes >= k-2 triangles among survivors" does NOT hold mid-peel:
    support is evaluated on the round-START edge set, so edges dropped
    in the same round can orphan a survivor until the next round — the
    only correct check is round-for-round equality with the reference
    peel, which is what both this test and the unrolled SQL oracle do."""
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import ktruss_edges
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import derived_edges

    edges = derived_edges(spark, sf_dir)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    got = {(r["u"], r["v"]) for r in ktruss_edges(edges, k=4, rounds=3).collect()}
    assert got, "fixture graph should retain a 4-truss core"
    assert got == _py_ktruss(pairs, 4, 3)


def test_weighted_sample_exact_slots_and_heavy_rows(spark, sf_oracle_dir):
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        WSAMPLE_K,
        pipeline_weighted_sample,
    )

    picked = pipeline_weighted_sample(spark, sf_oracle_dir).collect()
    # systematic sampling distributes EXACTLY K slots across rows
    assert sum(r["n_picks"] for r in picked) == WSAMPLE_K
    docs = (
        spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    total_w = sum(r["n_chars"] for r in docs)
    picked_ids = {r["doc_id"] for r in picked}
    for r in docs:
        if r["n_chars"] * WSAMPLE_K >= total_w:
            assert r["doc_id"] in picked_ids, (
                f"doc {r['doc_id']} heavier than one slot must be sampled"
            )


def test_weighted_sample_partition_independent(spark, sf_oracle_dir):
    """The per-shard cumsum + broadcast bases construction depends only on
    (shard, okey, doc_id) — never on physical partitioning."""
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        pipeline_weighted_sample,
    )

    a = sorted(
        (r["doc_id"], r["n_picks"])
        for r in pipeline_weighted_sample(spark, sf_oracle_dir).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_picks"])
        for r in pipeline_weighted_sample(spark, sf_oracle_dir)
        .repartition(7)
        .collect()
    )
    assert a == b


def test_domain_cap_matches_naive_window(spark, sf_oracle_dir):
    from pyspark.sql import Window

    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        DOMAIN_CAP,
        pipeline_domain_cap,
    )

    got = sorted(
        (r["doc_id"], r["source"], r["rk"])
        for r in pipeline_domain_cap(spark, sf_oracle_dir).collect()
    )
    docs = spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
    # Deliberately adversarial layout: repartition so each domain's rows
    # scatter across many input splits before the two-phase top-k.
    naive_w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    naive = sorted(
        (r["doc_id"], r["source"], r["rk"])
        for r in docs.repartition(13)
        .withColumn("rk", F.row_number().over(naive_w))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .select("doc_id", "source", "rk")
        .collect()
    )
    assert got == naive
    per_src = defaultdict(int)
    for _, src, _ in got:
        per_src[src] += 1
    assert max(per_src.values()) <= DOMAIN_CAP
