"""Hub-skew handling on the J1 scatter join (VERDICT r06 item 7).

The reference documents the pathology (README.md:417-418: heavy-hub
graphs dominate a worker). These tests pin BOTH halves of this repo's
answer:

1. AQE's OptimizeSkewedJoin is structurally UNAVAILABLE to the superstep
   loop — the links side is cached pre-partitioned, so the join has no
   shuffle stage to split. Measured here, not assumed: the same join
   with uncached inputs and lowered thresholds DOES get ``skew=true``;
   through the cache it does not.
2. The plan-stable fix: ``scatter_gather(..., hub_ids)`` routes hub
   sources through a broadcast of their (few) rank rows, so the hub edge
   mass never concentrates — pinned by plan shape and by rank equality
   against the unsplit path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def skew_confs(spark):
    """Lower AQE skew thresholds so test-sized data can trigger a split,
    and disable broadcast so the join shape is the at-scale SMJ."""
    keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prior = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in prior.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _hub_edges(spark, n=200_000, hub_share=3):
    """~n edges where src=0 holds hub_share/10 of all edges."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < hub_share, F.lit(0))
        .otherwise(F.col("id") % 5000)
        .cast("long")
        .alias("src"),
        (F.col("id") % 7919).cast("long").alias("dst"),
    )


def test_aqe_skew_split_fires_on_uncached_scatter_join(spark, skew_confs):
    """Control experiment: the raw (uncached) scatter join IS split by
    AQE under skew — proving the thresholds and fixture are sufficient,
    so the cached case below fails to split for structural reasons, not
    fixture weakness."""
    edges = _hub_edges(spark)
    ranks = spark.range(5000).select(
        F.col("id").alias("src"), (F.col("id") * 0.001).alias("pr")
    )
    j = (
        edges.join(ranks, "src")
        .select("dst", (F.col("pr") / 2).alias("contrib"))
        .groupBy("dst")
        .agg(F.sum("contrib").alias("c"))
    )
    plan = _executed(j)
    assert "skew=true" in plan, plan


def test_aqe_cannot_split_the_cached_links_join(spark, skew_confs):
    """Through build_graph's cached pre-partitioned links, the same join
    reads InMemoryTableScan on the links side — no shuffle stage, so
    OptimizeSkewedJoin never fires. This is WHY scatter_gather's explicit
    hub split exists."""
    from pagerank_giraph_vs_mapreduce_spark.graph.builder import build_graph
    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import (
        scatter_gather,
    )

    g = build_graph(_hub_edges(spark))
    try:
        ranks = g.vertices.select("id", F.lit(0.001).alias("pr"))
        plan = _executed(scatter_gather(g.links, ranks))
        assert "InMemoryTableScan" in plan
        assert "skew=true" not in plan, plan
    finally:
        g.unpersist()


def test_hub_split_broadcasts_hot_sources(spark, skew_confs):
    """With hub_ids, the hot sources' scatter must ride a
    BroadcastHashJoin (their edge rows stay put; only their rank rows
    move) while cold sources keep the shuffle join."""
    from pagerank_giraph_vs_mapreduce_spark.graph.builder import build_graph
    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import (
        scatter_gather,
    )

    g = build_graph(_hub_edges(spark))
    try:
        ranks = g.vertices.select("id", F.lit(0.001).alias("pr"))
        split = scatter_gather(g.links, ranks, hub_ids=[0])
        plan = _executed(split)
        assert "BroadcastHashJoin" in plan, plan
        # identical gather result to the unsplit path
        base = {
            r["id"]: r["contrib"]
            for r in scatter_gather(g.links, ranks).collect()
        }
        got = {r["id"]: r["contrib"] for r in split.collect()}
        assert set(got) == set(base)
        assert all(abs(got[k] - base[k]) < 1e-12 for k in base)
    finally:
        g.unpersist()


def test_pagerank_hub_split_matches_unsplit_ranks(spark):
    """End-to-end: pagerank with hub_split_outdeg returns the same ranks
    as without (same math, different physical routing)."""
    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank

    edges = _hub_edges(spark, n=20_000)
    a = pagerank(edges, max_iter=3, tol=-1.0, min_iter=0)
    b = pagerank(edges, max_iter=3, tol=-1.0, min_iter=0, hub_split_outdeg=1000)
    ra = {r["id"]: r["pr"] for r in a.ranks.collect()}
    rb = {r["id"]: r["pr"] for r in b.ranks.collect()}
    assert set(ra) == set(rb)
    assert all(abs(ra[k] - rb[k]) < 1e-12 for k in ra)


def test_hub_split_auto_threshold(spark):
    """VERDICT r07 item 7: the default hub_split_outdeg='auto' derives
    the cap from max(HUB_AUTO_FLOOR, E // shuffle_partitions) at build
    time — uniform graphs report no hub ids (plain scatter plan, no
    Union/broadcast branch), a 50%-hub graph routes exactly the hub
    through the broadcast branch with NO manual knob, and the ranks
    match the unsplit run bit-for-bit."""
    from pagerank_giraph_vs_mapreduce_spark.graph.builder import build_graph
    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import (
        HUB_AUTO_FLOOR,
        pagerank,
        scatter_gather,
    )

    # uniform: every outdeg ~ E/V, far below both floor and fair share
    uniform = spark.range(20_000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7 + 1) % 500).alias("dst"),
    )
    res_u = pagerank(uniform, max_iter=2, tol=-1.0, min_iter=0)
    assert res_u.hub_ids == []

    # hub: src 0 owns 20k distinct dsts; E=40k, P=8 -> fair share 5k,
    # threshold = max(4096, 5000) = 5000 < 20000 -> auto-split fires
    hub = spark.range(40_000).select(
        F.when(F.col("id") < 20_000, F.lit(0))
        .otherwise(F.col("id") % 100 + 1)
        .cast("long")
        .alias("src"),
        F.col("id").cast("long").alias("dst"),
    )
    assert HUB_AUTO_FLOOR < 20_000
    res_h = pagerank(hub, max_iter=2, tol=-1.0, min_iter=0)
    assert res_h.hub_ids == [0]

    # ranks identical to the explicitly-unsplit run
    res_n = pagerank(hub, max_iter=2, tol=-1.0, min_iter=0, hub_split_outdeg=None)
    ra = {r["id"]: r["pr"] for r in res_h.ranks.collect()}
    rb = {r["id"]: r["pr"] for r in res_n.ranks.collect()}
    assert ra == rb

    # plan shape: the split branch unions a broadcast join; plain doesn't
    # (ranks0 built union-free — g.vertices' universe lineage has a Union)
    g = build_graph(hub)
    ranks0 = spark.range(40_001).select(
        F.col("id").cast("long").alias("id"),
        F.lit(1.0 / g.n_vertices).alias("pr"),
    )
    split_plan = scatter_gather(g.links, ranks0, [0])._jdf.queryExecution().analyzed().toString()
    plain_plan = scatter_gather(g.links, ranks0, [])._jdf.queryExecution().analyzed().toString()
    assert "Union" in split_plan and "Union" not in plain_plan
    g.unpersist()
