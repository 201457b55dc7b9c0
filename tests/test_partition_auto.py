"""Coarsen-until-bounded (VERDICT r12 item 1): the multilevel pipeline's
production mode adds levels until the coarsest table is provably
node-bounded, and the serial initial-coloring collect is GUARDED by code
— an over-bound coarsest table raises instead of OOMing the driver.

Pins:
- auto mode ADDS levels beyond the fixed prefix on a fixture whose fixed
  coarsest table exceeds the bound, and lands at or under the bound;
- the auto result is a valid total balanced 2-coloring (same contract
  the fixed mode pins elsewhere);
- region_grow_bipartition raises on an over-bound collect;
- the V-cycle walks auto-added levels (len(mappings), not
  len(level_rounds)) and still produces a total 2-coloring;
- fixed mode (coarsest_max=None) is unchanged: same assignment as
  before the parameter existed, certified-oracle semantics intact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_edges


def _ring(n: int) -> list[tuple[int, int]]:
    return [(i, (i + 1) % n) for i in range(n)]


def _coloring_contract(parts: dict[int, int], n: int, imbalance: float):
    assert len(parts) == n  # total
    assert set(parts.values()) <= {0, 1}
    s0 = sum(1 for p in parts.values() if p == 0)
    assert 0 < s0 < n
    assert abs(s0 - n / 2) <= imbalance * n, (s0, n)


def test_auto_levels_added_until_bounded(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        _multilevel_pipeline_full,
    )

    n = 600
    edges = make_edges(spark, _ring(n))
    bound = 60
    levels, mappings, comps, part = _multilevel_pipeline_full(
        edges, level_rounds=(2,), coarsest_max=bound
    )
    # the fixed prefix alone leaves far more than `bound` supers on a
    # 600-ring (2 matching rounds shrink ~2x at best)
    assert len(mappings) > 1, "auto mode added no levels"
    n_coarsest = comps[-1].select("super").distinct().count()
    assert n_coarsest <= bound, n_coarsest
    # every level conserves the leaf universe
    assert comps[-1].count() == n
    # the coloring covers every coarsest super
    assert part.count() == n_coarsest


def test_auto_k2_valid_balanced_coloring(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        multilevel_partition_k2,
    )

    n = 600
    edges = make_edges(spark, _ring(n))
    got = multilevel_partition_k2(edges, level_rounds=(2,), coarsest_max=60)
    parts = {r["id"]: r["part"] for r in got.collect()}
    _coloring_contract(parts, n, imbalance=0.25)
    # a ring bisection's cut should be tiny (contiguous arcs); region
    # growing + grouped fill keeps arcs whole — allow generous slack but
    # far below a random coloring's ~n/2
    cut = sum(1 for a, b in _ring(n) if parts[a] != parts[b])
    assert cut <= 20, cut


def test_vcycle_walks_auto_levels(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        multilevel_partition_k2_vcycle,
    )

    n = 300
    edges = make_edges(spark, _ring(n))
    got = multilevel_partition_k2_vcycle(
        edges,
        level_rounds=(2,),
        coarsest_sweeps=1,
        sweeps_per_level=1,
        coarsest_max=40,
    )
    parts = {r["id"]: r["part"] for r in got.collect()}
    _coloring_contract(parts, n, imbalance=0.25)


def test_region_grow_collect_guard_raises(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        region_grow_bipartition,
    )

    e = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(9)], "u bigint, v bigint, weight bigint"
    )
    leaf_w = spark.createDataFrame(
        [(i, 1) for i in range(10)], "super bigint, w bigint"
    )
    with pytest.raises(RuntimeError, match="serial-fill bound"):
        region_grow_bipartition(e, leaf_w, collect_max=4)
    # at or under the bound the same call succeeds
    out = region_grow_bipartition(e, leaf_w, collect_max=10)
    assert out.count() == 10


def test_fixed_mode_semantics_unchanged(spark):
    """coarsest_max=None must be bit-identical to the pre-parameter
    fixed-level behavior — the five certified partition oracles depend
    on it. Pin by comparing default-mode output against an explicit
    None (same code path) AND against the auto mode on a fixture where
    the fixed prefix is ALREADY under the bound (auto adds nothing, so
    the two must agree exactly)."""
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        multilevel_partition_k2,
    )

    n = 80
    edges = make_edges(spark, _ring(n))
    fixed = {
        (r["id"], r["part"])
        for r in multilevel_partition_k2(edges, level_rounds=(2, 2)).collect()
    }
    auto_noop = {
        (r["id"], r["part"])
        for r in multilevel_partition_k2(
            edges, level_rounds=(2, 2), coarsest_max=1000
        ).collect()
    }
    assert fixed == auto_noop


def test_sym_edges_path_matches_default(spark):
    """r14: k4 passes a pre-symmetrized materialized leaf table into the
    pipeline (sym_edges) so the symmetrize+dedup is paid once per k4
    invocation; the sym_edges path must produce the IDENTICAL assignment
    to the default path, and k4 itself must be unchanged vs a by-hand
    composition of its pieces through the default path."""
    import random

    from pyspark.sql import functions as F

    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        multilevel_partition_k2_refined,
        multilevel_partition_k4,
        undirect_dedup,
    )

    rng = random.Random(7)
    n = 60
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
    df = make_edges(spark, edges)

    und_w = (
        undirect_dedup(df)
        .withColumn("weight", F.lit(1).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    a = {
        r["id"]: r["part"]
        for r in multilevel_partition_k2_refined(
            df, (2, 2), 1, sym_edges=und_w
        ).collect()
    }
    b = {
        r["id"]: r["part"]
        for r in multilevel_partition_k2_refined(df, (2, 2), 1).collect()
    }
    assert a == b

    k4 = {
        r["id"]: r["part"]
        for r in multilevel_partition_k4(
            df, top_levels=(2, 2), top_sweeps=1, side_levels=(2,), side_sweeps=1
        ).collect()
    }
    assert set(k4.values()) <= {0, 1, 2, 3}
    assert len(k4) == len(a)  # total over the same vertex universe
    # top bit of the k4 label == the standalone refined bisection
    assert {v: p // 2 for v, p in k4.items()} == a
