"""Salted-join equivalence + S5 adjacency-list input format."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank
from pagerank_giraph_vs_mapreduce_spark.operators.skew import (
    salted_collect_set,
    salted_join,
)
from pagerank_giraph_vs_mapreduce_spark.graph.builder import build_graph
from pagerank_giraph_vs_mapreduce_spark.sources.edgelist import (
    read_adjacency,
    read_adjacency_vertices,
)


def test_salted_join_equals_plain_join(spark):
    # skewed left: 90% of rows share key 1
    left = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], "k bigint, v bigint"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], "k bigint, tag string")
    plain = {(r["k"], r["v"], r["tag"]) for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["v"], r["tag"]) for r in salted_join(left, right, "k").collect()}
    assert salted == plain
    assert len(salted) == 1000


def test_salted_collect_set(spark):
    df = spark.createDataFrame(
        [(1, i % 7) for i in range(500)] + [(2, 99)], "k bigint, v bigint"
    )
    out = {r["k"]: sorted(r["values"]) for r in salted_collect_set(df, "k", "v").collect()}
    assert out[1] == list(range(7))
    assert out[2] == [99]


def test_read_adjacency_giraph_format(spark, tmp_path):
    p = tmp_path / "adj.txt"
    p.write_text("1 2 3\n2 1\n3\n\nbogus x\n4 2\n")
    edges = read_adjacency(spark, str(p))
    got = sorted((r["src"], r["dst"]) for r in edges.collect())
    assert got == [(1, 2), (1, 3), (2, 1), (4, 2)]
    # vertex 3 (bare id, no neighbors) enters the universe via extra_vertices
    verts = read_adjacency_vertices(spark, str(p))
    g = build_graph(edges, extra_vertices=verts)
    res = pagerank(edges, max_iter=10, graph=g)
    assert res.n_vertices == 4
    pr = {r["id"]: r["pr"] for r in res.ranks.collect()}
    assert 3 in pr  # isolated vertex ranked (as dangling)
    g.unpersist()


def test_salted_join_rejects_outer(spark):
    import pytest

    left = spark.createDataFrame([(1, "a")], "k bigint, v string")
    right = spark.createDataFrame([(1, "x")], "k bigint, tag string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, "k", how=how)


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    right = spark.createDataFrame([(1, "x")], "k bigint, tag string")
    rows = {(r["k"], r["v"], r["tag"]) for r in salted_join(left, right, "k", how="left").collect()}
    assert rows == {(1, "a", "x"), (2, "b", None)}
