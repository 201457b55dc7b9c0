"""Resume-from-state: k iterations, checkpoint to an R2 file, resume k more
must equal 2k straight iterations (the MR durability property as opt-in)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank
from pagerank_giraph_vs_mapreduce_spark.sources.statefile import (
    read_state,
    write_state,
)
from tests.conftest import make_edges

EDGES = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (2, 5)]


def test_resume_equals_straight_run(spark, tmp_path):
    edges = make_edges(spark, EDGES)

    straight = pagerank(edges, max_iter=6, tol=-1.0, min_iter=0)
    want = {r["id"]: r["pr"] for r in straight.ranks.collect()}

    first = pagerank(edges, max_iter=3, tol=-1.0, min_iter=0)
    state_path = str(tmp_path / "state")
    write_state(
        first.ranks.withColumn("outlinks", F.array().cast("array<bigint>")),
        state_path,
    )

    resumed = pagerank(
        edges,
        max_iter=3,
        tol=-1.0,
        min_iter=0,
        initial_ranks=read_state(spark, state_path).select("id", "pr"),
    )
    got = {r["id"]: r["pr"] for r in resumed.ranks.collect()}

    assert set(got) == set(want)
    for k in want:
        # R2 files round pr to 10 dp (C4) — tolerance, not bit-equality
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_resume_missing_vertices_seeded_uniform(spark):
    edges = make_edges(spark, EDGES)
    partial = spark.createDataFrame([(1, 0.9)], "id bigint, pr double")
    res = pagerank(edges, max_iter=1, tol=-1.0, min_iter=0, initial_ranks=partial)
    assert res.n_vertices == 5
    assert res.ranks.count() == 5


def test_durable_checkpoint_resume_after_kill(spark, tmp_path):
    """checkpoint_dir= writes durable parquet state every N supersteps; a
    'killed' run's latest completed checkpoint resumes bit-identically
    (parquet state is full doubles — no R2 %.10f rounding)."""
    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import (
        latest_checkpoint,
    )

    edges = make_edges(spark, EDGES)
    ckpt = str(tmp_path / "ckpt")

    straight = pagerank(edges, max_iter=5, tol=-1.0, min_iter=0)
    want = {r["id"]: r["pr"] for r in straight.ranks.collect()}

    # Run with checkpoints at iterations 2 and 4, then "kill": discard the
    # in-memory result and recover only from the durable directory.
    pagerank(
        edges, max_iter=5, tol=-1.0, min_iter=0,
        checkpoint_dir=ckpt, checkpoint_every=2,
    )
    # An interrupted write (no _SUCCESS marker) must be invisible.
    junk = tmp_path / "ckpt" / "iter_00099"
    junk.mkdir()
    (junk / "part-00000.parquet").write_bytes(b"garbage")

    it, state = latest_checkpoint(spark, ckpt)
    assert it == 4
    resumed = pagerank(
        edges, max_iter=1, tol=-1.0, min_iter=0, initial_ranks=state,
    )
    got = {r["id"]: r["pr"] for r in resumed.ranks.collect()}
    assert got == want  # exact: same arithmetic from identical iter-4 state


def test_checkpoint_validation_and_empty_dir(spark, tmp_path):
    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import (
        latest_checkpoint,
    )

    edges = make_edges(spark, EDGES)
    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(edges, max_iter=1, checkpoint_dir="/tmp/x", checkpoint_every=0)
    assert latest_checkpoint(spark, str(tmp_path / "nonexistent")) is None
