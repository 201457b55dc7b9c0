"""Round-10 operator tests: ASOF join, one-level modularity (Louvain),
the real-codec seam composition, and the shared ASCII-fixture pin the
video-container oracles rely on (ADVICE r09)."""

from __future__ import annotations

import glob

import duckdb


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
