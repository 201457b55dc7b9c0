"""Curation-pipeline invariants on hand-built fixtures with known answers
(operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.operators.curation import (
    curate_corpus,
    curation_funnel,
    curation_signals,
)

# One long English doc (passes the quality gate: >= 100 chars, no digits),
# reused as the base for planted duplicates.
BASE = (
    "the cat sat on the mat and the dog sat on the log while a bird "
    "watched the scene and a fish swam in the bowl near the window sill"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_curate_removes_exact_and_near_dups_keeps_min_id(spark):
    d = _df(
        spark,
        [
            (1, BASE),
            (2, BASE),  # verbatim dup -> exact stage drops (keeps 1)
            (3, BASE + " zz"),  # near dup of 1 -> minhash stage drops
            (4, "el gato y los perros " * 8),  # fails lang gate (es)
            (5, "short 123"),  # fails quality gate
            (6, "the quick brown fox jumps over a lazy dog near the "
                "riverbank while the sun sets behind a quiet old hill"),
        ],
    )
    out = curate_corpus(d, "doc_id", "text", lang="en", min_quality=0.5)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 6]


def test_curate_signal_columns_match_component_operators(spark):
    d = _df(spark, [(1, BASE)])
    row = curation_signals(d, "doc_id", "text").collect()[0]
    assert row["lang_pred"] == "en"
    assert row["n_tokens"] == len(BASE.split(" "))
    assert row["quality"] > 0.5


def test_funnel_counts_are_monotone_and_consistent(spark):
    d = _df(
        spark,
        [(1, BASE), (2, BASE), (3, BASE + " zz"), (4, "short 123")],
    )
    row = curation_funnel(d, "doc_id", "text").collect()[0]
    assert row["n_input"] == 4
    assert row["n_input"] >= row["n_gated"] >= row["n_exact"] >= row["n_final"]
    assert row["n_final"] == curate_corpus(d, "doc_id", "text").count()
    assert row["n_final"] == 1  # only doc 1 survives


def test_vocabulary_counts_and_order(spark):
    from pagerank_giraph_vs_mapreduce_spark.operators.text import vocabulary

    d = _df(
        spark,
        [(1, "The cat and the dog"), (2, "a cat! a CAT? 42 dogs")],
    )
    rows = vocabulary(d, "doc_id", "text", top_n=3).collect()
    got = [(r["tok"], r["n_occ"], r["n_docs"]) for r in rows]
    # cat: 3 occurrences over 2 docs; a: 2/1; the: 2/1 (tie broken by token)
    assert got == [("cat", 3, 2), ("a", 2, 1), ("the", 2, 1)]


def test_near_dup_drop_is_greedy_higher_id(spark):
    # a < b < c chain: pairs (a,b), (a,c), (b,c) all >= threshold; greedy
    # drops every id_b, keeping only the minimum id.
    d = _df(
        spark,
        [(10, BASE), (11, BASE + " zz"), (12, BASE + " zz qq")],
    )
    out = curate_corpus(d, "doc_id", "text")
    assert [r["doc_id"] for r in out.collect()] == [10]


def test_chunk_documents_boundaries_and_overlap(spark):
    from pagerank_giraph_vs_mapreduce_spark.operators.text import chunk_documents

    import pytest as _pytest

    text = "abcdefghij"  # 10 chars
    d = _df(spark, [(1, text), (2, "xy")])
    rows = chunk_documents(d, "doc_id", "text", chunk_chars=6, overlap=2).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["chunk"], r["chunk_len"]) for r in rows}
    # stride 4: chunks at 1..6, 5..10, 9..10 (n = ceil((10-2)/4) = 2)
    assert got == {
        (1, 0): ("abcdef", 6),
        (1, 1): ("efghij", 6),
        (2, 0): ("xy", 2),
    }
    # consecutive chunks share exactly `overlap` chars
    assert got[(1, 0)][0][-2:] == got[(1, 1)][0][:2]
    with _pytest.raises(ValueError):
        chunk_documents(d, "doc_id", "text", chunk_chars=4, overlap=4)


def test_staged_curation_matches_one_plan_and_funnel(spark, tmp_path):
    from pagerank_giraph_vs_mapreduce_spark.operators.curation import (
        curate_corpus_staged,
    )

    d = _df(
        spark,
        [
            (1, BASE),
            (2, BASE),  # exact dup of 1
            (3, BASE + " zz"),  # near dup of 1
            (4, "el gato y los perros " * 8),  # lang-gated
            (5, "short 123"),  # quality-gated
            (6, "the quick brown fox jumps over a lazy dog near the "
                "riverbank while the sun sets behind a quiet old hill"),
        ],
    )
    staged = curate_corpus_staged(d, str(tmp_path / "stages"))
    # Same survivors as the one-plan pipeline, read back from parquet.
    assert sorted(r["doc_id"] for r in staged.final.collect()) == [1, 6]
    one_plan = {
        r["doc_id"]: r.asDict() for r in curate_corpus(d, "doc_id", "text").collect()
    }
    for r in staged.final.collect():
        assert r.asDict() == one_plan[r["doc_id"]]
    # Funnel counts come from observe() + staged tables; must equal the
    # one-plan funnel exactly.
    assert (
        staged.funnel.collect()[0].asDict()
        == curation_funnel(d, "doc_id", "text").collect()[0].asDict()
    )
    # Stage tables are durable parquet a restart could resume from.
    assert spark.read.parquet(staged.gated_path).count() == 4
    assert spark.read.parquet(staged.exact_path).count() == 3


def test_class_balance_quota_sampler(spark, sf_dir):
    """Classes at or under quota pass through whole; classes over quota
    shrink toward it via the deterministic md5 gate — and the selection
    is identical run-over-run (the retry/speculation-safety property)."""
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        QUOTA,
        pipeline_class_balance,
    )
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table

    orig = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = pipeline_class_balance(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    for lang, n in orig.items():
        if n <= QUOTA:
            assert got.get(lang, 0) == n  # under-quota class kept whole
        else:
            # md5 gate is a binomial draw around the quota — loose band,
            # but strictly downsampled.
            assert 0 < got[lang] < n
    # Deterministic: identical selection on re-run.
    again = sorted(r["doc_id"] for r in pipeline_class_balance(spark, sf_dir).collect())
    assert again == sorted(r["doc_id"] for r in rows)
