"""Sliding/session streaming twins equal their batch operators; streaming
dedup removes duplicate event_ids across micro-batches."""

from __future__ import annotations

import shutil

from pagerank_giraph_vs_mapreduce_spark.operators.windows import session, sliding
from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events
from pagerank_giraph_vs_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
    run_to_memory_sink,
    streaming_dedup,
    streaming_session_counts,
    streaming_sliding_counts,
)


def _stream_src(sf_dir, tmp_path, copies=1):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(copies):
        shutil.copy(f"{sf_dir}/events.parquet", src / f"p{i}.parquet")
    return str(src)


def test_streaming_sliding_equals_batch(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, _stream_src(sf_dir, tmp_path))
    run_to_memory_sink(streaming_sliding_counts(stream), "s_slide", output_mode="complete")
    got = {(r["ws"], r["n"]) for r in spark.sql("SELECT ws, n FROM s_slide").collect()}
    want = {
        (r["ws"], r["n"]) for r in sliding(load_events(spark, sf_dir)).collect()
    }
    assert got == want


def test_streaming_session_equals_batch(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, _stream_src(sf_dir, tmp_path))
    run_to_memory_sink(streaming_session_counts(stream), "s_sess", output_mode="complete")
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM s_sess").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session(load_events(spark, sf_dir)).collect()
    }
    assert got == want


def test_streaming_dedup_drops_replayed_events(spark, sf_dir, tmp_path):
    # two identical files = an at-least-once replay; dedup must halve it
    stream = read_events_stream(spark, _stream_src(sf_dir, tmp_path, copies=2))
    deduped = streaming_dedup(stream).select("event_id")
    q = (
        deduped.writeStream.format("memory")
        .queryName("s_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM s_dedup").first()
    base = load_events(spark, sf_dir).count()
    assert n["n"] == base  # not 2x
    assert n["c"] == base


def test_streaming_curation_gate_incremental(spark, tmp_path):
    """The curation gate processes arriving document shards one
    micro-batch at a time (maxFilesPerTrigger=1) and the appended
    survivors equal the batch gate over the union — the stateless
    front-end contract of the streaming curation slice."""
    from pagerank_giraph_vs_mapreduce_spark.operators.curation import (
        curation_signals,
    )
    from pyspark.sql import functions as F

    good = (
        "the cat sat on the mat and the dog sat on the log while a bird "
        "watched the scene and a fish swam in the bowl near the window"
    )
    src = tmp_path / "docs"
    # Two separate files -> two arrivals.
    spark.createDataFrame(
        [(1, good), (2, "short 123")], "doc_id bigint, text string"
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [(3, good + " indeed"), (4, "el gato y los perros " * 8)],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    gated = curation_signals(stream, "doc_id", "text").filter(
        (F.col("lang_pred") == "en") & (F.col("quality") >= 0.5)
    )
    q = (
        gated.select("doc_id")
        .writeStream.format("memory")
        .queryName("s_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    assert n_batches >= 2  # shards really processed incrementally
    got = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM s_gate").collect())
    assert got == [1, 3]  # 2 quality-gated, 4 lang-gated
