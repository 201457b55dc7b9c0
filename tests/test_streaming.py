"""Structured Streaming: the streaming tumbling agg must equal the batch
operator on the same input (file source, availableNow trigger)."""

from __future__ import annotations

import shutil

from pagerank_giraph_vs_mapreduce_spark.operators.windows import tumbling
from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events
from pagerank_giraph_vs_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
    run_to_memory_sink,
    streaming_tumbling_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")

    stream = read_events_stream(spark, str(src))
    assert stream.isStreaming
    run_to_memory_sink(
        streaming_tumbling_counts(stream, 900, watermark="10 hours"),
        "stream_tumble",
        output_mode="complete",
    )
    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM stream_tumble").collect()
    }

    batch = tumbling(load_events(spark, sf_dir), 900)
    want = {(r["ws"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want
    assert len(want) > 10


def test_registered_streaming_query_runs(spark, sf_dir):
    """The driver-facing streaming queries (plans/streaming_queries.py)
    must run end-to-end from the registry on the small fixture."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    rows = QUERIES["stream_dedup_counts"](spark, sf_dir).collect()
    assert rows  # every event_type present with a positive distinct count
    assert all(r["n"] > 0 for r in rows)
