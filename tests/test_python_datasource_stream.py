"""Streaming face of the custom Python DataSource: batch framing,
end-of-data behavior, and the crash-replay determinism contract."""

from __future__ import annotations

import time

from pagerank_giraph_vs_mapreduce_spark.sources.python_datasource import (
    SyntheticDocsStreamReader,
    register,
    synth_row,
)


def test_stream_reader_offsets_and_replay_contract():
    r = SyntheticDocsStreamReader({"n": "100", "batch": "32"})
    assert r.initialOffset() == {"i": 0}
    off = r.initialOffset()
    seen = []
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows:
            assert nxt == off  # end-of-data holds the offset steady
            break
        seen.extend(rows)
        # crash-replay: re-reading the committed range regenerates the
        # batch bit-identically
        assert list(r.readBetweenOffsets(off, nxt)) == rows
        assert len(rows) <= 32
        off = nxt
    assert seen == [synth_row(i) for i in range(100)]


def test_stream_matches_batch_connector(spark):
    register(spark)
    n = 300
    batch_rows = sorted(
        tuple(r)
        for r in spark.read.format("synthetic_docs")
        .option("n", str(n))
        .load()
        .collect()
    )
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("n", str(n))
        .option("batch", "128")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream_test")
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if spark.table("pyds_stream_test").count() >= n:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination()
    stream_rows = sorted(tuple(r) for r in spark.table("pyds_stream_test").collect())
    assert stream_rows == batch_rows
