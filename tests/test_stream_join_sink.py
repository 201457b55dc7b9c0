"""Stream-stream watermarked join equals its batch twin; foreachBatch
upsert sink is dedup-idempotent."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events
from pagerank_giraph_vs_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
    run_foreach_batch_upsert,
    streaming_click_purchase_join,
)


def _stream_src(sf_dir, tmp_path, copies=1):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(copies):
        shutil.copy(f"{sf_dir}/events.parquet", src / f"p{i}.parquet")
    return str(src)


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, _stream_src(sf_dir, tmp_path))
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = streaming_click_purchase_join(clicks, purchases, horizon_secs=3600)
    q = (
        joined.writeStream.format("memory")
        .queryName("s_cpj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM s_cpj").collect()
    }

    ev = load_events(spark, sf_dir)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r["c_user"], r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 3600 SECONDS")
            ),
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_foreach_batch_upsert_dedups(spark, sf_dir, tmp_path):
    # Two copies of the same file = replayed input; the per-batch dedup must
    # leave exactly one row per event_id in the sink.
    stream = read_events_stream(spark, _stream_src(sf_dir, tmp_path, copies=2))
    out = str(tmp_path / "sink")
    batches = run_foreach_batch_upsert(stream, out)
    assert len(batches) >= 1

    written = spark.read.parquet(out)
    n_ids = written.select("event_id").distinct().count()
    assert written.count() == n_ids
    base = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n_ids == base
