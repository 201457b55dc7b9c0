"""applyInPandasWithState: state must carry across micro-batches.

Two copies of the events file + maxFilesPerTrigger=1 → two micro-batches;
the final running totals must equal 2× the batch aggregate.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events
from pagerank_giraph_vs_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
)
from pagerank_giraph_vs_mapreduce_spark.streaming.stateful import (
    stateful_user_totals,
)


def test_state_carries_across_microbatches(spark, sf_dir, tmp_path):
    src = tmp_path / "events_2x"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .select("user_id", "value")
    )
    q = (
        stateful_user_totals(raw)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # append mode emits one row per user per batch; the max is the final state
    got = {
        r["user_id"]: r["final_n"]
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS final_n FROM user_totals GROUP BY user_id"
        ).collect()
    }
    want = {
        r["user_id"]: 2 * r["n"]
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
