"""Streaming WCC maintenance (streaming/graph_maintenance.py): edge
deltas arriving as a file stream advance a durable batch_id-partitioned
label table via the incremental kernel. Pins:

- per-batch snapshots are the CONVERGED labels of the edges seen so far
  (merges across batches land; fresh components appear);
- the final labeling equals the full-recompute answer;
- replay idempotence: re-running an already-committed batch_id (the
  foreachBatch at-least-once crash window) rewrites its own partitions
  with identical content and leaves later batches untouched.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil

from pyspark.sql import functions as F


def _write_shard(spark, pairs, src, name, seq, tmp_path):
    staging = tmp_path / f"_stage_{name}"
    spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src bigint, dst bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = globmod.glob(str(staging / "part-*.parquet"))[0]
    src.mkdir(exist_ok=True)
    dest = src / f"{name}.parquet"
    shutil.copy(part, dest)
    t = 1_700_000_000 + seq * 60
    os.utime(dest, (t, t))
    shutil.rmtree(staging)


def test_streaming_wcc_maintenance_and_replay(spark, tmp_path):
    from pagerank_giraph_vs_mapreduce_spark.streaming.graph_maintenance import (
        latest_labels,
        process_wcc_batch,
        run_streaming_wcc,
    )

    src = tmp_path / "shards"
    # s1: two 2-vertex components; s2: merges them AND starts a fresh
    # one; s3: bridges everything to the fresh one, plus another new comp
    _write_shard(spark, [(1, 2), (3, 4)], src, "s1", 1, tmp_path)
    _write_shard(spark, [(2, 3), (10, 11)], src, "s2", 2, tmp_path)
    _write_shard(spark, [(4, 10), (20, 21)], src, "s3", 3, tmp_path)

    e_t, l_t = "gm_edges", "gm_labels"
    for t in (e_t, l_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        stream = (
            spark.readStream.schema("src bigint, dst bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        batch_ids = run_streaming_wcc(
            stream,
            edges_table=e_t,
            edges_path=str(tmp_path / "edges"),
            labels_table=l_t,
            labels_path=str(tmp_path / "labels"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        assert len(batch_ids) >= 3

        # final labeling == full-recompute answer
        final = {
            (r["id"], r["component"])
            for r in latest_labels(spark, l_t).collect()
        }
        assert final == {
            (1, 1), (2, 1), (3, 1), (4, 1), (10, 1), (11, 1),
            (20, 20), (21, 20),
        }

        # intermediate snapshots are the converged labels of their prefix
        snaps = spark.table(l_t)
        bids = sorted(
            r["batch_id"]
            for r in snaps.select("batch_id").distinct().collect()
        )
        s0 = {
            (r["id"], r["component"])
            for r in snaps.filter(F.col("batch_id") == bids[0]).collect()
        }
        assert s0 == {(1, 1), (2, 1), (3, 3), (4, 3)}
        s1 = {
            (r["id"], r["component"])
            for r in snaps.filter(F.col("batch_id") == bids[1]).collect()
        }
        assert s1 == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}

        # --- replay idempotence: re-run the s2 batch (its id) twice
        n_edges = spark.table(e_t).count()
        s2 = spark.read.parquet(str(src / "s2.parquet"))
        replay_id = bids[1]
        for _ in range(2):
            process_wcc_batch(
                s2,
                replay_id,
                edges_table=e_t,
                edges_path=str(tmp_path / "edges"),
                labels_table=l_t,
                labels_path=str(tmp_path / "labels"),
            )
        assert spark.table(e_t).count() == n_edges
        s1_after = {
            (r["id"], r["component"])
            for r in spark.table(l_t)
            .filter(F.col("batch_id") == replay_id)
            .collect()
        }
        assert s1_after == s1  # identical rewrite, no duplicates
        assert {
            (r["id"], r["component"])
            for r in latest_labels(spark, l_t).collect()
        } == final  # later batches untouched
    finally:
        for t in (e_t, l_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
