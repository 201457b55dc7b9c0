"""Streaming incremental dedup: each arriving shard probes the durable
band index built from every EARLIER shard, then indexes itself — so
cross-batch near-dups are flagged, unseen docs are not, and the dup sink
accumulates exactly the (new, old) candidate pairs."""

from __future__ import annotations

import glob as globmod
import os
import shutil

from pagerank_giraph_vs_mapreduce_spark.streaming.incremental_dedup import (
    run_streaming_incremental_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the riverbank "
    "while the miller grinds wheat and the baker kneads bread all day"
)
OTHER = (
    "spark shuffles partition data between executors while catalyst "
    "rewrites the logical plan and tungsten generates tight jvm code"
)


def _write_shard(spark, rows, src, name, seq, tmp_path):
    staging = tmp_path / f"_stage_{name}"
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(staging))
    part = globmod.glob(str(staging / "part-*.parquet"))[0]
    src.mkdir(exist_ok=True)
    dest = src / f"{name}.parquet"
    shutil.copy(part, dest)
    t = 1_700_000_000 + seq * 60
    os.utime(dest, (t, t))
    shutil.rmtree(staging)


def test_streaming_incremental_dedup_flags_cross_batch_dups(spark, tmp_path):
    src = tmp_path / "shards"
    # shard 1 bootstraps the index; shard 2 dups a shard-1 doc; shard 3
    # dups docs from BOTH earlier shards and adds a fresh one
    _write_shard(spark, [(1, BASE), (2, OTHER)], src, "s1", 1, tmp_path)
    # doc 10 is an exact copy: collides in every band by construction, so
    # the assertion tests index accretion, not LSH recall (recall has its
    # own driver-certified row, dedup_recall_planted)
    _write_shard(spark, [(10, BASE), (11, "totally novel words nobody indexed before anywhere truly")], src, "s2", 2, tmp_path)
    _write_shard(spark, [(20, BASE), (21, OTHER + " indeed"), (22, "another brand new document with its own fresh vocabulary")], src, "s3", 3, tmp_path)

    for t in ("sid_index", "sid_dups"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    batch_ids = run_streaming_incremental_dedup(
        stream,
        index_table="sid_index",
        index_path=str(tmp_path / "sid_idx"),
        dup_table="sid_dups",
        dup_path=str(tmp_path / "sid_dups"),
        buckets=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        assert len(batch_ids) >= 3  # one per shard (availableNow may add empty)
        dups = {
            (r["id_new"], r["id_old"])
            for r in spark.table("sid_dups").collect()
        }
        # cross-batch near-dups flagged, including against a LATER index
        # generation (20 vs 10 proves shard 2 was folded into the index)
        assert (10, 1) in dups
        assert (20, 1) in dups and (20, 10) in dups
        assert (21, 2) in dups
        # fresh docs never flagged
        assert not any(i in (11, 22) for i, _ in dups)
        # the index now carries every shard's bands: 7 docs x 4 bands
        assert spark.table("sid_index").count() == 7 * 4

        # --- replay idempotence: foreachBatch is at-least-once, so a
        # crash between the sink writes and the checkpoint commit
        # re-runs the SAME batch_id. Re-running a batch must rewrite its
        # own partition, not append duplicates.
        from pagerank_giraph_vs_mapreduce_spark.streaming.incremental_dedup import (
            process_batch,
        )

        s2 = spark.read.parquet(str(src / "s2.parquet"))
        replay_id = sorted(batch_ids)[1]  # the batch that carried s2
        for _ in range(2):  # replay twice for good measure
            process_batch(
                s2,
                replay_id,
                index_table="sid_index",
                index_path=str(tmp_path / "sid_idx"),
                dup_table="sid_dups",
                dup_path=str(tmp_path / "sid_dups"),
                buckets=4,
            )
        assert spark.table("sid_index").count() == 7 * 4
        assert {
            (r["id_new"], r["id_old"])
            for r in spark.table("sid_dups").collect()
        } == dups
        assert spark.table("sid_dups").count() == len(dups)
    finally:
        for t in ("sid_index", "sid_dups"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
