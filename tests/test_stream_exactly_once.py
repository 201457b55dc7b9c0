"""End-to-end streaming exactly-once under a REAL mid-query kill
(VERDICT r06 item 8): the query is crashed by an injected failure AFTER
a batch's sink writes land but BEFORE Structured Streaming commits the
checkpoint — the exact at-least-once window foreachBatch exposes. A
fresh query on the same checkpoint must replay that batch_id, and the
composed sinks must come out exactly-once:

- the batch_id-partitioned dup sink + band index (dynamic partition
  overwrite idempotence, streaming/incremental_dedup.py), and
- a versioned table written with write_version_tagged(tag=batch_id)
  (sources/versioned.py) — the replayed commit sees its tag and no-ops.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil

import pytest
from pyspark.sql import functions as F

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


def test_stream_exactly_once_survives_mid_query_kill(spark, tmp_path):
    from pagerank_giraph_vs_mapreduce_spark.sources.versioned import (
        read_all_versions,
        versions,
        write_version_tagged,
    )
    from pagerank_giraph_vs_mapreduce_spark.streaming.incremental_dedup import (
        process_batch,
    )

    src = tmp_path / "shards"
    _write_shard(spark, [(1, BASE), (2, OTHER)], src, "s1", 1, tmp_path)
    _write_shard(
        spark,
        [(10, BASE), (11, "totally novel words nobody indexed before")],
        src,
        "s2",
        2,
        tmp_path,
    )
    _write_shard(
        spark,
        [(20, BASE), (21, OTHER + " indeed"), (22, "fresh vocabulary here")],
        src,
        "s3",
        3,
        tmp_path,
    )

    vbase = str(tmp_path / "accepted_docs")
    for t in ("xo_index", "xo_dups"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    crash_armed = {"on": True}
    handled: list[int] = []

    def handle(batch, batch_id):
        if batch.isEmpty():
            return
        handled.append(batch_id)
        # sink 1+2: dup sink + band index (batch_id-partitioned overwrite)
        process_batch(
            batch,
            batch_id,
            index_table="xo_index",
            index_path=str(tmp_path / "xo_idx"),
            dup_table="xo_dups",
            dup_path=str(tmp_path / "xo_dups"),
            buckets=4,
        )
        # sink 3: versioned accepted-docs table, tagged commit per batch
        write_version_tagged(
            batch.select("doc_id", F.lit(batch_id).alias("batch_id")),
            vbase,
            tag=batch_id,
        )
        if crash_armed["on"] and batch_id == 1:
            crash_armed["on"] = False
            # ALL sink writes for batch 1 have landed; the checkpoint
            # commit for batch 1 has NOT happened. This is the window a
            # worker loss / OOM / kill -9 exposes in production.
            raise RuntimeError("injected crash before checkpoint commit")

    def run_query():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()

    try:
        from pyspark.errors.exceptions.captured import StreamingQueryException

        with pytest.raises(StreamingQueryException, match="injected crash"):
            run_query()
        # batch 1's effects are on disk, its checkpoint commit is not:
        # the exactly-once claim is now carried entirely by the sinks.
        assert 1 in handled

        run_query()  # restart from the same checkpoint — must replay id 1

        assert handled.count(1) == 2  # the kill really forced a replay
        # dup sink: exactly the cross-batch pairs, no duplicates
        dups = [
            (r["id_new"], r["id_old"])
            for r in spark.table("xo_dups").collect()
        ]
        assert len(dups) == len(set(dups))
        assert {(10, 1), (20, 1), (20, 10), (21, 2)} <= set(dups)
        assert not any(i in (11, 22) for i, _ in dups)
        # band index: docs x bands invariant (7 docs x 4 bands), with
        # each doc's bands exactly once
        assert spark.table("xo_index").count() == 7 * 4
        assert (
            spark.table("xo_index").select("id", "band").distinct().count()
            == 7 * 4
        )
        # versioned table: one committed version per non-empty batch (the
        # replayed tag no-oped), and each doc accepted exactly once
        assert len(versions(vbase)) == len(set(handled))
        accepted = read_all_versions(spark, vbase)
        assert accepted.count() == 7
        assert accepted.select("doc_id").distinct().count() == 7
    finally:
        for t in ("xo_index", "xo_dups"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_index_compaction_folds_batches_and_keeps_probes(
    spark, tmp_path
):
    """compact_stream_index folds committed batch partitions into the
    base (batch_id=-1) partition via a generation swap: the docs×bands
    invariant holds, later batches still flag dups against the folded
    base, and a replay of a post-compaction batch stays idempotent."""
    from pagerank_giraph_vs_mapreduce_spark.streaming.incremental_dedup import (
        compact_stream_index,
        process_batch,
        run_streaming_incremental_dedup,
    )

    src = tmp_path / "shards"
    _write_shard(spark, [(1, BASE), (2, OTHER)], src, "s1", 1, tmp_path)
    _write_shard(spark, [(10, BASE), (11, "unrelated fresh words")], src, "s2", 2, tmp_path)
    _write_shard(spark, [(20, BASE), (21, OTHER + " indeed")], src, "s3", 3, tmp_path)

    for t in ("ci_index", "ci_dups"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    batch_ids = run_streaming_incremental_dedup(
        stream,
        index_table="ci_index",
        index_path=str(tmp_path / "ci_idx"),
        dup_table="ci_dups",
        dup_path=str(tmp_path / "ci_dups"),
        buckets=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        n_docs = 6
        assert spark.table("ci_index").count() == n_docs * 4
        # fold EVERY committed partition (all checkpoint-committed here)
        upto = max(batch_ids) + 1
        n = compact_stream_index(spark, "ci_index", upto, buckets=4)
        assert n == n_docs * 4  # invariant preserved
        parts = {
            r["batch_id"]
            for r in spark.table("ci_index").select("batch_id").distinct().collect()
        }
        assert parts == {-1}  # everything folded into the base
        # compaction is idempotent (re-run over the folded state)
        assert compact_stream_index(spark, "ci_index", upto, buckets=4) == n

        # a NEW batch still probes the folded base and flags its dups
        s4 = spark.createDataFrame(
            [(30, BASE), (31, "yet another novel doc")],
            "doc_id bigint, text string",
        )
        new_id = upto + 7
        for _ in range(2):  # and its replay is idempotent
            process_batch(
                s4,
                new_id,
                index_table="ci_index",
                index_path=str(tmp_path / "ci_idx"),
                dup_table="ci_dups",
                dup_path=str(tmp_path / "ci_dups"),
                buckets=4,
            )
        dups = [
            (r["id_new"], r["id_old"])
            for r in spark.table("ci_dups").filter(
                f"batch_id = {new_id}"
            ).collect()
        ]
        assert len(dups) == len(set(dups))
        assert {(30, 1), (30, 10), (30, 20)} <= set(dups)
        assert not any(i == 31 for i, _ in dups)
        assert spark.table("ci_index").count() == (n_docs + 2) * 4
    finally:
        for t in ("ci_index", "ci_dups"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
