"""Streaming incremental dedup — the production shape of continuous
corpus ingest: document shards arrive as a file stream; each micro-batch
(1) probes the durable LSH band index for near-dup candidates against
everything indexed so far, (2) appends its flagged candidates to a dup
sink, and (3) folds its own bands into the index so the NEXT batch sees
it. The stateful object is the bucketed index TABLE, not the Spark state
store — state survives restarts, is queryable offline, and its size is
corpus-bands, not stream-history (no watermark needed: dedup lookback is
deliberately unbounded).

Exactly-once under replay: foreachBatch is at-least-once — after a crash
between the sink writes and the checkpoint commit, the SAME batch_id is
replayed. Both tables are therefore partitioned by ``batch_id`` and every
write is a dynamic-partition OVERWRITE of exactly the replayed batch's
partition: re-running batch N rewrites partition N with the identical
(deterministic) rows instead of appending duplicates, so the dup sink
stays duplicate-free and the index keeps its docs-x-bands count
invariant. The probe excludes the current ``batch_id``'s own partition,
which both preserves the "within-batch dups are not self-flagged"
contract and makes the probe itself replay-correct when the index write
landed but the checkpoint commit did not.

At 100 TB/day this is the shape that holds: per-batch cost is
O(batch bands) for the probe (the index side never shuffles — the
equi-join keys equal the table's (band, bkey) bucketing, with the
batch_id partitioning orthogonal to it) plus an O(batch) partition
write; the index accretes one partition per batch, compacted on the
usual maintenance cadence.

Candidate pairs are emitted WITHOUT the exact-Jaccard verify step: that
needs the old docs' shingles (a doc-store lookup, policy-dependent —
dedup_incremental_indexed shows the verified-batch variant); the stream
emits the LSH candidates, which is the recall-critical, index-bound part.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
    banded_keys,
    minhash_signatures,
)


def process_batch(
    batch: DataFrame,
    batch_id: int,
    index_table: str,
    index_path: str,
    dup_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 24,
    shingle_len: int = 5,
    bands: int = 4,
    buckets: int = 16,
    dup_path: str | None = None,
) -> None:
    """One micro-batch of the probe→flag→index loop, idempotent in
    ``batch_id``: safe to re-run with the same id after a partial failure
    (every write is a dynamic overwrite of this batch's partition; the
    probe never sees this batch's own partition)."""
    if batch.isEmpty():
        return
    # foreachBatch hands the batch a CLONED session — do everything
    # through it so catalog/file-listing caches stay coherent
    bs = batch.sparkSession
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(batch, id_col, text_col, n_hashes, shingle_len)
    banded = banded_keys(sig, bands=bands, rows_per_band=rows_per_band)
    # batch_id LAST: insertInto binds by position and the partition
    # column sits at the end of the table schema
    banded = banded.withColumn("batch_id", F.lit(batch_id)).persist()
    try:
        if bs.catalog.tableExists(index_table):
            bs.catalog.refreshTable(index_table)
            idx = (
                bs.table(index_table)
                # probe strictly EARLIER batches (ids are monotonic from
                # the checkpoint): no self-flagging, and a replayed batch
                # recomputes exactly its original candidates even if
                # later batches already landed before the crash replay —
                # a partition-pruned read either way
                .filter(F.col("batch_id") < batch_id)
                .select(F.col("id").alias("id_old"), "band", "bkey")
            )
            cand = (
                banded.select(F.col("id").alias("id_new"), "band", "bkey")
                .join(idx, ["band", "bkey"])
                .select("id_new", "id_old")
                .distinct()
                .withColumn("batch_id", F.lit(batch_id))
            )
            # DYNAMIC partition overwrite: replace only the partitions
            # present in the data (this batch's), never the whole table.
            # Session conf, not a writer option — the option form is
            # silently ignored by the V1 insertInto path.
            pom_key = "spark.sql.sources.partitionOverwriteMode"
            prior = bs.conf.get(pom_key)
            bs.conf.set(pom_key, "dynamic")
            try:
                if bs.catalog.tableExists(dup_table):
                    cand.write.mode("overwrite").insertInto(dup_table)
                else:
                    # explicit external location when given: a MANAGED
                    # table's warehouse dir outlives its (session-local)
                    # catalog entry, and a later session's bootstrap then
                    # fails with LOCATION_ALREADY_EXISTS. Overwrite mode:
                    # a crash between the data write and the catalog
                    # commit leaves partial files at the path, and the
                    # replayed batch must be able to re-bootstrap over
                    # them instead of erroring on a non-empty dir.
                    w = (
                        cand.write.partitionBy("batch_id")
                        .mode("overwrite")
                        .format("parquet")
                    )
                    if dup_path:
                        w = w.option("path", dup_path)
                    w.saveAsTable(dup_table)
                banded.write.mode("overwrite").insertInto(index_table)
            finally:
                bs.conf.set(pom_key, prior)
            bs.catalog.refreshTable(index_table)
        else:
            # bootstrap: create the index partitioned by batch_id AND
            # bucketed on the probe's join key — every later write is a
            # per-partition dynamic overwrite into this spec. Overwrite
            # mode for replay-safety: a crash mid-bootstrap leaves
            # partial files at index_path with no catalog entry, and the
            # replayed batch re-bootstraps over them.
            (
                banded.write.partitionBy("batch_id")
                .bucketBy(buckets, "band", "bkey")
                .sortBy("band", "bkey")
                .option("path", index_path)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(index_table)
            )
    finally:
        banded.unpersist()


_GEN_RE_STREAM = re.compile(r"^(.*?)__sgen(\d+)$")


def compact_stream_index(
    spark: SparkSession,
    index_table: str,
    upto_batch_id: int,
    buckets: int = 16,
) -> int:
    """Maintenance compaction for the streaming band index: fold every
    partition with ``batch_id < upto_batch_id`` into the BASE partition
    (``batch_id = -1``), keeping newer partitions as-is. The index
    accretes one partition per micro-batch; after B batches a probe
    opens B partition directories — correctness is unaffected, but the
    listing/open overhead accretes, so this runs on the usual
    maintenance cadence. Returns the distinct (id, band, bkey) row
    count (the docs×bands invariant for callers to assert).

    Probe semantics are preserved by construction: the probe filters
    ``batch_id < current`` and -1 compares below every real id, so the
    folded base is always visible to later batches. Replay safety: pass
    the newest CHECKPOINT-COMMITTED batch id (exclusive) — only the
    latest uncommitted batch can ever replay under foreachBatch, and
    its partition is untouched, so a replayed overwrite still lands on
    its own partition. ``distinct`` on fold also makes the compaction
    itself idempotent under re-runs over a crashed previous attempt.

    Same failure-atomic generation swap as operators/dedup.py:
    compact_band_index (write a fresh ``<base>__sgen<k+1>`` location
    under a scratch name, repoint the catalog, then delete the old
    generation), with the same quiesce contract: run it where no probe
    is in flight — e.g. inside the foreachBatch handler between
    batches, which is single-threaded by construction."""
    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
        _delete_path,
        _table_location,
    )

    spark.catalog.refreshTable(index_table)
    location = _table_location(spark, index_table)
    m = _GEN_RE_STREAM.match(location)
    base, gen = (m.group(1), int(m.group(2))) if m else (location, 1)
    new_location = f"{base}__sgen{gen + 1}"
    scratch = f"{index_table}__compacting"
    spark.sql(f"DROP TABLE IF EXISTS {scratch}")
    _delete_path(spark, new_location)
    rows = spark.table(index_table)
    folded = (
        rows.filter(F.col("batch_id") < upto_batch_id)
        .select("id", "band", "bkey")
        .distinct()
        .withColumn("batch_id", F.lit(-1))
    )
    keep = rows.filter(F.col("batch_id") >= upto_batch_id)
    merged = folded.unionByName(keep)
    n = merged.count()
    (
        merged.write.partitionBy("batch_id")
        .bucketBy(buckets, "band", "bkey")
        .sortBy("band", "bkey")
        .option("path", new_location)
        .mode("errorifexists")
        .format("parquet")
        .saveAsTable(scratch)
    )
    spark.sql(f"DROP TABLE {index_table}")
    spark.sql(f"ALTER TABLE {scratch} RENAME TO {index_table}")
    spark.catalog.refreshTable(index_table)
    _delete_path(spark, location)
    return n


def run_streaming_incremental_dedup(
    stream: DataFrame,
    index_table: str,
    index_path: str,
    dup_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 24,
    shingle_len: int = 5,
    bands: int = 4,
    buckets: int = 16,
    checkpoint_dir: str | None = None,
    dup_path: str | None = None,
) -> list[int]:
    """Drive ``stream`` (doc_id, text) to end-of-input through the
    probe→flag→index loop. Returns the processed batch ids. The first
    batch bootstraps the index (nothing to probe against); every later
    batch probes the accumulated index BEFORE indexing itself, so
    within-batch duplicates are deliberately not self-flagged (exact
    within-batch dedup is the cheap groupBy upstream)."""
    seen: list[int] = []

    def handle(batch: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        process_batch(
            batch,
            batch_id,
            index_table,
            index_path,
            dup_table,
            id_col,
            text_col,
            n_hashes,
            shingle_len,
            bands,
            buckets,
            dup_path,
        )

    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return seen
