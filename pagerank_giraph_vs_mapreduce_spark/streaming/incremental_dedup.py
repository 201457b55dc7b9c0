"""Streaming incremental dedup — the production shape of continuous
corpus ingest: document shards arrive as a file stream; each micro-batch
(1) probes the durable LSH band index for near-dup candidates against
everything indexed so far, (2) appends its flagged candidates to a dup
sink, and (3) folds its own bands into the index so the NEXT batch sees
it. The stateful object is the bucketed index TABLE, not the Spark state
store — state survives restarts, is queryable offline, and its size is
corpus-bands, not stream-history (no watermark needed: dedup lookback is
deliberately unbounded).

At 100 TB/day this is the shape that holds: per-batch cost is
O(batch bands) for the probe (the index side never shuffles —
operators/dedup.py:probe_band_index) plus an O(batch) append; the index
accretes one file per bucket per batch, compacted on the usual
maintenance cadence (sources/sinks.py:compact_parquet discipline).

Candidate pairs are emitted WITHOUT the exact-Jaccard verify step: that
needs the old docs' shingles (a doc-store lookup, policy-dependent —
dedup_incremental_indexed shows the verified-batch variant); the stream
emits the LSH candidates, which is the recall-critical, index-bound part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
    append_band_index,
    banded_keys,
    minhash_signatures,
    probe_band_index,
    write_band_index,
)


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
) -> list[int]:
    """Drive ``stream`` (doc_id, text) to end-of-input through the
    probe→flag→index loop. Returns the processed batch ids. The first
    batch bootstraps the index (nothing to probe against); every later
    batch probes the accumulated index BEFORE indexing itself, so
    within-batch duplicates are deliberately not self-flagged (exact
    within-batch dedup is the cheap groupBy upstream)."""
    spark = stream.sparkSession
    rows_per_band = n_hashes // bands
    seen: list[int] = []

    def handle(batch: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        if batch.isEmpty():
            return
        # foreachBatch hands the batch a CLONED session — do everything
        # through it so catalog/file-listing caches stay coherent (the
        # probe/append helpers also refresh the table defensively)
        bs = batch.sparkSession
        sig = minhash_signatures(
            batch, id_col, text_col, n_hashes, shingle_len
        )
        banded = banded_keys(sig, bands=bands, rows_per_band=rows_per_band)
        banded = banded.persist()
        try:
            if bs.catalog.tableExists(index_table):
                cand = probe_band_index(bs, index_table, banded)
                (
                    cand.write.mode("append")
                    .format("parquet")
                    .saveAsTable(dup_table)
                )
                append_band_index(banded, index_table, buckets=buckets)
            else:
                write_band_index(
                    banded, index_table, index_path, buckets=buckets
                )
        finally:
            banded.unpersist()

    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return seen
