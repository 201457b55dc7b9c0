"""Structured Streaming over the events table (SURVEY.md §2.9: the
reference has NO streaming surface; this is the mandated extension).

The batch window operators (operators/windows.py) reuse directly under
``readStream`` — same expressions, plus a watermark for state eviction and
late-data handling. Tests drive this with a file source + availableNow
trigger and assert equality with the batch result; in production the
source would be Kafka/files and the sink a Delta/parquet table with
``update``/``append`` mode.

Scale notes: windowed streaming aggs keep per-(window × key) state in the
state store; the watermark bounds state size (windows older than the
watermark are finalized and evicted). Shuffle partitioning is by group key,
same as the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """File-source stream of events parquet part files.

    The stream source requires an explicit schema; we take it from a
    metadata-only batch read of the same path so the normalization adapts
    to either generation of the testdata (INT64 TIMESTAMP(NANOS) read as
    raw-nanos LONG, or TIMESTAMP(MICROS) read as TIMESTAMP_NTZ) and the
    output ``ts`` matches sources.tables.load_events exactly — the batch/
    stream twin equality the tests assert depends on it. ``glob`` narrows
    a directory source to matching file names.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read
    reader = spark.readStream
    if glob:
        batch = batch.option("pathGlobFilter", glob)
        reader = reader.option("pathGlobFilter", glob)
    physical = batch.parquet(path).schema
    raw = reader.schema(physical).parquet(path)
    if isinstance(physical["ts"].dataType, T.LongType):
        ts = F.timestamp_micros(F.expr("ts DIV 1000"))
    else:
        # NTZ micros; session tz is UTC so the LTZ cast preserves the epoch
        ts = F.col("ts").cast("timestamp")
    return raw.select(
        "event_id",
        ts.alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def streaming_tumbling_counts(
    events: DataFrame,
    duration_secs: int = 900,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums — the streaming twin of
    operators.windows.tumbling; late rows beyond the watermark are dropped
    and old window state is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{duration_secs} seconds").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("ws"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_sliding_counts(
    events: DataFrame,
    duration_secs: int = 3600,
    slide_secs: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window streaming twin of operators.windows.sliding."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{duration_secs} seconds", f"{slide_secs} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.unix_timestamp("w.start").alias("ws"), "n", "sum_value")
    )


def streaming_session_counts(
    events: DataFrame, gap_secs: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Session-window streaming twin of operators.windows.session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", f"{gap_secs} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming twin of exact dedup for at-least-once sources
    (dropDuplicatesWithinWatermark bounds the dedup state store)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_secs: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to clicks by the same
    user within the preceding ``horizon_secs`` — the streaming twin of the
    batch as-of/range temporal joins (operators/temporal.py).

    Both sides carry watermarks and the join condition time-bounds the
    buffered state: a click older than (watermark + horizon) can never
    match a future purchase, so Spark evicts it. Without the time bound the
    state store grows without limit — the canonical stream-join pitfall.
    State shards by user_id across executors (shuffle on the equi-key).
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon_secs} SECONDS")
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_timestamp("click_ts").alias("click_s"),
        F.unix_timestamp("purchase_ts").alias("purchase_s"),
        "value",
    )


def run_foreach_batch_upsert(
    stream: DataFrame, out_dir: str, key: str = "event_id"
) -> list[int]:
    """foreachBatch sink: per micro-batch, dedup on ``key`` and append to a
    parquet dir partitioned by batch id — the idempotent-upsert pattern for
    sinks with no native streaming support (JDBC, plain parquet).

    foreachBatch hands the micro-batch over as a *batch* DataFrame, so the
    full batch API (dedup, merge joins, overwrite-by-partition) applies;
    writing each batch to ``batch_id=N`` partitions makes replays after
    failure overwrite-idempotent instead of duplicating. Returns the batch
    ids processed.
    """
    seen: list[int] = []

    def upsert(batch: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        (
            batch.dropDuplicates([key])
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out_dir}_ckpt")
        .start()
    )
    q.awaitTermination()
    return seen


def run_to_memory_sink(
    stream: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain all available input into an in-memory table (test harness).

    ``output_mode='append'`` (default) works for the module's projection/
    dedup/join streams; pass ``'complete'`` for aggregation streams —
    complete mode on a non-aggregating stream is an AnalysisException.
    """
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
