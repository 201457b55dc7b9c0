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

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos, as in the parquet
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events parquet part files."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.select(
        "event_id",
        F.timestamp_micros(F.expr("ts DIV 1000")).alias("ts"),
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


def run_to_memory_sink(stream: DataFrame, name: str) -> None:
    """Drain all available input into an in-memory table (test harness)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
