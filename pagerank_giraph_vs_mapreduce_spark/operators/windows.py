"""Event-time windowing over the events table: tumbling, sliding, session.

Batch implementations using Spark's native window helpers (F.window /
F.session_window) — the same expressions run under Structured Streaming
with a watermark (see streaming/). Window starts are emitted as epoch
seconds (BIGINT) so results compare exactly against SQL oracles (raw
timestamp objects don't hash portably across engines).

Scale notes: tumbling/sliding aggs are single-shuffle hash aggregations
keyed by (window, keys); sliding duplicates each row duration/slide times
at map side (×2 here). Session windows shuffle by user then sort within
partition — Spark's session_window does exactly the lag/cumsum dance the
SQL oracle spells out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dsum(col, alias):
    return F.round(F.sum(col.cast("decimal(38,12)")), 6).cast("double").alias(alias)


def tumbling(events: DataFrame, duration_secs: int = 900) -> DataFrame:
    """Per-window, per-event-type counts and value sums."""
    w = F.window("ts", f"{duration_secs} seconds")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), "sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("ws"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding(
    events: DataFrame, duration_secs: int = 3600, slide_secs: int = 1800
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    w = F.window("ts", f"{duration_secs} seconds", f"{slide_secs} seconds")
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), "sum_value"))
        .select(F.unix_timestamp("w.start").alias("ws"), "n", "sum_value")
    )


def session(events: DataFrame, gap_secs: int = 1800) -> DataFrame:
    """Per-user sessions closed by ``gap_secs`` of inactivity."""
    w = F.session_window("ts", f"{gap_secs} seconds")
    return (
        events.groupBy("user_id", w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum(F.col("value"), "sum_value"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
