"""Declared event-time window queries (operators/windows.py) with DuckDB
oracles. Window starts compare as epoch seconds (BIGINT); value sums use
the exact-decimal pattern. The session oracle spells out the lag/cumsum
dance Spark's session_window performs internally — new session when the
gap is >= the timeout (Spark merges an event strictly inside
[start, last+gap))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pagerank_giraph_vs_mapreduce_spark.operators.windows import (
    session,
    sliding,
    tumbling,
)
from pagerank_giraph_vs_mapreduce_spark.plans.registry import query
from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table

_DSUM_VALUE = "CAST(round(sum(CAST(value AS DECIMAL(38,12))), 6) AS DOUBLE) AS sum_value"


@query(
    "win_tumbling_15m",
    oracle=f"""SELECT (epoch_us(ts) // 900000000) * 900 AS ws,
       event_type, count(*) AS n, {_DSUM_VALUE}
FROM events GROUP BY 1, 2""",
)
def win_tumbling_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling windows × event_type (F.window on the Spark side)."""
    return tumbling(load_table(spark, sf_dir, "events"), 900)


@query(
    "win_sliding_1h_30m",
    oracle=f"""WITH assigned AS (
  SELECT (epoch_us(ts) // 1800000000) * 1800 AS ws, value FROM events
  UNION ALL
  SELECT (epoch_us(ts) // 1800000000) * 1800 - 1800 AS ws, value FROM events)
SELECT ws, count(*) AS n, {_DSUM_VALUE}
FROM assigned GROUP BY ws""",
)
def win_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding by 30 minutes (each event in 2 windows; the
    oracle materializes the same duplication as a 2-way union)."""
    return sliding(load_table(spark, sf_dir, "events"), 3600, 1800)


@query(
    "win_session_30m",
    oracle=f"""WITH e AS (SELECT user_id, epoch_us(ts) AS tu, value FROM events),
lagd AS (
  SELECT user_id, tu, value,
         CASE WHEN lag(tu) OVER w IS NULL
                   OR tu - lag(tu) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
sess AS (
  SELECT user_id, tu, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tu
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd)
SELECT user_id, min(tu) // 1000000 AS session_start,
       count(*) AS n_events, {_DSUM_VALUE}
FROM sess GROUP BY user_id, sid""",
)
def win_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (F.session_window on the Spark side)."""
    return session(load_table(spark, sf_dir, "events"), 1800)
