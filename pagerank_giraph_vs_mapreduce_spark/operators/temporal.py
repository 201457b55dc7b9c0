"""Temporal join operators Spark lacks as built-ins (charter: custom
operators expressed as compositions of DataFrame ops — SURVEY.md §2.9):

- as-of join: for each left row, the latest right row with
  right.time <= left.time within the same key (DuckDB: native ASOF JOIN,
  which the declared query uses as its oracle).
- binned range join: equi-bucketed interval join — the scale-safe form of
  a non-equi time-range join (a plain range predicate compiles to a
  broadcast-nested-loop at best; binning turns it into an equi shuffle
  join plus a residual filter).

Scale notes: the as-of join is one union + one window pass — shuffle by
key, sort by time within partition; no self-cross. The range join shuffles
on (key?, bin); bin width trades duplication factor (interval_len/bin)
against bucket size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.time_col <= left.time_col`` and equal ``key`` (NULL payload if
    no such row). Implemented as tagged union + last-non-null window — one
    shuffle, no cross product.

    Payload columns travel as ONE nullable struct, so the matched right
    row is always atomic — per-column fills could splice event_id from
    one right row with value from another when a payload is NULL.
    Right-side ties on (key, time) pick ONE consistent row, but WHICH
    one is partition-order-dependent (same as engines' native ASOF) —
    cross-engine exactness therefore requires tie-free (key, time) on
    the right, pinned for the events fixture by
    tests/test_round10_ops.py::test_events_fixture_asof_preconditions.
    """
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (key, time_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    unioned = l_tag.unionByName(r_tag).select(
        *lcols,
        "_is_left",
        # NULL for left rows (ignorenulls skips them); non-null for every
        # right row even if all its payload fields are NULL — atomic
        F.when(
            F.col("_is_left") == 0,
            F.struct(*[F.col(f"_r_{c}").alias(c) for c in payload_cols]),
        ).alias("_r"),
    )
    # right rows sort before left rows at equal time → "<=" semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "_is_left",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *lcols, *[F.col(f"_r.{c}").alias(f"right_{c}") for c in payload_cols]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    ``right.time_col >= left.time_col`` and equal ``key`` (NULL payload
    if none) — the time-to-conversion / next-scheduled-event lookup
    (DuckDB: ``ASOF LEFT JOIN ... ON r.t >= l.t``). Mirror of
    ``asof_join``: tagged union + first-non-null over the FORWARD frame
    — one shuffle, no cross product. At equal time the right row
    qualifies (>=): left rows sort before right rows there, so the
    forward frame starting at the left row includes it."""
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (key, time_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    unioned = l_tag.unionByName(r_tag).select(
        *lcols,
        "_is_left",
        # atomic payload struct, as in asof_join (same tie/NULL contract)
        F.when(
            F.col("_is_left") == 0,
            F.struct(*[F.col(f"_r_{c}").alias(c) for c in payload_cols]),
        ).alias("_r"),
    )
    # left rows sort before right rows at equal time → ">=" semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("_is_left").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *lcols,
        "_is_left",
        F.first("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *lcols, *[F.col(f"_r.{c}").alias(f"right_{c}") for c in payload_cols]
    )


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Join each point p to every interval [start, end) containing it,
    via equi-join on bin id (intervals replicated per covered bin) plus a
    residual range filter. All columns from both sides are kept.

    ``bin_width`` should be >= the typical interval length so replication
    stays near 2×; the bin column is the natural partitioning key at scale.

    Bin ids use exact integer floor division (DIV corrected for negative
    remainders): floor-consistent for negative values and exact for all
    64-bit inputs — double division + cast('long') truncates toward zero
    (splitting a negative point from its containing interval) and loses
    exactness past 2^53. Spark's `/` always returns double, so even
    floor(a / b) on longs is not safe; DIV is integer but truncating.
    """
    w = int(bin_width)

    def _bin(c: str):
        q = F.expr(f"CAST({c} AS BIGINT) DIV {w}")
        r = F.expr(f"CAST({c} AS BIGINT) % {w}")
        return F.when(r < 0, q - 1).otherwise(q).cast("long")

    p = points.withColumn("_bin", _bin(point_col))
    i = intervals.withColumn(
        "_bins",
        F.sequence(_bin(start_col), _bin(end_col)),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")
    return (
        p.join(i, "_bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bin")
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    payload_cols: list[str],
    tolerance: int,
) -> DataFrame:
    """``asof_join`` with a staleness bound (pandas merge_asof's
    ``tolerance`` / kdb wj within-window): a backward match older than
    ``tolerance`` (same units as ``time_col``) is REJECTED — every
    right_* column nulls together, plus ``right_match_t`` carries the
    accepted match's time (NULL when rejected/unmatched).

    Pure composition: the unbounded as-of runs first (same one-shuffle
    union+window plan), then one codegen projection applies the bound.
    Atomicity is inherited: the gate reads only the matched row's own
    time, so all right columns share one verdict — no spliced rows.
    """
    r2 = right.withColumn("_asof_t", F.col(time_col))
    res = asof_join(left, r2, key, time_col, list(payload_cols) + ["_asof_t"])
    ok = F.col("right__asof_t").isNotNull() & (
        (F.col(time_col) - F.col("right__asof_t")) <= F.lit(tolerance)
    )
    return res.select(
        *left.columns,
        *[
            F.when(ok, F.col(f"right_{c}")).alias(f"right_{c}")
            for c in payload_cols
        ],
        F.when(ok, F.col("right__asof_t")).alias("right_match_t"),
    )
