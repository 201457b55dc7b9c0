"""As-of join + binned range join edge cases: exact-tie timestamps,
no-match rows, interval boundaries (inclusive start, exclusive end)."""

from __future__ import annotations

from pagerank_giraph_vs_mapreduce_spark.operators.temporal import (
    asof_join,
    binned_range_join,
)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 5), (3, 200, 50), (4, 100, 4)],
        "lid bigint, k bigint, t bigint",
    )
    right = spark.createDataFrame(
        [(100, 5, 111), (100, 9, 222), (200, 60, 333)],
        "k bigint, t bigint, rid bigint",
    )
    out = {
        r["lid"]: r["right_rid"]
        for r in asof_join(left, right, "k", "t", ["rid"]).collect()
    }
    assert out[1] == 222  # latest at-or-before t=10 is t=9
    assert out[2] == 111  # exact tie t=5 included (<= semantics)
    assert out[3] is None  # right row at t=60 is in the future
    assert out[4] is None  # t=4 before any right row


def test_binned_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 200), (4, 99)], "pid bigint, p bigint"
    )
    intervals = spark.createDataFrame(
        [(7, 100, 200)], "iid bigint, s bigint, e bigint"
    )
    got = sorted(
        r["pid"]
        for r in binned_range_join(points, intervals, "p", "s", "e", 50).collect()
    )
    assert got == [1, 2]  # start inclusive, end exclusive, 99 outside


def test_binned_range_join_equals_plain_join(spark):
    import random

    rng = random.Random(3)
    points = spark.createDataFrame(
        [(i, rng.randrange(1000)) for i in range(300)], "pid bigint, p bigint"
    )
    intervals = spark.createDataFrame(
        [(i, s := rng.randrange(900), s + rng.randrange(1, 120)) for i in range(50)],
        "iid bigint, s bigint, e bigint",
    )
    from pyspark.sql import functions as F

    plain = {
        (r["pid"], r["iid"])
        for r in points.join(
            intervals,
            (points.p >= intervals.s) & (points.p < intervals.e),
        ).collect()
    }
    binned = {
        (r["pid"], r["iid"])
        for r in binned_range_join(points, intervals, "p", "s", "e", 64).collect()
    }
    assert binned == plain
    assert len(plain) > 0


def test_binned_range_join_negative_domain(spark):
    """Floor-consistent binning: negative points must match intervals that
    contain them (truncate-toward-zero binning split them across bins)."""
    points = spark.createDataFrame(
        [(1, -75), (2, -50), (3, -1), (4, -101), (5, 0)], "pid bigint, p bigint"
    )
    intervals = spark.createDataFrame(
        [(7, -100, 0), (8, 0, 100)], "iid bigint, s bigint, e bigint"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in binned_range_join(points, intervals, "p", "s", "e", 50).collect()
    )
    assert got == [(1, 7), (2, 7), (3, 7), (5, 8)]
