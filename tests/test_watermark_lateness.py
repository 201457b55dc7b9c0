"""Watermark correctness under late / out-of-order arrival (VERDICT_r04
item 8): the session-window stream must (a) absorb late rows that arrive
within the watermark across micro-batch boundaries — agreeing with the
batch answer over the full input — and (b) once the watermark has
evicted a session, emit it exactly once and DROP stragglers older than
the watermark instead of resurrecting state. (b) is the
state-boundedness property: an engine that never drops is "correct" on
(a) but its state store grows without bound at 100 TB/day.

File arrival order is forced with explicit mtimes + maxFilesPerTrigger=1
so each file IS one micro-batch, and a far-future sentinel file pushes
the final watermark past every real session so append mode flushes them.
"""

from __future__ import annotations

import glob as globmod
import os
import shutil
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.streaming.events_stream import (
    streaming_session_counts,
)

_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"

T0 = datetime(2026, 1, 1, 0, 0, 0)
SENTINEL_USER = 99


def _mins(m: float) -> datetime:
    return T0 + timedelta(minutes=m)


def _write_file(spark, rows, src, name, seq, tmp_path):
    """One parquet file = one micro-batch; mtime forces arrival order."""
    staging = tmp_path / f"_stage_{name}"
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(staging))
    part = globmod.glob(str(staging / "part-*.parquet"))[0]
    src.mkdir(exist_ok=True)
    dest = src / f"{name}.parquet"
    shutil.copy(part, dest)
    t = 1_700_000_000 + seq * 60
    os.utime(dest, (t, t))
    shutil.rmtree(staging)


def _ev(eid, ts, user):
    return (eid, ts, user, "click", 1.0)


def _drain_sessions(spark, src, watermark, sink_name):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    sess = streaming_session_counts(stream, gap_secs=1800, watermark=watermark)
    q = (
        sess.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table(sink_name).collect()
        if r["user_id"] != SENTINEL_USER
    }


def _batch_sessions(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in (
            df.groupBy(
                "user_id", F.session_window("ts", "1800 seconds").alias("w")
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.unix_timestamp("w.start").alias("session_start"),
                "n_events",
            )
            .collect()
        )
    }


def test_late_within_watermark_is_absorbed(spark, tmp_path):
    """Out-of-order arrival ACROSS micro-batches, lateness < watermark:
    the late row must merge into its session and the final streamed
    sessions equal the batch answer over the full input."""
    src = tmp_path / "src_a"
    on_time = [
        _ev(1, _mins(0), 1),
        _ev(2, _mins(10), 1),
        _ev(3, _mins(20), 1),
        _ev(4, _mins(0), 2),
    ]
    late = [
        _ev(5, _mins(5), 1),  # 15 min late vs max seen (00:20)
        _ev(6, _mins(120), 2),  # new session for u2
    ]
    sentinel = [_ev(999, T0 + timedelta(days=10), SENTINEL_USER)]
    _write_file(spark, on_time, src, "f1", 1, tmp_path)
    _write_file(spark, late, src, "f2", 2, tmp_path)
    _write_file(spark, sentinel, src, "f3", 3, tmp_path)

    got = _drain_sessions(spark, src, "4 hours", "wm_absorb")
    want = _batch_sessions(spark, on_time + late)
    assert got == want
    # and the late row really did merge: u1 has ONE 4-event session
    assert (1, int(T0.timestamp()), 4) in got


def test_beyond_watermark_dropped_after_eviction(spark, tmp_path):
    """The state-boundedness property: once the watermark passes a
    session's end the session is EVICTED and emitted exactly once, and a
    straggler arriving after that is dropped by the watermark filter
    (observable in numRowsDroppedByWatermark) instead of resurrecting
    state — so emitted results are final and the state store cannot grow
    with arbitrarily old keys. Arrival script (one file = one batch):

      b0  u1 @ 00:00           (opens session A = [00:00, 00:30))
      b1  u1 @ 10:00           -> wm for b2 becomes 09:30
      b2  u2 @ 10:01           eviction pass emits A (end 00:30 < wm)
      b3  u1 @ 00:05           straggler: state gone, ts << wm -> DROP
      b4  sentinel +10 days    flushes the 10:00/10:01 sessions

    Spark's contract is one-directional (within-watermark data is never
    dropped; beyond-watermark data MAY merge while its session is still
    live — test A exercises that), so the drop is only asserted in this
    state-already-evicted arrangement, where merging is impossible."""
    src = tmp_path / "src_b"
    _write_file(spark, [_ev(1, _mins(0), 1)], src, "f1", 1, tmp_path)
    _write_file(spark, [_ev(2, _mins(600), 1)], src, "f2", 2, tmp_path)
    _write_file(spark, [_ev(3, _mins(601), 2)], src, "f3", 3, tmp_path)
    _write_file(spark, [_ev(4, _mins(5), 1)], src, "f4", 4, tmp_path)
    _write_file(
        spark,
        [_ev(999, T0 + timedelta(days=10), SENTINEL_USER)],
        src,
        "f5",
        5,
        tmp_path,
    )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    sess = streaming_session_counts(
        stream, gap_secs=1800, watermark="30 minutes"
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("wm_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table("wm_drop").collect()
        if r["user_id"] != SENTINEL_USER
    }
    # the straggler is gone; everything else emitted exactly once
    assert got == {
        (1, int(T0.timestamp()), 1),
        (1, int(_mins(600).timestamp()), 1),
        (2, int(_mins(601).timestamp()), 1),
    }
    # and the drop shows up in the engine's own watermark accounting
    n_dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert n_dropped == 1


def test_late_rows_bucket_correctly_before_gapfill(spark, tmp_path):
    """Scrambled-event-time replay for the gapfill twin (VERDICT r09 item
    8, the stream_late_data_gate discipline applied to
    stream_resample_gapfill's design): hourly rollup rows arriving HOURS
    late — newest hours first, the oldest hour last, across micro-batch
    boundaries — must land in their correct hour buckets (append mode,
    watermark > worst lateness, sentinel flush), and the query-time
    dense-grid forward fill over that rollup must equal the batch twin
    exactly. The fill source for the gap hours IS a late-arriving row,
    so a mis-bucketed late row would corrupt the filled values, not just
    the observed ones."""
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import (
        gapfill_hourly,
    )

    def hr(h: float) -> datetime:
        return T0 + timedelta(hours=h)

    # user 1: hours 0, 1, 4 observed (gap at 2-3); user 2: hours 0, 2.
    rows_new = [  # arrive FIRST: the newest event times
        (1, hr(4.2), 1, "click", 4.0),
        (2, hr(2.5), 2, "click", 12.5),
    ]
    rows_late = [  # arrive SECOND: up to ~4 h late vs the frontier above
        (3, hr(0.1), 1, "click", 1.5),
        (4, hr(1.3), 1, "click", 1.0),
        (5, hr(1.8), 1, "click", 1.25),  # h1 sum 2.25 = the fill source
        (6, hr(0.7), 2, "click", 10.0),
    ]
    sentinel = [(7, datetime(2100, 1, 1), SENTINEL_USER, "click", 0.0)]
    src = tmp_path / "gapfill_late_src"
    _write_file(spark, rows_new, src, "f1", 1, tmp_path)
    _write_file(spark, rows_late, src, "f2", 2, tmp_path)
    _write_file(spark, sentinel, src, "f3", 3, tmp_path)

    def hourly_rollup(df):
        return (
            df.groupBy(
                F.window("ts", "3600 seconds").alias("w"), "user_id"
            )
            .agg(
                F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
                .cast("double")
                .alias("hv")
            )
            .select(
                "user_id",
                (F.unix_timestamp("w.start") / 3600).cast("bigint").alias("h"),
                "hv",
            )
        )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        hourly_rollup(stream.withWatermark("ts", "10 days"))
        .writeStream.format("memory")
        .queryName("gapfill_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rollup = (
        spark.table("gapfill_late")
        .filter(F.col("user_id") != SENTINEL_USER)
        .localCheckpoint(eager=True)
    )
    got = {
        (r["user_id"], r["hour"], r["value_filled"], r["is_gap"])
        for r in gapfill_hourly(rollup).collect()
    }

    batch = spark.createDataFrame(rows_new + rows_late, _SCHEMA)
    want = {
        (r["user_id"], r["hour"], r["value_filled"], r["is_gap"])
        for r in gapfill_hourly(
            hourly_rollup(batch).localCheckpoint(eager=True)
        ).collect()
    }
    assert got == want
    base_h = int(T0.timestamp()) // 3600
    # the gap hours are filled FROM the late-arriving hour-1 rows
    assert (1, base_h + 2, 2.25, True) in got
    assert (1, base_h + 3, 2.25, True) in got
    assert (2, base_h + 1, 10.0, True) in got
    assert (1, base_h + 4, 4.0, False) in got


def test_scrambled_replay_quantile_sketch_counters(spark, tmp_path):
    """Scrambled-event-time replay for stream_quantile_sketch (VERDICT
    r10 item 7): the 128 histogram counters are watermark-free
    complete-mode sums, so arbitrarily late rows must land in their
    value bins with ZERO watermark drops and the drained counters must
    equal the batch sketch bin-for-bin — arrival order (newest event
    times first, stragglers last, one file per micro-batch) must be
    invisible in the final state. Quantile interpolation over the
    drained counters then equals the batch fn_quantile_sketch numbers on
    the same rows by construction."""
    from pagerank_giraph_vs_mapreduce_spark.plans.function_queries import (
        QSK_BINS,
        QSK_LO,
        QSK_W,
    )

    def cells(df):
        return (
            df.select(
                F.least(
                    F.greatest(
                        F.floor((F.col("value") - QSK_LO) / QSK_W), F.lit(0)
                    ),
                    F.lit(QSK_BINS - 1),
                )
                .cast("bigint")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    # values chosen to hit low/mid/clamped-high bins; event times scrambled
    rows_new = [(i, _mins(100 + i), 1, "click", float(v)) for i, v in
                enumerate([500.0, 260.5, 4.0, 999.9])]
    rows_late = [(10 + i, _mins(i), 1, "click", float(v)) for i, v in
                 enumerate([-3.0, 4.0, 4.2, 130.0, 260.5, 511.9])]
    src = tmp_path / "qsk_src"
    _write_file(spark, rows_new, src, "f1", 1, tmp_path)
    _write_file(spark, rows_late, src, "f2", 2, tmp_path)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        cells(stream)
        .writeStream.format("memory")
        .queryName("qsk_replay")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["bin"], r["c"]) for r in spark.table("qsk_replay").collect()
    }
    want = {
        (r["bin"], r["c"])
        for r in cells(
            spark.createDataFrame(rows_new + rows_late, _SCHEMA)
        ).collect()
    }
    assert got == want
    n_dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert n_dropped == 0


def test_scrambled_replay_model_gate(spark, tmp_path):
    """Scrambled replay for stream_model_gate (VERDICT r10 item 7): the
    gate is a stateless per-row expression with batch-trained scalars
    inlined, so a document shard arriving out of order — or a straggler
    arriving after newer shards — must score and gate IDENTICALLY to
    the batch pass: same kept doc_ids, same 9-dp scores, no state rows
    at all (progress reports zero stateOperators)."""
    from pagerank_giraph_vs_mapreduce_spark.operators.mlfit import squash

    doc_schema = "doc_id bigint, text string, lang string"
    wb, wl, wsp, mean_p = -0.2, 0.9, -1.1, 0.45  # frozen trained scalars

    def gate(df):
        feats = df.filter(F.length("text") > 0).select(
            "doc_id",
            (F.length("text").cast("double") / F.lit(1000.0)).alias("f_len"),
            (
                (
                    F.length("text")
                    - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                ).cast("double")
                / F.length("text").cast("double")
            ).alias("f_space"),
        )
        z = F.lit(wb) + F.lit(wl) * F.col("f_len") + F.lit(wsp) * F.col("f_space")
        return (
            feats.select("doc_id", squash(z).alias("p"))
            .filter(F.round("p", 12) >= F.lit(mean_p))
            .select("doc_id", F.round("p", 9).alias("score"))
        )

    docs = [
        (i, ("word " * (20 * i + 5)).strip(), "en") for i in range(1, 10)
    ] + [(99, "", "en")]  # empty text filtered, never scored
    shard_new = [docs[i] for i in (5, 6, 7, 8, 9)]
    shard_late = [docs[i] for i in (0, 1, 2, 3, 4)]  # straggler shard

    def wf(rows, name, seq):
        staging = tmp_path / f"_dstage_{name}"
        spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = globmod.glob(str(staging / "part-*.parquet"))[0]
        d = tmp_path / "gate_src"
        d.mkdir(exist_ok=True)
        dest = d / f"{name}.parquet"
        shutil.copy(part, dest)
        t = 1_700_000_000 + seq * 60
        os.utime(dest, (t, t))
        shutil.rmtree(staging)

    wf(shard_new, "f1", 1)
    wf(shard_late, "f2", 2)
    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "gate_src"))
    )
    q = (
        gate(stream)
        .writeStream.format("memory")
        .queryName("gate_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["doc_id"], r["score"]) for r in spark.table("gate_replay").collect()}
    want = {
        (r["doc_id"], r["score"])
        for r in gate(spark.createDataFrame(docs, doc_schema)).collect()
    }
    assert got == want and got  # identical and non-empty
    assert all(not p["stateOperators"] for p in q.recentProgress)  # stateless
