"""Declared Structured Streaming queries with DuckDB oracles.

Each query runs a real streaming pipeline — file source, watermark,
stateful operator, memory sink — to completion with an availableNow
trigger, then returns the drained sink as a DataFrame. Because the
stream is driven to end-of-input, the result equals the batch-semantics
answer, so the batch SQL oracle gives the STREAMING surface the same
hard correctness signal as everything else (the pytest suite separately
exercises incremental/multi-batch behavior, late data, and state
eviction, which no batch oracle can express).

The reference has no streaming (SURVEY.md §2.9); this is the mandated
extension surface's driver-checkable slice.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.plans.registry import query
from pagerank_giraph_vs_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
)

_DSUM_VALUE = "CAST(round(sum(CAST(value AS DECIMAL(38,12))), 6) AS DOUBLE) AS sum_value"


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table (single parquet file selected by glob);
    ts normalization is schema-adaptive in read_events_stream."""
    return read_events_stream(spark, sf_dir, glob="events.parquet")


def _drain(stream: DataFrame, output_mode: str) -> DataFrame:
    """Run to end-of-input into a uniquely named memory sink; return it."""
    name = f"q{uuid.uuid4().hex[:12]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream.sparkSession.table(name)


def _dsum(col, alias):
    return F.round(F.sum(col.cast("decimal(38,12)")), 6).cast("double").alias(alias)


@query(
    "stream_tumbling_15m",
    oracle=f"""SELECT (epoch_us(ts) // 900000000) * 900 AS ws,
       event_type, count(*) AS n, {_DSUM_VALUE}
FROM events GROUP BY 1, 2""",
)
def stream_tumbling_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of win_tumbling_15m: watermarked tumbling-window
    aggregation driven to end-of-input (complete mode), checked against
    the same batch oracle — streaming and batch semantics must agree on
    a fully consumed source."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 hours")
        .groupBy(F.window("ts", "900 seconds").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), "sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("ws"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _drain(agg, "complete")


@query(
    "stream_session_30m",
    oracle="""WITH e AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
lagd AS (
  SELECT user_id, tu,
         CASE WHEN lag(tu) OVER w IS NULL
                   OR tu - lag(tu) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
sess AS (
  SELECT user_id, tu,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tu
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd)
SELECT user_id, min(tu) // 1000000 AS session_start, count(*) AS n_events
FROM sess GROUP BY user_id, sid""",
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (merging state store) driven to
    end-of-input; the oracle is the batch lag/cumsum session dance."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 hours")
        .groupBy("user_id", F.session_window("ts", "1800 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
        )
    )
    return _drain(agg, "complete")


@query(
    "stream_vocab_top20",
    oracle="""WITH toks AS (
  SELECT t.tok
  FROM documents, LATERAL unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(tok)
  WHERE t.tok != '')
SELECT tok, CAST(count(*) AS BIGINT) AS n_occ
FROM toks GROUP BY tok
ORDER BY n_occ DESC, tok LIMIT 20""",
)
def stream_vocab_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming wordcount — the canonical streaming aggregation — over
    the documents table as a file stream: running token counts in
    complete mode with an in-sink sort+limit, driven to end-of-input so
    the result equals the batch vocabulary (minus document frequency:
    distinct aggregates aren't available under incremental execution)."""
    docs = (
        spark.readStream.schema(
            spark.read.option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
            .schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.desc("n_occ"), "tok")
        .limit(20)
    )
    return _drain(counts, "complete")


def _gate_oracle() -> str:
    from pagerank_giraph_vs_mapreduce_spark.plans.text_queries import (
        LANG_CASES_SQL,
        LANG_GREATEST_SQL,
        LANG_SCORES_SQL,
        N_TOKENS_SQL,
        QUALITY_SQL,
    )

    return f"""WITH padded_docs AS (
  SELECT doc_id, text, concat(' ', text, ' ') AS padded FROM documents),
scored AS (
  SELECT doc_id, text,
{LANG_SCORES_SQL},
  greatest({LANG_GREATEST_SQL}) AS best
  FROM padded_docs),
sigs AS (
  SELECT doc_id,
    CASE WHEN best = 0 THEN 'unknown'
{LANG_CASES_SQL}
    ELSE 'unknown' END AS lang_pred,
    {QUALITY_SQL} AS quality,
    {N_TOKENS_SQL} AS n_tokens
  FROM scored)
SELECT doc_id, lang_pred, quality, n_tokens
FROM sigs WHERE lang_pred = 'en' AND quality >= 0.5"""


@query("stream_curation_gate", oracle=_gate_oracle())
def stream_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's stage-1/2 front-end (signal extraction +
    lang/quality gate, operators/curation.py) run INCREMENTALLY: the
    documents table arrives as a file stream and gated survivors append
    to the sink. The gate is pure per-row codegen'd expressions — no
    aggregate, no state store, no watermark needed — which is exactly
    why a 100 TB corpus can run this front-end continuously on arriving
    shards and only the (much smaller) survivor table ever reaches the
    batch dedup stages. Oracle: the same gate CTE chain the batch
    pipeline queries compose, over the full table."""
    from pagerank_giraph_vs_mapreduce_spark.operators.curation import (
        curation_signals,
    )

    docs = (
        spark.readStream.schema(
            spark.read.option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
            .schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    gated = curation_signals(docs, "doc_id", "text").filter(
        (F.col("lang_pred") == "en") & (F.col("quality") >= 0.5)
    )
    return _drain(
        gated.select("doc_id", "lang_pred", "quality", "n_tokens"), "append"
    )


@query(
    "stream_dedup_counts",
    oracle="""SELECT event_type, count(DISTINCT event_id) AS n
FROM events GROUP BY event_type""",
)
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on an intentionally duplicated source:
    the stream is unioned with itself (every event arrives twice, the
    at-least-once delivery shape), dropDuplicatesWithinWatermark keeps
    one row per event_id, and the drained sink is batch-aggregated per
    type. Oracle: distinct-event counts over the clean table."""
    ev = _events_stream(spark, sf_dir)
    doubled = ev.unionAll(_events_stream(spark, sf_dir))
    dedup = doubled.withWatermark("ts", "10 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    drained = _drain(dedup, "append")
    return drained.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "stream_enrich_features",
    oracle="""WITH feats AS (
  SELECT user_id,
         count(*) AS user_n_events,
         CAST(round(sum(CAST(value AS DECIMAL(38,12))), 6) AS DOUBLE)
           AS user_sum_value
  FROM events GROUP BY user_id)
SELECT e.event_id, e.user_id, e.event_type,
       f.user_n_events, f.user_sum_value
FROM events e JOIN feats f USING (user_id)""",
)
def stream_enrich_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join — the feature-lookup shape of an
    online training-data pipeline: events arrive as a stream and each row
    is joined to a precomputed per-user feature table (a static batch
    DataFrame). Unlike the stream-stream join there is NO state store —
    the static side is just (re)broadcast per micro-batch — so this scales
    with the dim table, not with stream history; stateless rows append.
    Oracle: the equivalent batch join."""
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events

    static_feats = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("user_n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,12)")), 6)
            .cast("double")
            .alias("user_sum_value"),
        )
    )
    ev = _events_stream(spark, sf_dir)
    enriched = ev.join(F.broadcast(static_feats), "user_id").select(
        "event_id", "user_id", "event_type", "user_n_events", "user_sum_value"
    )
    return _drain(enriched, "append")


# Late-arrival staging dirs, one per sf_dir, cleaned at exit (same
# discipline as plans/source_queries._staging_dir).
_LATE_STAGING: dict[str, str] = {}


def _late_arrival_src(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table as three arrival files in deliberately
    scrambled event-time order: f1 = rows in the BACK half of each hour
    (so the stream's max event time races ahead), f2 = the front-of-hour
    rows — every one of them now late by up to ~30 days relative to the
    watermark frontier — and f3 = one far-future sentinel row that
    pushes the final watermark past every real window so append mode
    flushes all state. mtimes force the file-source arrival order."""
    if sf_dir in _LATE_STAGING:
        return _LATE_STAGING[sf_dir]
    import atexit
    import glob as globmod
    import os
    import shutil
    import tempfile

    from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events

    out = tempfile.mkdtemp(prefix="late_events_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    ev = load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    minute = F.minute("ts")
    sentinel = ev.limit(1).select(
        F.lit(-1).cast(ev.schema["event_id"].dataType).alias("event_id"),
        F.lit("2100-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(-1).cast(ev.schema["user_id"].dataType).alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    parts = [
        ("f1", ev.filter(minute >= 30)),
        ("f2", ev.filter(minute < 30)),
        ("f3", sentinel),
    ]
    for i, (name, df) in enumerate(parts):
        stage = f"{out}/_stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(f"{stage}/part-*.parquet")[0]
        dest = f"{out}/{name}.parquet"
        shutil.copy(part, dest)
        t = 1_700_000_000 + i * 60
        os.utime(dest, (t, t))
        shutil.rmtree(stage)
    _LATE_STAGING[sf_dir] = out
    return out


@query(
    "stream_late_data_gate",
    oracle=f"""SELECT (epoch_us(ts) // 900000000) * 900 AS ws,
       event_type, count(*) AS n, {_DSUM_VALUE}
FROM events GROUP BY 1, 2""",
)
def stream_late_data_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark lateness accounting, driver-certified (VERDICT_r04 item
    8): the events table arrives as three micro-batches in SCRAMBLED
    event-time order (back-of-hour rows first, then every front-of-hour
    row — up to ~30 days late vs the watermark frontier — then a
    far-future sentinel), through an APPEND-mode tumbling aggregation
    whose watermark (45 days) exceeds the worst injected lateness. The
    contract certified: late-but-within-watermark rows are absorbed into
    their windows across micro-batch boundaries and append mode flushes
    every window exactly once when the sentinel advances the watermark —
    so the streamed result equals the batch oracle over the full input.
    Complete-mode twins (stream_tumbling_15m) can't see either property:
    they re-emit everything each batch. The eviction/drop side of the
    watermark contract is pinned by tests/test_watermark_lateness.py
    (engine behavior there is not batch-expressible, so it is pytest-,
    not oracle-, certified)."""
    src = _late_arrival_src(spark, sf_dir)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "45 days")
        .groupBy(F.window("ts", "900 seconds").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), "sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("ws"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    # drop the sentinel's own window (year 2100) from the result
    return _drain(agg, "append").filter(F.col("ws") < 3_000_000_000)


def _two_batch_events_src(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as two arrival files (event_id parity split, mtimes
    forcing order) so per-key state must carry across micro-batches."""
    key = f"stateful::{sf_dir}"
    if key in _LATE_STAGING:
        return _LATE_STAGING[key]
    import atexit
    import glob as globmod
    import os
    import shutil
    import tempfile

    from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events

    out = tempfile.mkdtemp(prefix="stateful_events_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "value")
    for i, half in enumerate(
        (ev.filter(F.col("event_id") % 2 == 0), ev.filter(F.col("event_id") % 2 == 1))
    ):
        stage = f"{out}/_stage_{i}"
        half.coalesce(1).write.mode("overwrite").parquet(stage)
        part = globmod.glob(f"{stage}/part-*.parquet")[0]
        dest = f"{out}/f{i}.parquet"
        shutil.copy(part, dest)
        t = 1_700_000_000 + i * 60
        os.utime(dest, (t, t))
        shutil.rmtree(stage)
    _LATE_STAGING[key] = out
    return out


@query(
    "stream_stateful_totals",
    oracle="""SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_micros
FROM events GROUP BY user_id""",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator, driver-certified: per-user
    running (count, sum) via applyInPandasWithState
    (streaming/stateful.py:stateful_user_totals_exact) over events
    arriving as TWO micro-batches (event_id parity split), so the typed
    per-key state tuple must survive the batch boundary. Append mode
    emits one running-total row per key per batch; the final totals are
    the max-n row per key (n_events is strictly increasing), which must
    equal the batch aggregate. The state accumulates integer micro-units
    (floor(v*1e6 + 0.5), pure IEEE-double arithmetic) so the total is
    exact and order-independent — the float-accumulator twin could never
    hash-match a SQL oracle."""
    from pagerank_giraph_vs_mapreduce_spark.streaming.stateful import (
        stateful_user_totals_exact,
    )

    src = _two_batch_events_src(spark, sf_dir)
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("user_id", "value")
    )
    drained = _drain(stateful_user_totals_exact(stream), "append")
    return drained.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_micros", "n_events").alias("total_micros"),
    )


@query(
    "stream_stream_join",
    oracle="""SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       CAST(epoch_us(c.ts) // 1000000 AS BIGINT) AS click_s,
       CAST(epoch_us(p.ts) // 1000000 AS BIGINT) AS purchase_s,
       p.value AS value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 3600 SECOND""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join driven to end-of-input
    (streaming/events_stream.py:streaming_click_purchase_join): each
    purchase joins clicks by the same user within the preceding hour.
    Both sides carry watermarks and the join condition time-bounds the
    buffered state, so a click older than watermark+horizon is evicted —
    the state-boundedness that makes the join run forever at 100 TB/day
    (state shards by user_id; without the time bound the buffer grows
    without limit). The batch oracle is the identical interval join; on
    a fully consumed source the two must agree row-for-row."""
    from pagerank_giraph_vs_mapreduce_spark.streaming.events_stream import (
        streaming_click_purchase_join,
    )

    ev = _events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = streaming_click_purchase_join(
        clicks, purchases, horizon_secs=3600
    )
    return _drain(joined, "append")


@query(
    "stream_cms_heavy_hitters",
    oracle="""WITH js(j) AS (VALUES (0), (1), (2)),
buckets AS (
  SELECT j,
    CAST(('0x' || substr(md5('cms' || j || ':' || CAST(user_id AS VARCHAR)), 1, 15))
         AS UBIGINT) % 256 AS b
  FROM events, js
)
SELECT j, b, count(*) AS c FROM buckets GROUP BY 1, 2""",
)
def stream_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch (fn_cms_heavy_hitters) built INCREMENTALLY
    by Structured Streaming: each micro-batch folds its events into the
    same 3x256 (row, bucket) cell counts — the sketch IS a streaming
    aggregate because CMS cells are counters (associative, commutative),
    which is the whole point of sketches at ingest time: the state store
    holds 768 rows forever, regardless of stream volume, and any batch's
    snapshot answers heavy-hitter queries. Driven to end-of-input, the
    cells equal the batch sketch exactly (md5-derived buckets, so the
    DuckDB oracle rebuilds them bit-for-bit)."""
    ev = _events_stream(spark, sf_dir)
    w = 256

    def bucket(j: int):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"cms{j}:"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % w
        )

    cells = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), bucket(j).alias("b"))
                        for j in range(3)
                    ]
                )
            ).alias("jb")
        )
        .select(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _drain(cells, "complete")


def _gapfill_oracle() -> str:
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import (
        GAPFILL_SQL,
    )

    return GAPFILL_SQL


@query("stream_resample_gapfill", oracle=_gapfill_oracle())
def stream_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of rel_resample_gapfill, built the way production
    time-series stores do it (the TimescaleDB continuous-aggregate
    design): the hourly rollup is a STREAMING aggregate — per-(user,
    hour) DECIMAL sums folded incrementally per micro-batch, state
    bounded by |active (user, hour) pairs|, order-free because decimal
    sums are associative/commutative — and the dense-grid + forward-fill
    finisher (temporal_queries.gapfill_hourly, shared code) runs at
    QUERY TIME over the rollup snapshot. Gap filling is deliberately NOT
    stream state: a gap is only defined relative to the span observed so
    far, so filling at ingest would emit rows a later out-of-order event
    retracts — the rollup is the stream's, the densification the
    reader's. Driven to end-of-input, the result equals the batch twin
    exactly (same oracle)."""
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import (
        HOUR_US,
        gapfill_hourly,
    )

    ev = _events_stream(spark, sf_dir)
    hourly = (
        ev.select(
            "user_id",
            F.expr(  # floor-div like DuckDB's //, exact for pre-epoch ts
                f"(unix_micros(ts) - pmod(unix_micros(ts), {HOUR_US})) DIV {HOUR_US}"
            ).alias("h"),
            F.round(F.col("value"), 6).cast("decimal(28,6)").alias("v"),
        )
        .groupBy("user_id", "h")
        .agg(F.sum("v").cast("double").alias("hv"))
    )
    # localCheckpoint: gapfill_hourly references the rollup TWICE (span
    # derivation + the grid join-back); the memory-sink view is not a
    # MultiInstanceRelation, so the self-join trips Spark's conflicting-
    # reference resolver — a LogicalRDD clones cleanly (and pins the
    # snapshot the finisher reads)
    return gapfill_hourly(
        _drain(hourly, "complete").localCheckpoint(eager=True)
    )


def _ohlc_oracle() -> str:
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import ORACLES
    from pagerank_giraph_vs_mapreduce_spark.plans import temporal_queries  # noqa: F401

    return ORACLES["rel_ohlc_candles"]


@query("stream_ohlc_candles", oracle=_ohlc_oracle())
def stream_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of rel_ohlc_candles: per-(user, hour) OHLC candles
    maintained as an incremental streaming aggregate — min_by/max_by
    over the (ts_us, event_id) struct, min/max extremes, count, DECIMAL
    volume sum, all associative/commutative merges, so state is bounded
    by |active (user, hour) pairs| and arrival order is irrelevant (the
    exact property a market-data rollup needs: a late tick updates its
    candle's open/close correctly because the struct ordering key is
    event time, not arrival time). Driven to end-of-input, equals the
    batch twin's oracle exactly."""
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import HOUR_US

    ev = _events_stream(spark, sf_dir)
    key = F.struct(F.col("ts_us"), F.col("event_id"))
    agg = (
        ev.select(
            "user_id",
            F.expr(  # floor-div like DuckDB's //, exact for pre-epoch ts
                f"(unix_micros(ts) - pmod(unix_micros(ts), {HOUR_US}))"
                f" DIV {HOUR_US}"
            ).alias("hour"),
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            "value",
        )
        .groupBy("user_id", "hour")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("vol_sum"),
        )
    )
    return _drain(agg, "complete")


def _scd2_enrich_oracle() -> str:
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import (
        BASE_US,
        DAY_US,
    )

    return f"""WITH users AS (SELECT DISTINCT user_id FROM events),
vers AS (
  SELECT user_id, {BASE_US} AS vf_us, 'bronze' AS tier FROM users
  UNION ALL
  SELECT user_id, {BASE_US} + (7 + user_id % 10) * {DAY_US}, 'silver'
  FROM users
  UNION ALL
  SELECT user_id, {BASE_US} + (17 + user_id % 11) * {DAY_US}, 'gold'
  FROM users),
dim AS (
  SELECT user_id, vf_us, tier,
         lead(vf_us) OVER (PARTITION BY user_id ORDER BY vf_us) AS vt_us
  FROM vers)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       d.tier AS right_tier, d.vf_us AS right_vf_us
FROM events e JOIN dim d
  ON e.user_id = d.user_id
 AND d.vf_us <= epoch_us(e.ts)
 AND (d.vt_us IS NULL OR epoch_us(e.ts) < d.vt_us)"""


@query("stream_scd2_enrich", oracle=_scd2_enrich_oracle())
def stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING dimension enrichment against SCD2 versioned rows — the
    stream-side dual of rel_asof_join (same deterministic 3-version tier
    dimension, same per-event answer): a stream cannot run the
    union+unbounded-window as-of, so the streaming form closes each
    version into a [valid_from, valid_to) interval batch-side
    (rel_scd2_history's lead() build) and enriches with a STATELESS
    stream-static broadcast join + interval predicate — each event
    matches exactly one version, so append mode emits once per event
    with zero state store. This is the 100 TB shape: the dim is
    broadcast (or shuffled-by-key when it outgrows broadcast), the
    stream never buffers. Oracle: the plain interval join in SQL."""
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import (
        BASE_US,
        DAY_US,
    )
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events
    from pyspark.sql import Window

    users = load_events(spark, sf_dir).select("user_id").distinct()

    def ver(vf, tier: str) -> DataFrame:
        return users.select(
            "user_id", vf.cast("long").alias("vf_us"), F.lit(tier).alias("tier")
        )

    vers = (
        ver(F.lit(BASE_US), "bronze")
        .unionByName(
            ver(
                F.lit(BASE_US)
                + (F.lit(7) + F.col("user_id") % 10) * F.lit(DAY_US),
                "silver",
            )
        )
        .unionByName(
            ver(
                F.lit(BASE_US)
                + (F.lit(17) + F.col("user_id") % 11) * F.lit(DAY_US),
                "gold",
            )
        )
    )
    w = Window.partitionBy("user_id").orderBy("vf_us")
    dim = vers.select(
        "user_id", "vf_us", "tier", F.lead("vf_us").over(w).alias("vt_us")
    )
    ev = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    joined = (
        ev.join(F.broadcast(dim), "user_id")
        .filter(
            (F.col("vf_us") <= F.col("ts_us"))
            & (F.col("vt_us").isNull() | (F.col("ts_us") < F.col("vt_us")))
        )
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.col("tier").alias("right_tier"),
            F.col("vf_us").alias("right_vf_us"),
        )
    )
    return _drain(joined, "append")


def _stream_model_gate_oracle() -> str:
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        _model_gate_oracle,
    )

    return _model_gate_oracle(3)


@query("stream_model_gate", oracle=_stream_model_gate_oracle())
def stream_model_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ML inference — the deployment half of the model-in-the-
    loop gate: the quality classifier trains BATCH-side (the exact
    pipeline_train_quality_lr trajectory, one tiny weight row + the
    corpus-mean threshold collected as four driver scalars — the model
    IS bytes at serving time), then the document stream is scored and
    gated by a pure codegen expression with those scalars inlined:
    stateless append mode, zero state store, no stream-side aggregate.
    This is how a trained gate runs on arriving crawl shards at 100 TB —
    training cost is one-off batch, serving cost is a per-row
    expression. Oracle: identical to pipeline_model_gate (end-of-input
    streaming equals batch semantics)."""
    from pagerank_giraph_vs_mapreduce_spark.operators.mlfit import (
        logreg_gd,
        squash,
    )
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table

    docs_b = load_table(spark, sf_dir, "documents")

    def feats_of(df: DataFrame) -> DataFrame:
        return df.filter(F.length("text") > 0).select(
            "doc_id",
            (F.length("text").cast("double") / F.lit(1000.0)).alias("f_len"),
            (
                (
                    F.length("text")
                    - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                ).cast("double")
                / F.length("text").cast("double")
            ).alias("f_space"),
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        )

    fb = feats_of(docs_b)
    w = logreg_gd(
        fb.select("f_len", "f_space", "y"), ["f_len", "f_space"], "y"
    ).select("w_bias", "w_f_len", "w_f_space")
    zb = (
        F.col("w_bias") * F.lit(1.0)
        + F.col("w_f_len") * F.col("f_len")
        + F.col("w_f_space") * F.col("f_space")
    )
    thr_row = (
        fb.crossJoin(F.broadcast(w))
        .select(squash(zb).alias("p"))
        .agg(
            F.round(
                F.sum(F.round("p", 12).cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                12,
            ).alias("mean_p")
        )
        .crossJoin(w)
        .collect()[0]
    )  # four bounded driver scalars: the serialized model
    wb, wl, wsp = (
        float(thr_row["w_bias"]),
        float(thr_row["w_f_len"]),
        float(thr_row["w_f_space"]),
    )
    mean_p = float(thr_row["mean_p"])

    docs_s = (
        spark.readStream.schema(
            spark.read.option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
            .schema
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    fs = feats_of(docs_s)
    zs = (
        F.lit(wb) * F.lit(1.0)
        + F.lit(wl) * F.col("f_len")
        + F.lit(wsp) * F.col("f_space")
    )
    gated = fs.select("doc_id", squash(zs).alias("p")).filter(
        F.round("p", 12) >= F.lit(mean_p)
    )
    return _drain(
        gated.select("doc_id", F.round("p", 9).alias("score")), "append"
    )


def _stream_qsketch_oracle() -> str:
    from pagerank_giraph_vs_mapreduce_spark.plans.function_queries import (
        _qsketch_oracle,
    )

    return _qsketch_oracle()


@query("stream_quantile_sketch", oracle=_stream_qsketch_oracle())
def stream_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn_quantile_sketch's 128 histogram counters maintained
    INCREMENTALLY by Structured Streaming — counters are associative
    sums, so the sketch IS a streaming aggregate with 128 state rows
    forever (the stream_cms_heavy_hitters argument applied to
    quantiles); the p50/p95/p99 interpolation runs query-time on the
    drained snapshot (the continuous-aggregate split:
    incremental-maintain cheap state, compute the final answer at read
    time). Driven to end-of-input the counters equal the batch sketch's,
    so the batch oracle holds verbatim."""
    from pagerank_giraph_vs_mapreduce_spark.plans.function_queries import (
        QSK_BINS,
        QSK_LO,
        QSK_QS,
        QSK_W,
    )

    ev = _events_stream(spark, sf_dir)
    cells = (
        ev.select(
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
    b = _drain(cells, "complete")

    from pyspark.sql import Window

    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_bef = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    n_df = b.agg(F.sum("c").alias("n"))
    cum = b.select(
        "bin",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.coalesce(F.sum("c").over(w_bef), F.lit(0)).alias("cum_before"),
    ).crossJoin(F.broadcast(n_df))
    qs = spark.createDataFrame([(q,) for q in QSK_QS], "q double")
    hit = (
        qs.join(cum, cum.cum >= F.ceil(F.col("q") * F.col("n")))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("q").orderBy("bin"))
        )
        .filter(F.col("rk") == 1)
    )
    return hit.select(
        "q",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            QSK_LO
            + (
                F.col("bin")
                + (F.ceil(F.col("q") * F.col("n")) - F.col("cum_before"))
                / F.col("c")
            )
            * QSK_W,
            6,
        ).alias("est"),
    )
