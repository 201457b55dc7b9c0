"""sf1-scale (10x) spot-run for the ROUND-9 newcomers — VERDICT r09 item 6.

Three claims, each with the measurement that would falsify it:

- g_ppr_multi_k3 (per-seed batched PPR): ONE edge pass per superstep for
  ALL seeds, state rows = sum of per-seed frontiers. Fixture: disjoint
  id-offset graph copies with the seed set replicated per copy (same
  seeds-per-edge ratio) — a linear plan shows ~factor x shuffle.
- rel_resample_gapfill: the dense grid is bounded by SPAN-HOURS, not
  |events|. Fixture: the same users/time-span with 1x/5x/10x the event
  rows (new event_ids, same timestamps) — grid/output rows must stay
  IDENTICAL while only the rollup's input grows.
- pipeline_train_quality_lr_mb: step t aggregates only md5 bucket
  t%B. The r10 first run of this tool FALSIFIED the physical form of
  that claim: cached-block reads don't count as task input records
  (mb and full-batch showed identical input), and the unclustered
  cache made every step SCAN all batches and filter — mb timed slower
  than full batch. Fix shipped in operators/mlfit.py
  (sortWithinPartitions on _bkt at cache time — shuffle-free bucket
  runs whose in-memory batch min/max stats prune ~(B-1)/B of cached
  batches per step; repartitionByRange prunes too but pays a corpus
  shuffle, measured strictly worse at iters=5); this row now records mb vs
  full-batch WALL at 10x docs as the physical evidence, alongside the
  linear 1x -> 10x scaling.

Iterative kernels materialize through localCheckpoint (no SQLMetrics on
the returned frame), so all measurements are CUMULATIVE stage-level
deltas from the AppStatusStore, as in tools/sf1_graph_spotrun.py.

Appends an '## sf1 spot-run: r9 newcomers' section to RUNTIME.md
(splice-in-place, keeping any later sections).

Usage: python tools/sf1_r9_spotrun.py [factor] [sf1_docs_dir]
Defaults: 10  /root/repo/.scratch/sf1
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def app_totals(spark) -> tuple[int, int, int]:
    """Cumulative (shuffle_bytes, shuffle_records, input_records) across
    ALL stages the app has run."""
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    it = stages.iterator()
    sb = sr = ir = 0
    while it.hasNext():
        s = it.next()
        sb += s.shuffleWriteBytes()
        sr += s.shuffleWriteRecords()
        ir += s.inputRecords()
    return sb, sr, ir


def run_measured(spark, fn) -> dict:
    b0, r0, i0 = app_totals(spark)
    t0 = time.monotonic()
    rows = fn()
    sec = time.monotonic() - t0
    b1, r1, i1 = app_totals(spark)
    spark.catalog.clearCache()
    return {
        "rows": rows,
        "sec": round(sec, 1),
        "shuffle_records": r1 - r0,
        "shuffle_mb": round((b1 - b0) / 1e6, 3),
        "input_records": i1 - i0,
    }


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf1_docs = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    half = factor // 2
    spark = get_spark(cpus="8", shuffle_partitions=32)

    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import (
        personalized_pagerank_multi,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.graph_queries import (
        PPR_SOURCES,
        _graph_parts,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        MB_BUCKETS,
        MB_ITERS,
        MB_L2,
        MB_LR,
        pipeline_train_quality_lr_mb,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import (
        HOUR_US,
        gapfill_hourly,
    )
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events

    lines = [
        "",
        "## sf1 spot-run: r9 newcomers (tools/sf1_r9_spotrun.py)",
        "",
        "Stage-level cumulative deltas (AppStatusStore; cached-block reads",
        "do NOT count as input). Each row names the claim it verifies —",
        "see the tool docstring for the falsification logic.",
        "",
        f"| entry | rows x1/x{half}/x{factor}"
        f" | shuffle records x1/x{half}/x{factor} (f{half}->f{factor})"
        f" | input records x1/x{half}/x{factor}"
        f" | sec x1/x{half}/x{factor} |",
        "|---|---|---|---|---|",
    ]

    # ---- g_ppr_multi_k3: disjoint graph copies, seeds per copy
    _, edges1, _, _ = _graph_parts(spark, BASE)

    def replicate(e, f: int):
        out = e
        for i in range(1, f):
            out = out.unionAll(
                e.select(
                    (F.col("src") + STRIDE * i).alias("src"),
                    (F.col("dst") + STRIDE * i).alias("dst"),
                )
            )
        return out

    def ppr_run(f: int) -> int:
        seeds = [s + STRIDE * i for i in range(f) for s in PPR_SOURCES]
        return personalized_pagerank_multi(
            replicate(edges1, f), seeds=seeds, k=3
        ).count()

    # ---- rel_resample_gapfill: same span, f x the event rows
    ev1 = load_events(spark, BASE).select("user_id", "ts_us", "value")

    def gapfill_run(f: int) -> int:
        ev = ev1
        for i in range(1, f):
            # same users, same timestamps (span unchanged); values jittered
            # deterministically so the sums differ but the shape doesn't
            ev = ev.unionAll(
                ev1.select(
                    "user_id", "ts_us", (F.col("value") + i * 0.25).alias("value")
                )
            )
        hourly = (
            ev.select(
                "user_id",
                F.expr(
                    f"(ts_us - pmod(ts_us, {HOUR_US})) DIV {HOUR_US}"
                ).alias("h"),
                F.round(F.col("value"), 6).cast("decimal(28,6)").alias("v"),
            )
            .groupBy("user_id", "h")
            .agg(F.sum("v").cast("double").alias("hv"))
        )
        return gapfill_hourly(hourly).count()

    # ---- pipeline_train_quality_lr_mb: 1x vs 10x documents; also the
    # full-batch trainer at 10x for the per-step 1/B comparison
    def mb_run(sf_dir: str) -> int:
        return pipeline_train_quality_lr_mb(spark, sf_dir).count()

    def full_run(sf_dir: str) -> int:
        from pagerank_giraph_vs_mapreduce_spark.operators.mlfit import logreg_gd
        from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        feats = docs.filter(F.length("text") > 0).select(
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
        return logreg_gd(
            feats, ["f_len", "f_space"], "y", iters=MB_ITERS, lr=MB_LR, l2=MB_L2
        ).count()

    def fmt(name: str, ms: list[dict]):
        def ratio(a, b):
            return f"{b / a:.2f}x" if a else "n/a"

        lines.append(
            f"| {name} "
            f"| {' / '.join(str(m['rows']) for m in ms)} "
            f"| {' / '.join(str(m['shuffle_records']) for m in ms)} "
            f"({ratio(ms[-2]['shuffle_records'], ms[-1]['shuffle_records'])}) "
            f"| {' / '.join(str(m['input_records']) for m in ms)} "
            f"| {' / '.join(str(m['sec']) for m in ms)} |"
        )
        print("measured", name, ms, flush=True)

    fmt(
        "g_ppr_multi_k3 (seeds x copies)",
        [run_measured(spark, lambda f=f: ppr_run(f)) for f in (1, half, factor)],
    )
    fmt(
        "rel_resample_gapfill (same span, f x events)",
        [
            run_measured(spark, lambda f=f: gapfill_run(f))
            for f in (1, half, factor)
        ],
    )
    mbs = [
        run_measured(spark, lambda d=d: mb_run(d))
        for d in (BASE, sf1_docs)
    ]
    fullx10 = run_measured(spark, lambda: full_run(sf1_docs))
    lines.append(
        f"| pipeline_train_quality_lr_mb (docs x1/x{factor}) "
        f"| {mbs[0]['rows']} / {mbs[1]['rows']} "
        f"| {mbs[0]['shuffle_records']} / {mbs[1]['shuffle_records']} "
        f"| {mbs[0]['input_records']} / {mbs[1]['input_records']} "
        f"(= full-batch x{factor}: {fullx10['input_records']} — cached-block"
        f" reads are invisible to input metrics) "
        f"| {mbs[0]['sec']} / {mbs[1]['sec']} (full x{factor}:"
        f" {fullx10['sec']}; at 200k rows fixed per-job overhead"
        f" dominates — see the layout row below for the scan effect) |"
    )
    print("measured mb", mbs, "full", fullx10, flush=True)

    # ---- the cache-layout evidence at a scale where scans dominate:
    # 5 GD-shaped filtered DECIMAL aggs over a 2M-row cache, unclustered
    # vs sortWithinPartitions("_bkt") (the layout logreg_gd now applies)
    def layout_steps(sort: bool) -> float:
        d = spark.range(2_000_000).select(
            (F.abs(F.xxhash64("id")) % MB_BUCKETS).alias("_bkt"),
            (F.col("id") * 1.5).alias("x"),
        )
        if sort:
            d = d.sortWithinPartitions("_bkt")
        c = d.persist()
        c.count()
        t0 = time.monotonic()
        for t in range(MB_ITERS):
            c.filter(F.col("_bkt") == t % MB_BUCKETS).agg(
                F.sum(F.round(F.col("x"), 12).cast("decimal(38,12)"))
            ).collect()
        sec = round(time.monotonic() - t0, 2)
        c.unpersist()
        spark.catalog.clearCache()
        return sec

    layout_steps(True)  # JIT/codegen warmup so the A/B is order-free
    plain = layout_steps(False)
    sorted_ = layout_steps(True)
    lines.append(
        f"| mb cache layout (2M rows, {MB_ITERS} filtered-agg steps) "
        f"| n/a | n/a | n/a "
        f"| unclustered {plain} vs sortWithinPartitions(_bkt) {sorted_}"
        f" ({plain / sorted_:.2f}x; memory-resident batches scan near"
        f" memory speed so the win is modest HERE — the layout's real"
        f" payoff is the MEMORY_AND_DISK spill regime, where pruned"
        f" batches are disk reads skipped entirely; the local sort is"
        f" shuffle-free, so it is a strict win either way —"
        f" operators/mlfit.py) |"
    )
    print("measured layout", plain, sorted_, flush=True)

    # splice out ONLY a prior section of the same name (up to the next
    # "\n## " heading), keeping anything after it
    with open("/root/repo/RUNTIME.md") as fh:
        doc = fh.read()
    marker = "\n## sf1 spot-run: r9 newcomers"
    if marker in doc:
        start = doc.index(marker)
        nxt = doc.find("\n## ", start + len(marker))
        tail = doc[nxt:] if nxt != -1 else ""
        doc = doc[:start] + tail
    with open("/root/repo/RUNTIME.md", "w") as fh:
        fh.write(doc + "\n".join(lines) + "\n")
    print("wrote RUNTIME.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
