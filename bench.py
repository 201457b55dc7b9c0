"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, ...}

Comparable structure vs BASELINE.md: per-iteration PageRank cost must stay
flat and memory-resident (Giraph-shaped ~17s/superstep on 69M edges /
6 nodes), not per-iteration-job-shaped (MR ~131s). We report
pagerank_sec_per_iter explicitly for that comparison.

Variance notes (round-over-round comparability):
- Entries share one JVM; caches are cleared and a GC runs between entries
  (see timed()), leaving ~±10-20% residual cross-talk on sub-second
  entries and first-use JIT/broadcast warmup on whichever entry touches a
  code path first. Solo mode (`python bench.py <entry> ...`) in a fresh
  session is the arbiter for any regression inside that band; warm
  steady-state (2nd+ repetition in one session) is the plan-cost signal.
- The driver regenerates /root/testdata between rounds (r3: events.ts
  changed INT64-nanos -> TIMESTAMP(MICROS); table contents reshuffled), so
  entries reading testdata are only comparable across rounds to ~±20%;
  the synthetic-graph entries (pagerank_s1scale/s3scale/skewed/triangle/
  two_hop) are generation-independent and comparable directly.
- The VM itself is re-provisioned between rounds and per-core throughput
  is NOT constant across provisions: the r02->r03 +20-60% "drift" on 6
  entries was bisected in round 4 to the host, not the plans — the
  identical r02 tree, file-free synthetic input included, runs 1.9-2.3×
  slower on the r04 host (SCALING.md §9). Before attributing a
  cross-round delta to a plan change, A/B the previous round's tree in
  a scratch worktree in the SAME session (solo mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402


S3_V, S3_E = 4_847_571, 68_993_773  # soc-LiveJournal1 shape (README.md:116-120)


def _synth_powerlaw(spark, n_v: int, n_e: int, seed: int = 1):
    """Deterministic web-graph-shaped synthetic edges (module-level so the
    __s3solo__ subprocess mode shares the exact generator the suite uses)."""
    from pyspark.sql import functions as F

    e = spark.range(n_e)
    return e.select(
        (F.abs(F.xxhash64(F.col("id"), F.lit(seed))) % n_v).alias("src"),
        # u in (0, 1]: clamp so u == 1.0 maps to n_v - 1, not n_v.
        F.least(
            F.lit(n_v - 1),
            F.floor(
                n_v
                * F.pow(
                    (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))) % 1_000_000 + 1)
                    / 1_000_000.0,
                    F.lit(2.5),
                )
            ),
        )
        .cast("long")
        .alias("dst"),
    )


def _s3solo() -> int:
    """Fresh-process S3 kernel run: 5 forced supersteps, one JSON line out.

    The headline cross-round metric is the MEDIAN of >=3 of these (each a
    fresh JVM), because the in-suite number shares a JVM with 130 other
    entries and this host's run-to-run spread (3.35-6.16 s observed on an
    identical tree, SCALING.md §24) exceeds any plausible plan regression —
    VERDICT r08 item 2 makes the adjudication mechanical instead."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench-s3solo", cpus=cpus)
    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank

    spark.range(1000).count()  # JVM warmup outside the kernel
    res = pagerank(
        _synth_powerlaw(spark, S3_V, S3_E), max_iter=5, tol=-1.0, min_iter=0
    )
    secs = [h.seconds for h in res.history]
    print(
        json.dumps(
            {
                "s3_iter_median_sec": round(sorted(secs)[len(secs) // 2], 3),
                "s3_iter_secs": [round(s, 3) for s in secs],
                "s3_build_sec": round(res.build_seconds, 3),
            }
        )
    )
    return 0


def _s3_solo_median(n_runs: int = 5) -> dict:
    """Spawn n_runs fresh-JVM S3 kernel runs; return {median, runs[]}.

    r12 protocol tightening (VERDICT r11 item 7): the FIRST run is a
    DISCARDED warmup — it alone pays cold page-cache/JIT for the whole
    ladder (r11 spread [2.662..5.067] with the first run at 1.7x the
    median), so n_runs+1 subprocesses run and the first result is
    reported separately as `pagerank_s3_solo_discarded_warmup_sec`,
    never in the median."""
    import subprocess

    me = os.path.abspath(__file__)
    medians: list[float] = []
    builds: list[float] = []
    first_run_succeeded = False
    for i in range(n_runs + 1):
        try:
            out = subprocess.run(
                [sys.executable, me, "__s3solo__"],
                capture_output=True,
                text=True,
                timeout=900,
                check=True,
            ).stdout
            row = json.loads(out.strip().splitlines()[-1])
            medians.append(float(row["s3_iter_median_sec"]))
            builds.append(float(row["s3_build_sec"]))
            if i == 0:
                first_run_succeeded = True
        except (subprocess.SubprocessError, ValueError, KeyError, IndexError) as e:
            print(f"warning: s3 solo run failed: {e}", file=sys.stderr)
    if not medians:
        return {}
    warmup = None
    # Discard-first: the cold-ladder warmup. Only when run index 0
    # actually produced a result — if the cold run FAILED, the first
    # successful run is a valid warm measurement and must stay in the
    # median set (it already paid the ladder's cold cost implicitly).
    if first_run_succeeded and len(medians) > 1:
        warmup, medians = medians[0], medians[1:]
        builds = builds[1:]
    out = {
        "pagerank_s3_solo_median_sec": sorted(medians)[len(medians) // 2],
        "pagerank_s3_solo_runs_sec": medians,
        "pagerank_s3_solo_build_secs": builds,
    }
    if warmup is not None:
        out["pagerank_s3_solo_discarded_warmup_sec"] = warmup
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    only = set(sys.argv[1:])

    # Low-core-count budget mode (VERDICT r13 item 2a): the driver re-runs
    # this bench at $SPARK_GRAFT_CPUS=8 to measure scaling, and r13's suite
    # had grown past that run's wall budget (BENCH_r13_c8 rc=124, empty
    # scaling block). At <=8 cores the full suite cannot finish, so:
    # (a) entries whose PRIOR main-run time exceeds 30 s are skipped up
    #     front (deterministic, recorded in `skipped_low_cpu` — scaling
    #     ratios come from the many light entries);
    # (b) a wall budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default 900 s at
    #     low cpus, unlimited otherwise) skips whatever remains once
    #     exceeded (recorded in `budget_skipped`);
    # (c) the fresh-JVM solo ladder and the cross-round arbitration
    #     re-runs are 32-core-referenced measurements — meaningless and
    #     expensive at 8 cores — and are skipped there.
    # Explicitly requested entries (`python bench.py <name>`) always run.
    # At the main core count with no env set, nothing changes.
    n_cpus = int(cpus) if str(cpus).isdigit() else 32
    low_cpu = n_cpus <= 8
    _budget_env = os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC")
    budget_sec = (
        float(_budget_env) if _budget_env else (900.0 if low_cpu else 0.0)
    )
    _here = os.path.dirname(os.path.abspath(__file__))
    prior_main_times: dict = {}
    try:
        with open(os.path.join(_here, "BENCH_full.json")) as _f:
            prior_main_times = json.load(_f).get("queries", {}) or {}
    except (OSError, ValueError):
        prior_main_times = {}
    HEAVY_SKIP_SEC = 30.0
    skipped_low_cpu: list[str] = []
    budget_skipped: list[str] = []
    suite_t0 = time.monotonic()

    # Machine-decidable headline (VERDICT r08 item 2): median of 5
    # fresh-JVM solo S3 kernel runs (3 -> 5 in r10, VERDICT r09 item 5:
    # at n=3 the observed [3.39, 3.91, 6.01] spread let one outlier move
    # the median 15%; n=5 keeps the median stable under one outlier).
    # MUST run BEFORE the suite's JVM exists — with the 16 GB suite
    # session alive, the subprocesses contend for memory/cores and read
    # ~2x slower (measured 7.5 s vs 3.8 s median on an identical tree).
    # Skippable for quick local iterations with SPARK_GRAFT_NO_SOLO=1.
    solo_extras: dict = {}
    if (
        (not only or "pagerank_s3_solo_median" in only)
        and not os.environ.get("SPARK_GRAFT_NO_SOLO")
        and ("pagerank_s3_solo_median" in only or not low_cpu)
    ):
        solo_extras = _s3_solo_median(n_runs=5)

    spark = get_spark(app_name="bench", cpus=cpus)

    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank, top_k
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import derived_edges

    load_all_queries()

    # Warm the JVM/session outside timed regions.
    spark.range(1000).count()

    def host_calibration() -> dict:
        """Two fixed microbenchmarks that price THIS host's Python and JVM
        throughput, recorded with every suite run. The VM is
        re-provisioned between rounds with 2x per-core spread (SCALING.md
        §9), and r09 measured the two substrates drifting in OPPOSITE
        directions (JVM entries -20%, Python-codec entries +40% on one
        provision) — so cross-round per-query deltas should be read
        against these two scalars, not a single host factor."""
        t0 = time.monotonic()
        acc = 0
        for i in range(10_000_000):  # pure-Python integer loop (~1.2 s)
            acc += i * 7 % 31
        py_sec = time.monotonic() - t0
        t0 = time.monotonic()
        spark.range(500_000_000).selectExpr("sum(id % 97)").collect()
        jvm_sec = time.monotonic() - t0
        # Disk probe (VERDICT r13 item 8): sequential write + fsync of
        # 256 MB to local tmp — the CPU probes above are blind to the
        # disk contention that shuffle/spill-heavy entries stall on, so
        # shuffle-bound regressions could hide behind (or be manufactured
        # by) "CPU probes were fine". Reporting-only, like the others.
        import tempfile as _tf

        t0 = time.monotonic()
        buf = b"\0" * (8 << 20)
        with _tf.NamedTemporaryFile(dir="/tmp") as f:
            for _ in range(32):
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
        disk_sec = time.monotonic() - t0
        return {
            "host_python_loop_sec": round(py_sec, 3),
            "host_jvm_agg_sec": round(jvm_sec, 3),
            "host_disk_write_sec": round(disk_sec, 3),
        }

    timings: dict[str, float] = {}
    extras: dict[str, float] = dict(solo_extras)
    if not only or "host_calibration" in only:
        extras.update(host_calibration())
    # Solo mode: `python bench.py <entry> [...]` runs only the named
    # entries in a fresh session — the arbiter for in-suite regressions
    # within the shared-JVM cross-talk band (see timed()).

    entry_fns: dict = {}  # name -> thunk, for end-of-suite warm arbitration

    def timed(name: str, fn) -> None:
        if only and name not in only:
            return
        if not only:
            # budget mode (see header): deterministic heavy-skip first,
            # then the wall-budget guard; explicit requests bypass both.
            if low_cpu and prior_main_times.get(name, 0.0) > HEAVY_SKIP_SEC:
                skipped_low_cpu.append(name)
                return
            if budget_sec and time.monotonic() - suite_t0 > budget_sec:
                budget_skipped.append(name)
                return
        entry_fns[name] = fn
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)
        # Isolate entries: leftover cached tables from one entry otherwise
        # squeeze the next one's working set (measured: +2-3x variance on
        # the iterative kernels when prior runs' caches linger), and a JVM
        # GC between entries keeps one entry's garbage from inflating the
        # next entry's pauses. Residual cross-talk is ~±10% on sub-second
        # entries (suite shares one JVM); solo re-runs are the arbiter for
        # any regression within that band.
        spark.catalog.clearCache()
        # Python GC first: py4j holds JVM-side references (cached plans,
        # localCheckpoint RDDs) alive until their Python wrappers are
        # collected; only then can the JVM GC + ContextCleaner release the
        # blocks the next entry would otherwise compete with.
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def _next_round() -> int:
        """The round this bench run will be recorded as: the driver writes
        BENCH_r{N}.json per round, so N = max committed + 1. A re-run
        AFTER the round's own BENCH_r{N}.json lands would flip the guard
        parity — pin with SPARK_GRAFT_ROUND=N in that case."""
        if os.environ.get("SPARK_GRAFT_ROUND"):
            return int(os.environ["SPARK_GRAFT_ROUND"])
        import glob as _glob
        import re as _re

        here = os.path.dirname(os.path.abspath(__file__))
        rs = [
            int(m.group(1))
            for f in _glob.glob(os.path.join(here, "BENCH_r*.json"))
            for m in [_re.search(r"BENCH_r(\d+)\.json$", f)]
            if m
        ]
        return max(rs, default=0) + 1

    # Rotating-tier guards (VERDICT r09 item 7): fixed-cost A/B regression
    # probes (~10-30 s each) whose answer moves only when the kernel under
    # them changes — they don't need to re-pay their cost EVERY round as
    # the suite surface grows. Each runs on alternating rounds (staggered
    # parity so every round still carries a guard) and ALWAYS on explicit
    # request (`python bench.py <name>`). A skipped guard is simply absent
    # from that round's fresh full-suite artifact — visible as such, and
    # measured again next round.
    def timed_rotating(name: str, fn, parity: int) -> None:
        if only:
            timed(name, fn)  # timed() itself filters on membership in only
        elif _next_round() % 2 == parity:
            timed(name, fn)

    # Sibling-pair rotation (VERDICT r09 item 7 extended): A/B variants of
    # the SAME kernel alternate rounds — the kernel itself is still timed
    # every round through its sibling, correctness still gates every round
    # via pytest + the oracle sweep, and any entry runs on explicit request.
    # parity 0 = even rounds, 1 = odd rounds; entries absent from a round's
    # artifact are visibly absent, never silently carried forward.
    ROTATE_PARITY = {
        # peel kernel: fixed-round vs convergence mode (parities swapped
        # in r12 so the round that shipped the shuffle-merge adjacency
        # pin also ships the entry's post-fix number)
        "g_ktruss4_r3": 0, "g_ktruss4_conv": 1,
        # modularity family (g_louvain_r2 runs every round as the base)
        "g_louvain_l2": 0, "g_louvain_w_r2": 1, "g_modularity_score": 1,
        # sampled-betweenness +- normalization
        "g_betweenness_k3": 0, "g_betweenness_k3_norm": 1,
        # frontier kernels: weighted SSSP vs eccentricity aggregate
        "g_sssp_k4": 0, "g_diameter_lb_k4": 1,
        # same JPEG fixture, baseline vs progressive scan script
        "mm_jpeg_decode": 0, "mm_jpeg_progressive_decode": 1,
        # BPE: batched vs classic merge loop (same algorithm A/B)
        "text_bpe_merges_k64": 0, "text_bpe_merges_k64_batched": 1,
        # warm-start A/B against the always-on pagerank ladder
        "g_pagerank_incremental": 1,
        # frozen pure-Python VP8L decoder: fixed-cost, moves only with webp.py
        "mm_webp_decode": 1,
        # GIF: first-frame decode vs all-frames
        "mm_gif_decode": 0, "mm_gif_frames": 1,
        # nearest-resize: raw vs through-JPEG
        "mm_resize": 0, "mm_resize_jpeg": 1,
        # exact medians: global vs grouped
        "rel_exact_quantiles": 0, "rel_exact_quantiles_grouped": 1,
        # gapfill: locf vs lerp fill over the same grid
        "rel_resample_gapfill": 0, "rel_resample_lerp": 1,
        # corpus composition demo (its stages all have always-on entries)
        "pipeline_corpus_build": 0,
        # retrieve runs every round; the MMR rerank loop alternates
        "pipeline_rag_mmr": 0,
        # semantic dedup: k16 vs k64 codebook
        "dedup_semantic": 0, "dedup_semantic_k64": 1,
        # PPR: single-seed (always) vs batched multi-seed
        "g_ppr_multi_k3": 0,
        # fixed-cost synthetic pagerank demo (the s1-s3 ladder is always on)
        "pagerank_large_3iter": 1,
        # decontaminate runs every round; the split-hygiene twin alternates
        "pipeline_split_leakage_safe": 1,
        # n-gram family: vocab/bigrams always on
        "text_repeated_ngrams": 1,
        # multilevel partition family (r13 budget rebalance, VERDICT r12
        # item 5): k4 — the second-heaviest suite entry at 43.7 s in r12
        # — re-runs the whole bisection machinery twice over the SAME
        # fixture k2 coarsens, so the two now alternate: even rounds
        # price k2 + V-cycle + k2 cut stats, odd rounds price refined +
        # k4 + k4 cut stats. Every kernel is still priced every other
        # round; correctness still gates every round via the oracle
        # sweep.
        "g_partition_k2": 0, "g_partition_k2_refined": 1,
        "g_partition_k2_vcycle": 0,
        "g_partition_cut_stats": 0,
        "g_partition_k4": 1,
        # k4_cut_stats re-runs the whole k4 bisection machinery (its
        # result memo was removed in r13 as a compliance fix), so with
        # both on parity 1 an odd round paid TWO full bisections. Moved
        # opposite k4 (VERDICT r13 item 7): each round now prices exactly
        # one bisection — odd rounds via k4, even rounds via cut_stats.
        # Bench-budget change only; both remain oracle-gated every round
        # and run on explicit request.
        "g_partition_k4_cut_stats": 0,
        # incremental maintenance: the warm-delete twin alternates with
        # the warm-add twin (g_pagerank_incremental, parity 1); the
        # streaming WCC loop's cost is its own surface — odd rounds
        "g_pagerank_warm_delta": 0,
        "g_wcc_delta_stream": 1,
        # degree Gini: the binned default runs every round; exact rotates
        "g_degree_gini_exact": 1,
    }

    def timed_query(name: str, fn) -> None:
        if name in ROTATE_PARITY:
            timed_rotating(name, fn, ROTATE_PARITY[name])
        else:
            timed(name, fn)

    # Memory-ceiling probes (SCALING.md §23): multi-minute one-off graph
    # builds that are NOT part of the default suite — they run only when
    # named explicitly (`python bench.py pagerank_s5scale_5iter`). Results
    # persist under BENCH_full.json["probes"]; per-round suite runs carry
    # the stored probe rows forward instead of re-paying the build.
    probes: dict[str, dict] = {}

    def timed_probe(name: str, fn) -> None:
        if name not in only:
            return
        cur: dict = {}
        t0 = time.monotonic()
        fn(cur)
        cur["sec"] = round(time.monotonic() - t0, 3)
        probes[name] = cur
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def cache_residency() -> tuple[int, int]:
        # (memory bytes, disk bytes) across all currently cached blocks —
        # disk > 0 means the MEMORY_AND_DISK links cache spilled past the
        # storage pool, the regime the s5 probe exists to measure.
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return (
            int(sum(i.memSize() for i in infos)),
            int(sum(i.diskSize() for i in infos)),
        )

    def run_query(name: str):
        return lambda: QUERIES[name](spark, sf_dir).count()

    def run_query_rows(name: str):
        # Same as run_query but records the row count as an extra, so
        # round-over-round drift on these entries is attributable (a row
        # count change means the regenerated testdata moved, not the plan).
        def fn() -> None:
            extras[f"{name}_rows"] = QUERIES[name](spark, sf_dir).count()

        return fn

    def run_pagerank() -> None:
        res = pagerank(
            derived_edges(spark, sf_dir),
            damping=0.85,
            max_iter=100,
            tol=1e-8,
            min_iter=5,
        )
        top_k(res.ranks, 50).collect()
        extras["pagerank_iterations"] = res.iterations
        iter_secs = [h.seconds for h in res.history]
        extras["pagerank_sec_per_iter"] = round(sum(iter_secs) / len(iter_secs), 3)

    def run_pagerank_skewed() -> None:
        """Hub-vertex stress (README.md:417-418 pathology): 10 source hubs
        each with ~|lineitem|/10 out-edges, 20 hot gather keys — the
        scatter join and gather agg both skew; AQE skew-join + map-side
        partial aggregation must keep per-iteration time near the uniform
        graph's."""
        from pyspark.sql import functions as F

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        skewed = li.select(
            (F.col("l_suppkey") % 10).alias("src"),
            (F.col("l_partkey") % 20).alias("dst"),
        )
        res = pagerank(skewed, max_iter=3, tol=-1.0, min_iter=0)
        res.ranks.count()
        extras["pagerank_skew_sec_per_iter"] = round(
            sum(h.seconds for h in res.history) / len(res.history), 3
        )
        # same graph with the hub sources routed through the broadcast
        # scatter (scatter_gather hub_ids) — the explicit skew fix, since
        # AQE cannot split the cached links join (test_skew_scatter.py)
        res2 = pagerank(
            skewed, max_iter=3, tol=-1.0, min_iter=0, hub_split_outdeg=1000
        )
        res2.ranks.count()
        extras["pagerank_skew_split_sec_per_iter"] = round(
            sum(h.seconds for h in res2.history) / len(res2.history), 3
        )

    def large_graph():
        """~200k vertices / ~2.4M edges synthesized from 4 shifted copies of
        lineitem pairs (the derived sf0.1 graph has only 1500 vertices —
        too small to exercise the V-row shuffle)."""
        from pyspark.sql import functions as F

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        copies = []
        for s in range(4):
            copies.append(
                li.select(
                    ((F.col("l_orderkey") * 7 + F.col("l_linenumber") + s * 49999) % 200000).alias("src"),
                    ((F.col("l_partkey") * 31 + F.col("l_suppkey") + s * 31337) % 200000).alias("dst"),
                )
            )
        edges = copies[0]
        for c in copies[1:]:
            edges = edges.unionAll(c)
        return edges

    def run_pagerank_large() -> None:
        """Kernel scaling proxy: 3 fixed supersteps on the 200k-vertex
        graph; records sec/iter."""
        res = pagerank(large_graph(), max_iter=3, tol=-1.0, min_iter=0)
        extras["pagerank_large_n_vertices"] = res.n_vertices
        extras["pagerank_large_sec_per_iter"] = round(
            sum(h.seconds for h in res.history) / len(res.history), 3
        )

    def run_pagerank_flatness() -> None:
        """15 forced supersteps on the derived graph; first-vs-last
        iteration ratio certifies flat per-superstep cost (the
        Giraph-shape claim — lineage truncation working)."""
        res = pagerank(derived_edges(spark, sf_dir), max_iter=15, tol=-1.0, min_iter=0)
        secs = [h.seconds for h in res.history]
        mid = sorted(secs)[len(secs) // 2]
        extras["pagerank_iter1_sec"] = round(secs[0], 3)
        extras["pagerank_iter15_sec"] = round(secs[-1], 3)
        extras["pagerank_iter_median_sec"] = round(mid, 3)

    def run_pagerank_incremental() -> None:
        """Incremental graph update: converge on the derived graph, add
        ~1% new edges (shifted lineitem pairs), reconverge COLD (uniform
        init) vs WARM (initial_ranks = previous fixpoint). Warm-start is
        the daily-crawl-update shape at 100 TB — records both iteration
        counts (warm <= cold; the gap scales with how small the delta is
        relative to the graph — the fixpoint-identity contract is pinned
        by tests/test_round6_ops.py)."""
        from pyspark.sql import functions as F

        base = derived_edges(spark, sf_dir)
        res0 = pagerank(base, max_iter=100, tol=1e-8, min_iter=2)
        # Deterministic ~1%-of-E delta (ADVICE r06: an unordered limit()
        # picks partition-dependent rows, making warm-vs-cold iteration
        # counts irreproducible across runs/Spark versions).
        k = max(1, int(base.count() * 0.01))
        li = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .orderBy("l_orderkey", "l_linenumber")
            .limit(k)
        )
        delta = li.select(
            (F.col("l_partkey") % 1500).alias("src"),
            (F.col("l_suppkey") % 1500).alias("dst"),
        )
        updated = base.unionAll(delta)
        cold = pagerank(updated, max_iter=100, tol=1e-8, min_iter=2)
        warm = pagerank(
            updated,
            max_iter=100,
            tol=1e-8,
            min_iter=2,
            initial_ranks=res0.ranks,
        )
        extras["pagerank_incr_cold_iterations"] = cold.iterations
        extras["pagerank_incr_warm_iterations"] = warm.iterations

    def synth_powerlaw(n_v: int, n_e: int, seed: int = 1):
        """Deterministic web-graph-shaped synthetic edges: uniform-ish src
        (out-deg ~ n_e/n_v), zipf-ish dst via inverse-transform u^2.5 —
        top-hub in-degree ~ n_e * n_v^-0.4, matching the reference
        datasets' heavy in-degree skew (README.md:410-414)."""
        return _synth_powerlaw(spark, n_v, n_e, seed)

    def run_pagerank_s1scale() -> None:
        """Reference S1 scale (web-Google: 875k V / 5.1M E, README.md:116-120):
        15 forced supersteps on a same-shape synthetic graph. The baseline
        comparable is Giraph's ~1.2 s/superstep on this dataset
        (README.md:228); target <= 2x that."""
        res = pagerank(
            synth_powerlaw(875_713, 5_105_039), max_iter=15, tol=-1.0, min_iter=0
        )
        secs = [h.seconds for h in res.history]
        extras["pagerank_s1scale_n_vertices"] = res.n_vertices
        extras["pagerank_s1scale_build_sec"] = round(res.build_seconds, 3)
        extras["pagerank_s1scale_sec_per_iter"] = round(sum(secs) / len(secs), 3)
        extras["pagerank_s1scale_iter_median_sec"] = round(
            sorted(secs)[len(secs) // 2], 3
        )
        extras["pagerank_s1scale_iter1_sec"] = round(secs[0], 3)
        extras["pagerank_s1scale_iter15_sec"] = round(secs[-1], 3)

    def run_pagerank_s2scale() -> None:
        """Reference S2 scale (soc-Pokec: 1.6M V / 31M E, README.md:116-120):
        5 forced supersteps. Baseline comparable: Giraph's monitored S2 job
        duration 131.3 s (BASELINE.md; img/Giraph_S2_Figure) — completes
        the three-scale sweep between S1 and S3."""
        res = pagerank(
            synth_powerlaw(1_632_803, 30_622_564), max_iter=5, tol=-1.0, min_iter=0
        )
        secs = [h.seconds for h in res.history]
        extras["pagerank_s2scale_n_vertices"] = res.n_vertices
        extras["pagerank_s2scale_build_sec"] = round(res.build_seconds, 3)
        extras["pagerank_s2scale_sec_per_iter"] = round(sum(secs) / len(secs), 3)
        # median + last: the 5-iter MEAN is contaminated by the first
        # supersteps' cache-promotion/JIT warm-in (SCALING.md §11 — the
        # r04 "s2 slower than s3" inversion was exactly this artifact)
        extras["pagerank_s2scale_iter_median_sec"] = round(
            sorted(secs)[len(secs) // 2], 3
        )
        extras["pagerank_s2scale_iter_last_sec"] = round(secs[-1], 3)

    def run_pagerank_s3scale_pair() -> None:
        """Reference S3 scale (soc-LiveJournal1: 4.8M V / 69M E,
        README.md:116-120) — the headline baseline comparison (MR 629 s
        total / ~131 s per iteration; Giraph 170 s / ~17 s per superstep
        on the 6-node cluster, README.md:252-253), as TWO suite entries
        over ONE shared graph build (r10, VERDICT r09 item 7: the
        converged entry previously re-paid the ~20 s build of the
        IDENTICAL synthetic graph every round).

        - pagerank_s3scale_5iter: build + 5 forced supersteps (wall
          includes the build, as in r01-r09 — directly comparable).
        - pagerank_s3scale_converged: the reference's actual headline
          workload, d=0.85 / threshold 1e-8 on avg |delta| / min 5
          iterations (README.md:125-128), on the warm cached links.
          From r10 its wall EXCLUDES the build (flagged via
          pagerank_s3conv_build_reused; add pagerank_s3scale_build_sec
          for the r01-r09-comparable total). Per-iter stats unchanged
          in meaning."""
        from pagerank_giraph_vs_mapreduce_spark.graph.builder import build_graph

        want5 = not only or "pagerank_s3scale_5iter" in only
        wantc = not only or "pagerank_s3scale_converged" in only
        if not (want5 or wantc):
            return
        edges = synth_powerlaw(4_847_571, 68_993_773)
        t0 = time.monotonic()
        g = build_graph(edges)
        build_sec = round(time.monotonic() - t0, 3)
        extras["pagerank_s3scale_build_sec"] = build_sec
        if want5:
            t0 = time.monotonic()
            res = pagerank(edges, max_iter=5, tol=-1.0, min_iter=0, graph=g)
            timings["pagerank_s3scale_5iter"] = round(
                time.monotonic() - t0 + build_sec, 3
            )
            secs = [h.seconds for h in res.history]
            extras["pagerank_s3scale_n_vertices"] = res.n_vertices
            extras["pagerank_s3scale_sec_per_iter"] = round(sum(secs) / len(secs), 3)
            extras["pagerank_s3scale_iter_median_sec"] = round(
                sorted(secs)[len(secs) // 2], 3
            )
            extras["pagerank_s3scale_iter_last_sec"] = round(secs[-1], 3)
        if wantc:
            t0 = time.monotonic()
            res = pagerank(
                edges,
                damping=0.85,
                max_iter=100,
                tol=1e-8,
                min_iter=5,
                graph=g,
            )
            timings["pagerank_s3scale_converged"] = round(time.monotonic() - t0, 3)
            secs = [h.seconds for h in res.history]
            extras["pagerank_s3conv_iterations"] = res.iterations
            extras["pagerank_s3conv_build_sec"] = 0.0
            extras["pagerank_s3conv_build_reused"] = True
            extras["pagerank_s3conv_sec_per_iter"] = round(sum(secs) / len(secs), 3)
            extras["pagerank_s3conv_iter1_sec"] = round(secs[0], 3)
            extras["pagerank_s3conv_iter_median_sec"] = round(
                sorted(secs)[len(secs) // 2], 3
            )
            extras["pagerank_s3conv_iter_last_sec"] = round(secs[-1], 3)
            # The convergence metric is the reference's own: avg |dPR| =
            # diffSum/N (GI/PageRankMasterCompute.java:77) — at N=4.8M the
            # average crosses 1e-8 within a handful of supersteps on this
            # synthetic graph; record the final value so the early stop is
            # auditable rather than surprising.
            extras["pagerank_s3conv_final_avg_diff"] = res.history[-1].avg_diff
        g.unpersist()
        # same isolation discipline as timed()
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def run_pagerank_s5scale(out: dict) -> None:
        """s5 memory-ceiling probe (SCALING.md §23, VERDICT r07 item 2):
        30M V / 500M E power-law — ~3.3x the s4 probe, ~7.2x the S3
        headline — 5 forced supersteps through the standard kernel.
        Records the build, the full superstep curve, and whether the
        MEMORY_AND_DISK links cache spilled past the storage pool (the
        question a 1000-executor deployment asks per-executor). Run with
        SPARK_DRIVER_MEM=96g: the point is the single-box ceiling, not an
        artificial 16g squeeze."""
        res = pagerank(
            synth_powerlaw(30_000_000, 500_000_000),
            max_iter=5,
            tol=-1.0,
            min_iter=0,
        )
        secs = [h.seconds for h in res.history]
        out["n_vertices"] = res.n_vertices
        out["n_edges"] = 500_000_000
        out["build_sec"] = round(res.build_seconds, 3)
        out["iter_secs"] = [round(s, 3) for s in secs]
        out["iter_median_sec"] = round(sorted(secs)[len(secs) // 2], 3)
        out["iter_last_sec"] = round(secs[-1], 3)
        mem_b, disk_b = cache_residency()
        out["cache_mem_bytes"] = mem_b
        out["cache_disk_bytes"] = disk_b
        out["driver_mem"] = os.environ.get("SPARK_DRIVER_MEM", "16g")

    timed_probe("pagerank_s5scale_5iter", run_pagerank_s5scale)

    def run_pagerank_s5skew(out: dict) -> None:
        """Hub-split on/off delta at s5 scale (VERDICT r07 item 2): same
        30M V / 500M E, but ONE source owns 10% of all edges (50M out-
        edges — far past the auto threshold E/shuffle_partitions). Builds
        the graph once, then 3 forced supersteps with the auto hub split
        vs. hub split disabled. On 32 local threads the absolute delta is
        bounded by core count; the structural claim (one task owning a
        50M-edge scatter partition is a 1/32 → 1/1000 straggler on a real
        cluster) is what §23 documents."""
        from pyspark.sql import functions as F

        from pagerank_giraph_vs_mapreduce_spark.graph.builder import build_graph

        n_v, n_e = 30_000_000, 500_000_000
        e = spark.range(n_e)
        edges = e.select(
            F.when(F.col("id") % 10 < 1, F.lit(0))
            .otherwise(F.abs(F.xxhash64(F.col("id"), F.lit(21))) % n_v)
            .alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(22))) % n_v).alias("dst"),
        )
        t0 = time.monotonic()
        g = build_graph(edges)
        out["build_sec"] = round(time.monotonic() - t0, 3)
        res_split = pagerank(edges, graph=g, max_iter=3, tol=-1.0, min_iter=0)
        out["split_iter_secs"] = [round(h.seconds, 3) for h in res_split.history]
        res_plain = pagerank(
            edges, graph=g, max_iter=3, tol=-1.0, min_iter=0,
            hub_split_outdeg=None,
        )
        out["plain_iter_secs"] = [round(h.seconds, 3) for h in res_plain.history]
        out["split_last_sec"] = out["split_iter_secs"][-1]
        out["plain_last_sec"] = out["plain_iter_secs"][-1]

    timed_probe("pagerank_s5skew_3iter", run_pagerank_s5skew)

    def run_pagerank_s1_srcskew() -> None:
        """Hub stress at reference S1 scale: 875k V / 5.1M E with ONE
        source holding 30% of all edges (the README.md:417-418 pathology
        at the size where a single task owning the hub partition is ~30%
        of the scatter). Plain scatter vs hub-split broadcast routing
        (scatter_gather; AQE cannot split the cached links join —
        tests/test_skew_scatter.py), 3 forced supersteps each."""
        from pyspark.sql import functions as F

        n_v, n_e = 875_713, 5_105_039
        e = spark.range(n_e)
        edges = e.select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.abs(F.xxhash64(F.col("id"), F.lit(11))) % n_v)
            .alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(12))) % n_v).alias("dst"),
        )
        res = pagerank(edges, max_iter=3, tol=-1.0, min_iter=0)
        extras["pagerank_s1skew_sec_per_iter"] = round(
            sum(h.seconds for h in res.history) / len(res.history), 3
        )
        res2 = pagerank(
            edges, max_iter=3, tol=-1.0, min_iter=0,
            hub_split_outdeg=100_000,
        )
        extras["pagerank_s1skew_split_sec_per_iter"] = round(
            sum(h.seconds for h in res2.history) / len(res2.history), 3
        )

    # rotating guard: even rounds (r10, r12, ...)
    timed_rotating("pagerank_s1_srcskew", run_pagerank_s1_srcskew, parity=0)

    def run_triangle_skewed() -> None:
        """Degree-oriented triangle counting on a 100k-V/1M-E power-law
        graph (top-hub in-degree ~10k): the id-oriented plan would key
        C(hub_deg, 2) wedges on one task; degree orientation bounds the
        per-task wedge load at O(sqrt E)."""
        from pagerank_giraph_vs_mapreduce_spark.graph.motifs import triangle_count

        row = triangle_count(synth_powerlaw(100_000, 1_000_000, seed=7)).first()
        extras["triangle_skewed_n_triangles"] = row["n_triangles"]

    def run_two_hop_skewed() -> None:
        """Hub-capped two-hop counts on an out-degree-skewed graph
        (reversed power-law: top hubs have ~10k out-edges). The cap
        excludes hub intermediates, keeping the self-join fan-out linear
        in E regardless of hub size."""
        from pyspark.sql import functions as F

        from pagerank_giraph_vs_mapreduce_spark.graph.motifs import two_hop_count

        rev = synth_powerlaw(100_000, 1_000_000, seed=7).select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        extras["two_hop_skewed_rows"] = two_hop_count(rev, mid_outdeg_cap=64).count()

    def run_wcc_large() -> None:
        """Second kernel at scale: 3 label-propagation supersteps on the
        200k-vertex graph (symmetrized ~4.8M directed edges)."""
        from pagerank_giraph_vs_mapreduce_spark.graph.components import (
            connected_components,
        )

        res = connected_components(large_graph(), max_iter=3)
        extras["wcc_large_sec_per_iter"] = round(
            sum(s for _, _, s in res.history) / len(res.history), 3
        )

    def run_lpa_large() -> None:
        """Community detection at scale: 2 deterministic LPA rounds on the
        200k-vertex graph — per-round cost is one E-row vote join plus two
        V-row aggregates, same superstep shape as WCC."""
        from pagerank_giraph_vs_mapreduce_spark.graph.communities import (
            label_propagation,
        )

        extras["lpa_large_communities"] = (
            label_propagation(large_graph(), rounds=2)
            .select("label")
            .distinct()
            .count()
        )

    def run_bfs_large() -> None:
        """Frontier BFS on the 200k-vertex graph: per-hop cost must track
        frontier size (collapsing), not graph size."""
        from pagerank_giraph_vs_mapreduce_spark.graph.paths import bfs_distances

        res = bfs_distances(large_graph(), source=0, max_hops=4)
        extras["bfs_large_reached"] = res.distances.count()
        extras["bfs_large_hops"] = res.iterations

    def run_wcc_incremental() -> None:
        """Component maintenance: converge WCC on the 200k-vertex graph,
        add a small bridging delta, reconverge INCREMENTALLY (frontier =
        delta endpoints) vs FULL recompute — records supersteps and the
        frontier sizes, the evidence that per-superstep work tracks the
        merge wavefront, not E."""
        from pyspark.sql import functions as F

        from pagerank_giraph_vs_mapreduce_spark.graph.components import (
            build_sym_cache,
            connected_components,
            connected_components_incremental,
        )

        base = large_graph()
        prev = connected_components(base)
        delta = (
            base.filter(F.col("src") % 997 == 0)
            .select("src", (F.col("dst") + 200000).alias("dst"))
            .distinct()
        )
        # Both timed phases iterate over the SAME base∪delta edge set;
        # build its symmetrized cache ONCE, timed separately, instead of
        # once per phase (guide §5 reuse — VERDICT r13 item 4; per-phase
        # attribution unchanged: the phase timers now price exactly the
        # convergence work).
        updated = base.unionAll(delta)
        t0 = time.monotonic()
        sym = build_sym_cache(updated)
        sym.count()
        extras["wcc_sym_build_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        inc = connected_components_incremental(
            prev.components, updated, delta, sym_edges=sym
        )
        inc.components.count()
        extras["wcc_incr_supersteps"] = inc.iterations
        extras["wcc_incr_sec"] = round(time.monotonic() - t0, 3)
        extras["wcc_incr_frontier_peak"] = max(h[1] for h in inc.history)
        t0 = time.monotonic()
        full = connected_components(updated, sym_edges=sym)
        full.components.count()
        extras["wcc_full_supersteps"] = full.iterations
        extras["wcc_full_sec"] = round(time.monotonic() - t0, 3)
        sym.unpersist()

    # rotating guard: odd rounds (r11, r13, ...)
    timed_rotating("wcc_incremental_vs_full", run_wcc_incremental, parity=1)

    def run_adamic_adar_powerlaw() -> None:
        """Link prediction on a 100k-vertex / 500k-edge power-law graph —
        the shape the hub cap exists for (the derived TPC-H graph at
        sf0.1 is uniformly dense, median degree 704, so the cap would
        null it — see bench list note). Records the candidate-pair count
        the cap admits; the capped fan-out is the operator's scale
        claim (SCALING.md §22)."""
        from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
            adamic_adar_topk,
        )

        edges = synth_powerlaw(100_000, 500_000, seed=11)
        top = adamic_adar_topk(edges, hub_cap=256, k=20)
        extras["adamic_adar_rows"] = top.count()

    timed("adamic_adar_powerlaw_100k", run_adamic_adar_powerlaw)

    def run_square_count_powerlaw() -> None:
        """4-cycle counting on the same 100k/500k power-law graph as the
        AA entry (the derived sf0.1 graph's median degree 704 exceeds the
        256 cap, which would null the induced subgraph). Measures the
        capped wedge self-join + diagonal aggregate — the operator's
        whole cost."""
        from pagerank_giraph_vs_mapreduce_spark.graph.motifs import square_count

        edges = synth_powerlaw(100_000, 500_000, seed=11)
        row = square_count(edges, hub_cap=256).collect()[0]
        extras["square_count_powerlaw_n_squares"] = row["n_squares"]

    timed_rotating("square_count_powerlaw_100k", run_square_count_powerlaw, parity=0)

    def run_jaccard_powerlaw() -> None:
        """Neighbor-Jaccard top-20 on the 100k/500k power-law graph —
        same wedge core as AA, plus the two degree joins and the one
        final division."""
        from pagerank_giraph_vs_mapreduce_spark.graph.motifs import jaccard_topk

        edges = synth_powerlaw(100_000, 500_000, seed=11)
        extras["jaccard_powerlaw_rows"] = jaccard_topk(
            edges, hub_cap=256, k=20
        ).count()

    timed_rotating("jaccard_powerlaw_100k", run_jaccard_powerlaw, parity=1)

    timed("pagerank_full", run_pagerank)
    timed("pagerank_skewed_3iter", run_pagerank_skewed)
    timed_query("pagerank_large_3iter", run_pagerank_large)
    # rotating guard: odd rounds (the pytest flatness checks still run every round)
    timed_rotating("pagerank_flatness_15iter", run_pagerank_flatness, parity=1)
    # rotating guard: odd rounds — a cold-vs-warm A/B whose answer moves
    # only with the kernel; the operator itself is still measured every
    # round by g_pagerank_incremental (sf0.1) and its fixpoint pytest
    timed_rotating("pagerank_incremental", run_pagerank_incremental, parity=1)
    timed("pagerank_s1scale_15iter", run_pagerank_s1scale)
    timed("pagerank_s2scale_5iter", run_pagerank_s2scale)
    # one shared build, two timing entries (see the pair docstring)
    run_pagerank_s3scale_pair()
    timed("triangle_skewed_100k", run_triangle_skewed)
    timed("two_hop_skewed_100k", run_two_hop_skewed)
    timed("wcc_large_3iter", run_wcc_large)
    timed("lpa_large_2round", run_lpa_large)
    timed("bfs_large_4hop", run_bfs_large)
    for q in (
        "rel_q1_pricing",
        "rel_join_q3",
        "rel_win_rank",
        "win_session_30m",
        "dedup_minhash_near_dups",
        "pipeline_curation",
        "pipeline_curation_staged",
        "dedup_simhash",
        "dedup_simhash64_near_dups",
        "sim_cosine_top10",
        "sim_ann_recall",
        "sim_kmeans_2iter",
        "text_fingerprint",
        "g_kcore64_r4",
        "stream_tumbling_15m",
        "g_pagerank_k3",
    ):
        timed_query(q, run_query(q))
    # Round-3 text-operator family (VERDICT_r03 item 7) and the round-4
    # multi-query-ANN / sampler entries: benched with row counts so r05+
    # can see drift on the newest entries.
    for q in (
        "text_vocab_top20",
        "text_tfidf_top_term",
        "text_feature_hash_64",
        "text_chunks",
        "sim_knn_join_top3",
        "pipeline_class_balance",
        "sim_pq_encode",
        "sim_pq_adc_top5",
        "text_repetition",
        "text_bpe_merges_k3",
        "pipeline_decontaminate",
        "pipeline_domain_mix",
        "g_random_walks_k3",
        "pipeline_split_leakage_safe",
        "dedup_recall_planted",
        "text_lm_score",
        "text_pii_scrub",
        "sim_ivfpq_top5",
        "dedup_incremental",
        "rel_q15_top_supplier",
        "rel_q17_small_quantity",
        "pipeline_pack_sequences",
        "dedup_semantic",
        "pipeline_quality_bins",
        "storage_zorder_buckets",
        "pipeline_dsir_resample",
        # round-5 additions
        "rel_scd2_history",
        "rel_salted_skew_join",
        "mm_resize",
        "mm_thumbnail",
        "stream_late_data_gate",
        # round-6 additions
        "text_bpe_encode",
        "stream_incremental_dedup",
        "pipeline_stratified_sample",
        "sim_range_search",
        "text_dedup_paragraphs",
        "stream_stream_join",
        "source_orc_roundtrip",
        "source_python_datasource",
        "mm_audio_stats",
        "udf_arrow_optimized",
        "dedup_lsh_star_candidates",
        "storage_time_travel",
        "storage_bucketed_join",
        "sql_lateral_topk",
        "g_pagerank_incremental",
        "dedup_containment",
        "rel_bloom_semi_join",
        "g_sssp_k4",
        "text_repeated_ngrams",
        "sql_pivot",
        "pipeline_rag_retrieve",
        # round-7 additions
        "pipeline_rag_retrieve_encoder",
        "mm_jpeg_decode",
        "mm_gif_decode",
        "mm_gif_frames",
        "mm_resize_jpeg",
        "pipeline_rag_mmr",
        "source_tar_members",
        "source_warc_records",
        # round-7 third wave
        "dedup_cdc_chunks",
        # (g_link_adamic_adar benches on a synthetic power-law graph below:
        # the derived TPC-H graph at sf0.1 is uniformly dense — median
        # undirected degree 704 — so the hub cap of 256 would null the
        # transit set and the timing would measure an empty plan)
        "sim_matryoshka_rerank",
        "text_entropy",
        "source_jsonl_gz",
        "storage_partition_prune",
        "mm_ahash_pairs",
        "sim_binary_rerank",
        "pipeline_shuffle_shards",
        "pipeline_corpus_build",
        "g_walk_cooccurrence",
        "dedup_cdc_strip",
        # round-8 additions: batched BPE / per-vertex AA / progressive
        # JPEG / k-truss / sketches / exact quantiles / suppression gate
        "text_bpe_merges_k64_batched",
        "g_link_aa_pervertex",
        "mm_jpeg_progressive_decode",
        "g_ktruss4_r3",
        "pipeline_weighted_sample",
        "pipeline_domain_cap",
        "fn_cms_heavy_hitters",
        "fn_kmv_distinct",
        "rel_exact_quantiles",
        "pipeline_k_anonymity",
        "source_avro_roundtrip",
        "mm_webp_decode",
        "g_betweenness_k3",
        "pipeline_train_quality_lr",
        "pipeline_model_gate",
        "pipeline_train_per_source_lr",
        "rel_exact_quantiles_grouped",
        "rel_outlier_zscore",
        "rel_corr_exact",
        "mm_y4m_frames",
        # round-9 additions
        "g_ktruss4_conv",
        "pipeline_train_quality_lr_mb",
        "g_betweenness_k3_norm",
        "rel_outlier_mad",
        "mm_ivf_frames",
        "rel_resample_gapfill",
        "fn_kmv_set_ops",
        "text_zipf_fit",
        "stream_resample_gapfill",
        "g_ppr_multi_k3",
        "rel_resample_lerp",
        # round-10 additions
        "rel_asof_join",
        "g_louvain_r2",
        "mm_ivf_external_features",
        "g_modularity_score",
        "rel_ohlc_candles",
        "stream_ohlc_candles",
        "rel_asof_join_fwd",
        "g_louvain_w_r2",
        "stream_scd2_enrich",
        "g_louvain_l2",
        "rel_profile_columns",
        "pipeline_url_dedup",
        "mm_wav_decimate",
        "rel_win_ewma8",
        "g_diameter_lb_k4",
        "mm_scene_cuts",
        "text_readability",
        "source_xml_roundtrip",
        "pipeline_model_auc",
        "pipeline_span_corrupt",
        "stream_model_gate",
        "rel_asof_join_tol",
        "rel_er_fuzzy_join",
        "fn_quantile_sketch",
        "stream_quantile_sketch",
        "source_fixed_width",
        "rel_skyline_2d",
        "text_pmi_bigrams",
        "g_degree_gini",
        "rel_assoc_rules",
        "g_matching_r3",
        "g_coarsen_r3",
        # round-11 additions
        "g_degree_gini_exact",
        "g_partition_k2",
        "g_partition_k2_refined",
        "g_partition_k2_vcycle",
        "g_partition_cut_stats",
        "g_partition_k4",
        "mm_external_poison_mix",
        # round-13 additions
        "g_partition_k4_cut_stats",
        "g_wcc_delta_stream",
        "g_pagerank_warm_delta",
    ):
        timed_query(q, run_query_rows(q))

    def run_ktruss_dense_probe(out: dict) -> None:
        """The pre-r09 truss fixture as a named probe (VERDICT r08 item 3):
        3 peel rounds on the DENSE shared derived graph (997/1500 moduli,
        ~43M triangles/round at sf0.1 — 2-3 orders of magnitude more
        triangles per edge than a real web/social graph at this |E|). The
        suite entry g_ktruss4_r3 now runs on a realistic-sparsity fixture;
        this probe keeps the stress measurement without taxing every
        round. Run explicitly: `python bench.py ktruss_dense_probe`."""
        from pagerank_giraph_vs_mapreduce_spark.graph.motifs import ktruss_edges

        res = ktruss_edges(derived_edges(spark, sf_dir), k=4, rounds=3)
        out["survivor_edges"] = res.count()

    timed_probe("ktruss_dense_probe", run_ktruss_dense_probe)

    def run_bloom_prune() -> None:
        # The bloom operator's SCALE claim, measured: fraction of the
        # fact table the bitmap probe lets through to the exact join.
        from pyspark.sql import functions as SF

        from pagerank_giraph_vs_mapreduce_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        dim = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(SF.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        bloom = bloom_build(dim, "c_custkey")
        passed = bloom_might_contain(orders, "o_custkey", bloom).count()
        total = orders.count()
        extras["bloom_prune_passed_rows"] = passed
        extras["bloom_prune_total_rows"] = total

    timed("bloom_prune_probe", run_bloom_prune)

    # Durable-IVF probe: like dedup_incremental_indexed, the one-time
    # index build runs untimed first — the entry measures the SERVING
    # probe cost (pruned scan + rescore), which is the operator's claim.
    if not only or "sim_ivf_indexed_top5" in only:
        from pagerank_giraph_vs_mapreduce_spark.plans.similarity_queries import (
            _ivf_index_table,
        )

        _ivf_index_table(spark, sf_dir)
    timed("sim_ivf_indexed_top5", run_query_rows("sim_ivf_indexed_top5"))

    # The indexed incremental-dedup entry measures the DAILY PROBE cost
    # (the operator's claim), so the one-time corpus index build runs
    # untimed first — measured 33 s at sf0.1, amortized over every future
    # batch in production.
    if not only or "dedup_incremental_indexed" in only:
        from pagerank_giraph_vs_mapreduce_spark.plans.dedup_queries import (
            _corpus_band_index,
        )

        _corpus_band_index(spark, sf_dir)
    timed("dedup_incremental_indexed", run_query_rows("dedup_incremental_indexed"))

    def kernel_bench(vectorized: bool):
        """Distance-kernel A/B (VERDICT_r04 item 6): the same cosine
        scoring over the embeddings table replicated 40x (~200k rows at
        sf0.1), builtin higher-order-function fold vs Arrow/numpy
        pandas_udf. Forced via a sum aggregate; winner per scale is
        recorded in SCALING.md §10."""

        def fn() -> None:
            from pyspark.sql import functions as SF

            from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
                cosine_scores,
                cosine_scores_vectorized,
            )

            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", "embedding"
            )
            big = emb.crossJoin(
                spark.range(40).select(SF.col("id").alias("rep"))
            ).select(
                (SF.col("vec_id") * 100 + SF.col("rep")).alias("vec_id"),
                "embedding",
            )
            q = emb.filter(SF.col("vec_id") == 0)
            op = cosine_scores_vectorized if vectorized else cosine_scores
            scored = op(big, q)
            key = "kernel_numpy_sum" if vectorized else "kernel_hof_sum"
            extras[key] = round(
                scored.agg(SF.sum("cos_sim")).collect()[0][0], 3
            )

        return fn

    timed("kernel_cosine_hof", kernel_bench(False))
    timed("kernel_cosine_numpy", kernel_bench(True))

    def run_semantic_k64() -> None:
        # The registry twin (dedup_semantic) is pinned to the oracle's
        # 8-centroid codebook, which at sf0.1 leaves ~700-vector clusters
        # and a quadratic within-cluster pair cost — the exact anti-
        # pattern SCALING.md §7f warns about. This entry is the scale
        # path: k=64 keeps clusters ~90 rows, same survivors semantics.
        from pyspark.sql import functions as SF

        from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
            semantic_dedup,
        )

        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
        )
        # planted-dup ids offset past the real id range — a fixed +10000
        # silently collides once the table exceeds 10000 rows (sf >= ~1)
        offset = emb.agg(SF.max("vec_id")).collect()[0][0] + 1
        dups = emb.filter(SF.col("vec_id") % 10 == 0).select(
            (SF.col("vec_id") + offset).alias("vec_id"), "embedding"
        )
        cents = emb.filter(
            (SF.col("vec_id") >= 10) & (SF.col("vec_id") < 74)
        ).select((SF.col("vec_id") - 10).alias("centroid_id"), "embedding")
        extras["dedup_semantic_k64_rows"] = semantic_dedup(
            emb.unionAll(dups), cents, threshold=0.99
        ).count()

    timed_query("dedup_semantic_k64", run_semantic_k64)

    def run_bpe_k64() -> None:
        # 64 merge rounds = 64 vocabulary-sized driver rounds (one
        # TakeOrdered collect + one localCheckpoint each). sec/merge is
        # the cost-curve number VERDICT r06 item 6 asks for: a 32k-merge
        # production vocab costs ~32k * sec_per_merge on the SAMPLED
        # vocab table, independent of corpus size after the one
        # word-count pass.
        from pyspark.sql import functions as SF  # noqa: F401

        t0 = time.monotonic()
        extras["text_bpe_merges_k64_rows"] = QUERIES["text_bpe_merges_k64"](
            spark, sf_dir
        ).count()
        extras["bpe_k64_sec_per_merge"] = round((time.monotonic() - t0) / 64, 3)

    timed("text_bpe_merges_k64", run_bpe_k64)

    # Machine-decidable headline (VERDICT r08 item 2): median of >=3
    # fresh-JVM solo S3 kernel runs — immune to the shared-JVM cross-talk
    # and host spread that made the in-suite number need narrative
    # adjudication. Runs on the full suite (and on explicit request via
    # `python bench.py pagerank_s3_solo_median`); skippable for quick
    # local iterations with SPARK_GRAFT_NO_SOLO=1.
    # NEVER mutate `only` here: the solo/full branch below keys off it, and
    # an emptied set would route a solo invocation into the full-suite
    # writer with empty timings — clobbering the committed artifact (this
    # exact bug ate BENCH_full.json's queries dict once).
    unknown = (
        only
        - set(timings)
        - set(probes)
        - {"pagerank_s3_solo_median", "host_calibration"}
    )
    if unknown:
        print(f"warning: unknown bench entries skipped: {sorted(unknown)}", file=sys.stderr)

    total = round(sum(timings.values()), 3)

    def arbitrate(prior_full: dict) -> dict:
        """Mechanized cold-JIT arbitration (VERDICT r10 What's-wrong #2):
        every cross-round flag gets a machine-readable verdict IN the
        artifact, replacing the SCALING §27 prose protocol. The suite
        session is maximally WARM at this point (every entry has run), so
        re-measuring a flagged entry here IS the warm-mini-suite
        re-measurement: if the warm number returns inside the
        calibration band the suite-context value was session-order noise
        (cold JIT / cache ordering); if it stays out, the entry gets an
        AUTOMATIC fresh-JVM solo re-measurement in a subprocess (r12
        protocol extension — r11 closed with its one warm-surviving
        flag unadjudicated) and only ships as plan_change if the solo
        number stays outside the band too. Improvements are labeled,
        not re-run."""

        def fresh_jvm_solo(name: str) -> float | None:
            """Time one registry entry in a NEW JVM: run it once to pay
            JVM/codegen/footer warmup, clear caches, time the second
            execution — the closest subprocess analogue of the
            warm-JVM-cold-query conditions an in-suite number has."""
            import subprocess

            script = (
                "import sys, time\n"
                f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
                "from pagerank_giraph_vs_mapreduce_spark.session import get_spark\n"
                "from pagerank_giraph_vs_mapreduce_spark.plans.registry import QUERIES, load_all_queries\n"
                "load_all_queries()\n"
                "spark = get_spark()\n"
                f"QUERIES[{name!r}](spark, {sf_dir!r}).count()\n"
                "spark.catalog.clearCache()\n"
                "t0 = time.monotonic()\n"
                f"QUERIES[{name!r}](spark, {sf_dir!r}).count()\n"
                "print('SOLO_SEC', round(time.monotonic() - t0, 3))\n"
            )
            try:
                res = subprocess.run(
                    [sys.executable, "-c", script],
                    capture_output=True,
                    text=True,
                    timeout=600,
                )
                for line in res.stdout.splitlines():
                    if line.startswith("SOLO_SEC "):
                        return float(line.split()[1])
            except Exception:
                pass
            return None
        oq = prior_full.get("queries", {})
        band = 1.25
        host_r = {
            k: extras[k] / prior_full[k]
            for k in ("host_python_loop_sec", "host_jvm_agg_sec")
            if k in extras and prior_full.get(k)
        }
        ratios = list(host_r.values())
        lo = (min(ratios) if ratios else 1.0) / band
        hi = (max(ratios) if ratios else 1.0) * band
        # Calibration-NORMALIZED ratios in the artifact (VERDICT r12 item
        # 4): every verdict carries the raw cross-round ratio AND the
        # ratio scaled by each host scalar, so a real regression can't
        # hide behind a slow host (nor a fast host manufacture one) and
        # the docs never need a narrative host caveat.
        out: dict = {
            "band": [round(lo, 3), round(hi, 3)],
            "host_ratios": {
                k.replace("host_", "").replace("_sec", ""): round(v, 3)
                for k, v in host_r.items()
            },
        }
        r_py = host_r.get("host_python_loop_sec")
        r_jvm = host_r.get("host_jvm_agg_sec")
        verdicts: dict = {}
        for name in sorted(set(oq) & set(timings)):
            a, b = oq[name], timings[name]
            if (a < 1.0 and b < 1.0) or not a:
                continue  # sub-second entries live inside scheduler noise
            r = b / a
            if lo <= r <= hi:
                continue
            row = {"old": a, "suite": b, "ratio": round(r, 2)}
            if r_jvm:
                row["ratio_cal_jvm"] = round(r / r_jvm, 2)
            if r_py:
                row["ratio_cal_py"] = round(r / r_py, 2)
            if r < lo:
                row["verdict"] = "improvement"
            elif name not in entry_fns:
                # composite ladder entries record timings directly (no
                # re-runnable thunk): flag for the solo arbiter instead
                # of silently dropping the flag
                row["verdict"] = "manual_solo"
            else:
                try:
                    t0 = time.monotonic()
                    entry_fns[name]()
                    warm = round(time.monotonic() - t0, 3)
                    spark.catalog.clearCache()
                    import gc as _gc

                    _gc.collect()
                    spark.sparkContext._jvm.System.gc()
                    row["warm"] = warm
                    if warm / a <= hi:
                        row["verdict"] = "session_order"
                    else:
                        # warm-surviving flag: escalate to an automatic
                        # fresh-JVM solo before it can ship as plan_change
                        solo = (
                            fresh_jvm_solo(name) if name in QUERIES else None
                        )
                        if solo is None:
                            row["verdict"] = "plan_change"
                        else:
                            row["solo"] = solo
                            row["verdict"] = (
                                "session_order_solo"
                                if solo / a <= hi
                                else "plan_change"
                            )
                except Exception as exc:  # never lose the suite artifact
                    row["verdict"] = "manual_solo"
                    row["rerun_error"] = str(exc)[:200]
            verdicts[name] = row
        out["verdicts"] = verdicts
        return out

    # Full artifact committed in-repo: the driver captures only a ~2000-char
    # stdout tail, so the complete per-query dict lives here (BENCH came back
    # "parsed": null in rounds 1-6 because the single stdout line outgrew
    # that capture — VERDICT_r06 item 1).
    # At low core counts the full artifact, its arbitration and the
    # headline cross-round block are 32-core-referenced: write the run to
    # a sibling file so the scaling run never clobbers the main artifact
    # or triggers cross-core-count arbitration re-runs.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_full_lowcpu.json" if low_cpu else "BENCH_full.json",
    )
    prior: dict = {}
    if os.path.exists(full_path):
        try:
            with open(full_path) as f:
                prior = json.load(f)
        except (OSError, ValueError):
            prior = {}
    if only:
        # Solo/probe mode: update only the entries this invocation ran;
        # never clobber the committed full-suite artifact with a partial
        # dict (pre-r08 solo runs did exactly that).
        full = prior or {"metric": "headline_suite_total", "unit": "sec"}
        full.setdefault("queries", {}).update(timings)
        full.update(extras)
    else:
        full = {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            **extras,
        }
        if skipped_low_cpu:
            full["skipped_low_cpu"] = sorted(skipped_low_cpu)
        if budget_skipped:
            full["budget_skipped"] = sorted(budget_skipped)
        if prior.get("queries") and not low_cpu:
            full["arbitration"] = arbitrate(prior)
        # Headline cross-round comparison with BOTH raw and
        # calibration-scaled ratios (VERDICT r12 item 4): cal_ratio =
        # raw_ratio / host_jvm_ratio — the S3 kernel is JVM-bound, so
        # the JVM probe is its calibration scalar. <= 1.0 cal means
        # at-least-parity on a like-for-like host.
        if (
            prior.get("pagerank_s3_solo_median_sec")
            and extras.get("pagerank_s3_solo_median_sec")
            and prior.get("host_jvm_agg_sec")
            and extras.get("host_jvm_agg_sec")
        ):
            raw_r = (
                extras["pagerank_s3_solo_median_sec"]
                / prior["pagerank_s3_solo_median_sec"]
            )
            jvm_r = extras["host_jvm_agg_sec"] / prior["host_jvm_agg_sec"]
            full["headline_cross_round"] = {
                "prior_solo_sec": prior["pagerank_s3_solo_median_sec"],
                "raw_ratio": round(raw_r, 3),
                "host_jvm_ratio": round(jvm_r, 3),
                "cal_ratio": round(raw_r / jvm_r, 3),
            }
    # Probes (multi-minute one-offs, SCALING.md §23) persist across suite
    # runs: a fresh full-suite write carries stored probe rows forward.
    all_probes = dict(prior.get("probes", {}))
    all_probes.update(probes)
    if all_probes:
        full["probes"] = all_probes
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")

    # Compact FINAL stdout line, guaranteed well under the driver's capture:
    # headline metric = S3 median sec/superstep (the BASELINE.md comparison:
    # Giraph ~17 s, MR ~131 s at the same V/E on 6 nodes), plus the s1/s2/s3
    # medians and a small headline-query dict. Everything else: BENCH_full.json.
    headline_queries = [
        "pagerank_full",
        "pagerank_s1scale_15iter",
        "pagerank_s2scale_5iter",
        "pagerank_s3scale_5iter",
        "pagerank_s3scale_converged",
        "pagerank_skewed_3iter",
        "wcc_large_3iter",
        "bfs_large_4hop",
        "dedup_minhash_near_dups",
        "dedup_lsh_star_candidates",
        "sim_cosine_top10",
        "sim_ivf_indexed_top5",
        "pipeline_curation",
        "pipeline_rag_retrieve",
        "rel_q1_pricing",
    ]
    headline_extras = [
        "pagerank_sec_per_iter",
        "pagerank_iterations",
        "pagerank_s1scale_iter_median_sec",
        "pagerank_s2scale_iter_median_sec",
        "pagerank_s3scale_iter_median_sec",
        "pagerank_s1scale_build_sec",
        "pagerank_s3conv_iterations",
        "pagerank_s3conv_iter_median_sec",
        "pagerank_skew_sec_per_iter",
        "pagerank_s3_solo_median_sec",
        "pagerank_s3_solo_runs_sec",
    ]
    # Headline = solo median when available (fresh-JVM, machine-decidable
    # cross-round — VERDICT r08 item 2); in-suite median is the fallback
    # and still ships alongside for continuity with r01-r08.
    compact = {
        "metric": (
            "pagerank_sec_per_iter_s3_solo_median"
            if "pagerank_s3_solo_median_sec" in extras
            else "pagerank_sec_per_iter_s3_median"
        ),
        "value": extras.get(
            "pagerank_s3_solo_median_sec",
            extras.get("pagerank_s3scale_iter_median_sec", total),
        ),
        "unit": "sec",
        "suite_sec": total,
        "n_queries": len(timings),
        "sf": sf,
        "queries": {k: timings[k] for k in headline_queries if k in timings},
        **{k: extras[k] for k in headline_extras if k in extras},
        "full": os.path.basename(full_path),
    }
    if skipped_low_cpu or budget_skipped:
        compact["n_skipped_low_cpu"] = len(skipped_low_cpu)
        compact["n_budget_skipped"] = len(budget_skipped)
    if "arbitration" in full:
        vs = full["arbitration"]["verdicts"]
        compact["arb"] = {
            v: sum(1 for r in vs.values() if r["verdict"] == v)
            for v in (
                "improvement",
                "session_order",
                "plan_change",
                "manual_solo",
            )
        }
    if "headline_cross_round" in full:
        compact["headline_cross_round"] = full["headline_cross_round"]
    line = json.dumps(compact)
    if len(line) > 1800:  # hard guard: never outgrow the driver's tail capture
        compact["queries"] = {}
        line = json.dumps(compact)
    print(line)
    return 0


if __name__ == "__main__":
    if sys.argv[1:] == ["__s3solo__"]:
        raise SystemExit(_s3solo())
    raise SystemExit(main())
