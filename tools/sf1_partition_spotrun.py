"""sf1-scale spot-run for the multilevel partition family — VERDICT r11
item 5: the one r11 addition whose scale story was argued, not measured.

Fixture: DISJOINT id-offset copies (x1/x5/x10) of the sf0.1 derived
graph. Matching stays copy-local (edges never cross copies), but the
hash edge priorities (graph/motifs.py:edge_priority) are functions of
ABSOLUTE ids, so each offset copy draws different priorities and
matches a slightly different count — per-level super counts are
near-linear, not exactly factor * x1 (the r11 id-priority rule WAS
offset-invariant, and also barely matched anything on this dense
graph). The invariants asserted IN-RUN are therefore:

- EXACT: leaf vertex count and leaf undirected edge count are
  factor * x1 (disjoint replication, integers);
- EXACT, per level, per factor: the contracted level's total edge
  WEIGHT equals the finer level's cross-super mass (conservation —
  the pytest invariant, now held at 10x volume);
- BOUNDED: per-level super counts within 2% of factor * x1 (each
  copy is an independent priority draw; the sum concentrates).

The geometric level shrink (V_k / V_{k-1}) is reported per factor —
the multilevel cost argument in one column. The INITIAL COLORING is
deliberately global (one BFS seed; other copies fill by weight), so
cut/balance are reported as observed, with no cross-factor invariant
claimed. Timing + stage-level cumulative shuffle (AppStatusStore —
SQLMetrics are empty for kernels that localCheckpoint per level) cover
the full refined partition per factor.

Appends a '## sf1 partition spot-run' section to RUNTIME.md.

Usage: python tools/sf1_partition_spotrun.py [factor]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
STRIDE = 10_000_000
LEVELS = (3, 2, 2)
SWEEPS = 2


def shuffle_totals(spark) -> tuple[int, int]:
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
    tb = tr = 0
    while it.hasNext():
        s = it.next()
        tb += s.shuffleWriteBytes()
        tr += s.shuffleWriteRecords()
    return tb, tr


def replicate(edges, factor: int):
    out = edges
    for i in range(1, factor):
        out = out.unionAll(
            edges.select(
                (F.col("src") + STRIDE * i).alias("src"),
                (F.col("dst") + STRIDE * i).alias("dst"),
            )
        )
    return out


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(cpus="8", shuffle_partitions=32)

    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        _multilevel_pipeline_full,
        multilevel_partition_k2_refined,
        undirect_dedup,
    )
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import derived_edges

    der1 = derived_edges(spark, BASE)
    rows = []
    base_v: list[int] | None = None
    base_m: list[int] | None = None
    leaf1 = None
    for f in (1, factor // 2, factor):
        edges = replicate(der1, f)
        und0 = edges.selectExpr(
            "least(src, dst) AS u", "greatest(src, dst) AS v"
        ).where("src <> dst").distinct()
        leaf_v = int(
            und0.selectExpr("u AS id").union(und0.selectExpr("v AS id"))
            .distinct().count()
        )
        leaf_e = int(und0.count())
        b0, r0 = shuffle_totals(spark)
        t0 = time.monotonic()
        levels, mappings, comps, part = _multilevel_pipeline_full(
            edges, LEVELS
        )
        v_per_level = [
            int(
                m.select(F.countDistinct("super").alias("n")).first()["n"]
            )
            for m in mappings
        ]
        mass_per_level = [
            int(
                lv.agg(
                    F.coalesce(F.sum("weight"), F.lit(0)).alias("m")
                ).first()["m"]
            )
            for lv in levels[1:]
        ]
        # EXACT in-run conservation: level k's total weight == level
        # k-1's cross-super mass under mapping k
        for k in range(1, len(LEVELS) + 1):
            mu = mappings[k - 1].select(
                F.col("node").alias("u"), F.col("super").alias("su")
            )
            mv = mappings[k - 1].select(
                F.col("node").alias("v"), F.col("super").alias("sv")
            )
            cross = int(
                levels[k - 1]
                .join(mu, "u")
                .join(mv, "v")
                .filter(F.col("su") != F.col("sv"))
                .agg(F.coalesce(F.sum("weight"), F.lit(0)).alias("m"))
                .first()["m"]
            )
            assert cross == mass_per_level[k - 1], (
                f"conservation broken at level {k} factor {f}: "
                f"{cross} != {mass_per_level[k - 1]}"
            )
        pipe_sec = time.monotonic() - t0

        if f == 1:
            base_v, base_m = v_per_level, mass_per_level
            leaf1 = (leaf_v, leaf_e)
        else:
            assert base_v is not None and leaf1 is not None
            assert leaf_v == f * leaf1[0], (leaf_v, f, leaf1)
            assert leaf_e == f * leaf1[1], (leaf_e, f, leaf1)
            for k, (v, v1) in enumerate(zip(v_per_level, base_v), start=1):
                dev = abs(v - f * v1) / (f * v1)
                assert dev < 0.02, (
                    f"V near-linearity broken at level {k}: {v} vs "
                    f"{f}*{v1} (dev {dev:.4f})"
                )

        t0 = time.monotonic()
        parts = multilevel_partition_k2_refined(
            edges, level_rounds=LEVELS, sweeps=SWEEPS
        ).localCheckpoint(eager=True)
        ref_sec = time.monotonic() - t0
        b1, r1 = shuffle_totals(spark)

        und = undirect_dedup(edges)
        pa = parts.select(F.col("id").alias("u"), F.col("part").alias("pa"))
        pb = parts.select(F.col("id").alias("v"), F.col("part").alias("pb"))
        stats = (
            und.join(pa, "u")
            .join(pb, "v")
            .agg(
                F.sum(
                    F.when(F.col("pa") != F.col("pb"), 1).otherwise(0)
                ).alias("cut"),
                F.count(F.lit(1)).alias("m"),
            )
            .first()
        )
        sides = {
            r["part"]: r["n"]
            for r in parts.groupBy("part")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_v0 = sum(sides.values())
        shrink = " -> ".join(
            str(x) for x in ([n_v0] + v_per_level)
        )
        row = {
            "factor": f,
            "v_levels": shrink,
            "edge_mass": mass_per_level,
            "cut": int(stats["cut"]),
            "edges": int(stats["m"]),
            "sides": f"{sides.get(0, 0)}/{sides.get(1, 0)}",
            "pipe_sec": round(pipe_sec, 1),
            "refined_sec": round(ref_sec, 1),
            "shuffle_records": r1 - r0,
            "shuffle_mb": round((b1 - b0) / 1e6, 1),
        }
        rows.append(row)
        print("measured", row, flush=True)
        spark.catalog.clearCache()

    lines = [
        "## sf1 partition spot-run (x1/x"
        + str(factor // 2)
        + "/x"
        + str(factor)
        + ", tools/sf1_partition_spotrun.py)",
        "",
        "Disjoint id-offset copies of the sf0.1 derived graph. Asserted",
        "IN-RUN before timing: leaf V and E EXACTLY factor * x1;",
        "cross-super edge-mass CONSERVATION exact per level per factor",
        "(the pytest invariant at 10x volume); per-level super counts",
        "within 2% of factor * x1 (hash edge priorities are functions of",
        "absolute ids, so each offset copy draws different priorities —",
        "near-linear by concentration, not exact by construction). The",
        "initial coloring is global (one BFS seed), so cut/balance are",
        "observed, not invariant. `V levels` shows the geometric shrink",
        "the hash-priority matching restored (id-priority matching",
        "stalled at 1500 -> 1492 on this dense graph).",
        "",
        "| factor | V levels (leaf -> coarsest) | cut / edges | sides 0/1 "
        "| coarsen sec | refined sec | shuffle records | shuffle MB |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| x{r['factor']} | {r['v_levels']} "
            f"| {r['cut']} / {r['edges']} | {r['sides']} "
            f"| {r['pipe_sec']} | {r['refined_sec']} "
            f"| {r['shuffle_records']} | {r['shuffle_mb']} |"
        )
    with open("/root/repo/RUNTIME.md") as fh:
        doc = fh.read()
    marker = "\n## sf1 partition spot-run"
    if marker in doc:
        start = doc.index(marker)
        nxt = doc.find("\n## ", start + len(marker))
        tail = doc[nxt:] if nxt != -1 else ""
        doc = doc[:start] + tail
    with open("/root/repo/RUNTIME.md", "w") as fh:
        fh.write(doc + "\n" + "\n".join(lines) + "\n")
    print("wrote RUNTIME.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
