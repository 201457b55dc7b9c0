"""sf1-scale (10x) spot-run for the GRAPH headliners — VERDICT r08 item 9.

The document-table spot-run (tools/sf1_spotrun.py) reads per-plan
SQLMetrics, which iterative graph kernels can't use: every peel round /
superstep materializes through localCheckpoint, so the returned frame's
plan carries no metrics. This tool instead reads CUMULATIVE stage-level
shuffle write bytes/records from the AppStatusStore and takes a
before/after delta around each run — the sum over every stage the kernel
executed, checkpoint materializations included.

Scale fixture: 10 DISJOINT copies of the sf0.1 graph (vertex ids offset
by a stride per copy). Density is held fixed — exactly what a 10x web
crawl does (mostly new pages, same local structure) — so a linear plan
shows ~10x shuffle; growing density instead would inflate the
triangle/path counts by the MATH of the operators and mislabel the plan.
Betweenness also replicates its source set into every copy (same
sources-per-edge ratio), so its work is 10x by construction iff the plan
is linear in (sources x edges-within-horizon).

Appends an '## sf1 graph spot-run' section to RUNTIME.md.

Usage: python tools/sf1_graph_spotrun.py [factor]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def shuffle_totals(spark) -> tuple[int, int]:
    """Cumulative (bytes, records) shuffle-written across ALL stages the
    app has run (AppStatusStore; survives localCheckpoint boundaries)."""
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
    """factor disjoint copies, vertex ids offset by STRIDE per copy."""
    out = edges
    for i in range(1, factor):
        out = out.unionAll(
            edges.select(
                (F.col("src") + STRIDE * i).alias("src"),
                (F.col("dst") + STRIDE * i).alias("dst"),
            )
        )
    return out


def run_measured(spark, fn) -> dict:
    b0, r0 = shuffle_totals(spark)
    t0 = time.monotonic()
    rows = fn()
    sec = time.monotonic() - t0
    b1, r1 = shuffle_totals(spark)
    spark.catalog.clearCache()
    return {
        "rows": rows,
        "sec": round(sec, 1),
        "shuffle_records": r1 - r0,
        "shuffle_mb": round((b1 - b0) / 1e6, 3),
    }


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(cpus="8", shuffle_partitions=32)

    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        adamic_adar_pervertex,
        ktruss_edges,
    )
    from pagerank_giraph_vs_mapreduce_spark.graph.paths import (
        truncated_betweenness,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.graph_queries import (
        AA_HUB_CAP,
        AA_PV_K,
        MULTI_SOURCES,
        TRUSS_DST_MOD,
        TRUSS_SRC_MOD,
        _truss_edges,
    )
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import derived_edges

    truss1 = _truss_edges(spark, BASE, TRUSS_SRC_MOD, TRUSS_DST_MOD)
    der1 = derived_edges(spark, BASE)
    srcs1 = list(MULTI_SOURCES)

    def srcs_for(f: int) -> list[int]:
        return [s + STRIDE * i for i in range(f) for s in srcs1]

    # AA on the derived sf0.1 graph is a null plan (uniform density ~704
    # puts every transit vertex past the hub cap — the bench uses a
    # power-law graph for the same reason); measure the operator on the
    # shape it exists for.
    def powerlaw(n_v: int, n_e: int, seed: int = 11):
        e = spark.range(n_e)
        return e.select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(seed))) % n_v).alias("src"),
            F.least(
                F.lit(n_v - 1),
                F.floor(
                    n_v
                    * F.pow(
                        (
                            F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1)))
                            % 1_000_000
                            + 1
                        )
                        / 1_000_000.0,
                        F.lit(2.5),
                    )
                ),
            )
            .cast("long")
            .alias("dst"),
        )

    pl1 = powerlaw(100_000, 500_000)

    entries = [
        (
            "g_ktruss4_r3",
            lambda f, e=truss1: ktruss_edges(
                replicate(e, f), k=4, rounds=3
            ).count(),
        ),
        (
            "g_betweenness_k3",
            lambda f, e=der1: truncated_betweenness(
                replicate(e, f), srcs_for(f), max_hops=3
            ).count(),
        ),
        (
            "g_link_aa_pervertex (powerlaw 100k/500k)",
            lambda f, e=pl1: adamic_adar_pervertex(
                replicate(e, f), hub_cap=AA_HUB_CAP, k=AA_PV_K
            ).count(),
        ),
    ]

    lines = [
        "",
        f"## sf1 graph spot-run (disjoint copies x1/x{factor // 2}/x{factor},"
        " tools/sf1_graph_spotrun.py)",
        "",
        "Volume linearity for the iterative graph headliners. Shuffle is the",
        "stage-level cumulative delta (AppStatusStore) around each run —",
        "SQLMetrics are empty for kernels that localCheckpoint per round.",
        "Fixture: DISJOINT id-offset copies of the sf0.1 graph (density held",
        "fixed — a denser graph would grow triangle/path counts by the",
        "operator's math, not the plan's shape); betweenness replicates its",
        "source set into every copy; AA runs on the power-law graph its hub",
        "cap exists for (the uniform derived graph nulls its transit set).",
        f"The x1 point can sit in a different AQE regime (broadcast joins",
        f"that no longer fit at scale), so the x{factor // 2} -> x{factor}",
        "growth WITHIN the shuffle regime is the linearity verdict; 2.0x",
        "there = linear.",
        "",
        f"| kernel | rows x1/x{factor // 2}/x{factor}"
        f" | shuffle records x1/x{factor // 2}/x{factor}"
        f" | shuffle MB x1/x{factor // 2}/x{factor} (f{factor // 2}->f{factor})"
        f" | sec x1/x{factor // 2}/x{factor} |",
        "|---|---|---|---|---|",
    ]

    for name, run in entries:
        ms = [run_measured(spark, lambda f=f: run(f)) for f in (1, factor // 2, factor)]

        def ratio(a, b):
            return f"{b / a:.2f}x" if a else "n/a"

        lines.append(
            f"| {name} "
            f"| {' / '.join(str(m['rows']) for m in ms)} "
            f"| {' / '.join(str(m['shuffle_records']) for m in ms)} "
            f"| {' / '.join(str(m['shuffle_mb']) for m in ms)} "
            f"({ratio(ms[1]['shuffle_mb'], ms[2]['shuffle_mb'])}) "
            f"| {' / '.join(str(m['sec']) for m in ms)} |"
        )
        print("measured", name, ms, flush=True)

    # splice out ONLY the prior section of the same name (up to the next
    # "\n## " heading), keeping any sections other tools appended after it
    with open("/root/repo/RUNTIME.md") as fh:
        doc = fh.read()
    marker = "\n## sf1 graph spot-run"
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
