"""Scale spot-run for the round-10 wedge motifs (square_count,
jaccard_topk) — the sf1_graph_spotrun methodology (disjoint id-offset
copies, cumulative stage-level shuffle deltas) applied to the two new
common-neighbor kernels on the power-law graph their hub caps exist for.

Disjoint copies give these operators an INTEGER invariant on top of
volume linearity: n_squares must be EXACTLY factor * x1 (no cross-copy
wedge can exist), and the top-20 jaccard scores must be the x1 scores
repeated — both asserted here, so a superlinear plan OR a cross-copy
leak fails loudly rather than showing up as a soft ratio.

Appends an '## sf1 wedge-motif spot-run' section to RUNTIME.md.

Usage: python tools/sf1_wedge_spotrun.py [factor]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402
from tools.sf1_graph_spotrun import (  # noqa: E402
    STRIDE,
    replicate,
    shuffle_totals,
)


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(cpus="8", shuffle_partitions=32)

    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        jaccard_topk,
        square_count,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.graph_queries import (
        AA_HUB_CAP,
        SQ_HUB_CAP,
    )

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

    def run_squares(f: int) -> int:
        row = square_count(replicate(pl1, f), hub_cap=SQ_HUB_CAP).collect()[0]
        return int(row["n_squares"])

    def run_jaccard(f: int):
        return [
            (r["a"] % STRIDE, r["b"] % STRIDE, r["jaccard"])
            for r in jaccard_topk(
                replicate(pl1, f), hub_cap=AA_HUB_CAP, k=20
            ).collect()
        ]

    def measured(fn, f):
        b0, r0 = shuffle_totals(spark)
        t0 = time.monotonic()
        out = fn(f)
        sec = time.monotonic() - t0
        b1, r1 = shuffle_totals(spark)
        spark.catalog.clearCache()
        return out, {
            "sec": round(sec, 1),
            "shuffle_records": r1 - r0,
            "shuffle_mb": round((b1 - b0) / 1e6, 3),
        }

    factors = (1, factor // 2, factor)
    sq_vals, sq_ms = [], []
    for f in factors:
        v, m = measured(run_squares, f)
        sq_vals.append(v)
        sq_ms.append(m)
        print("squares", f, v, m, flush=True)
    # disjoint-copy integer invariant: EXACT multiplication or the plan leaks
    assert sq_vals[1] == sq_vals[0] * factors[1], sq_vals
    assert sq_vals[2] == sq_vals[0] * factors[2], sq_vals

    jc_vals, jc_ms = [], []
    for f in factors:
        v, m = measured(run_jaccard, f)
        jc_vals.append(sorted(v))
        jc_ms.append(m)
        print("jaccard", f, m, flush=True)
    # the top-20 is the x1 top-20 re-drawn from identical copies: modulo the
    # id offset, every returned (a, b, score) must already exist at x1
    base = {(a, b, s) for a, b, s in jc_vals[0]}
    for f_i, vals in enumerate(jc_vals[1:], 1):
        assert all((a, b, s) in base for a, b, s in vals), (factors[f_i], vals[:3])

    def ratio(a, b):
        return f"{b / a:.2f}x" if a else "n/a"

    lines = [
        "",
        f"## sf1 wedge-motif spot-run (disjoint copies x1/x{factors[1]}/x{factors[2]},"
        " tools/sf1_wedge_spotrun.py)",
        "",
        "The round-10 common-neighbor kernels on the 100k/500k power-law",
        "graph (the derived sf0.1 graph's uniform density ~704 nulls their",
        "hub caps). Disjoint copies add INTEGER invariants the tool asserts",
        "before writing this table: n_squares is exactly factor * x1, and",
        "every top-20 jaccard row at scale is an x1 row modulo the id",
        "offset — a superlinear plan or cross-copy leak fails the run.",
        "",
        f"| kernel | value x1/x{factors[1]}/x{factors[2]}"
        f" | shuffle records x1/x{factors[1]}/x{factors[2]}"
        f" | shuffle MB (f{factors[1]}->f{factors[2]})"
        f" | sec x1/x{factors[1]}/x{factors[2]} |",
        "|---|---|---|---|---|",
        f"| g_square_count (n_squares) "
        f"| {' / '.join(str(v) for v in sq_vals)} "
        f"| {' / '.join(str(m['shuffle_records']) for m in sq_ms)} "
        f"| {' / '.join(str(m['shuffle_mb']) for m in sq_ms)} "
        f"({ratio(sq_ms[1]['shuffle_mb'], sq_ms[2]['shuffle_mb'])}) "
        f"| {' / '.join(str(m['sec']) for m in sq_ms)} |",
        f"| g_link_jaccard (top-20) "
        f"| 20 / 20 / 20 "
        f"| {' / '.join(str(m['shuffle_records']) for m in jc_ms)} "
        f"| {' / '.join(str(m['shuffle_mb']) for m in jc_ms)} "
        f"({ratio(jc_ms[1]['shuffle_mb'], jc_ms[2]['shuffle_mb'])}) "
        f"| {' / '.join(str(m['sec']) for m in jc_ms)} |",
    ]

    with open("/root/repo/RUNTIME.md") as fh:
        doc = fh.read()
    marker = "\n## sf1 wedge-motif spot-run"
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
