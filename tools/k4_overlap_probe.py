"""A/B probe for multilevel_partition_k4's side-bisection overlap
(OPTIMIZATION_r13.md change #4, guide §2.6).

Arm "threaded" runs the shipped code (2-thread pool over the two side
bisections). Arm "serial" pins motifs.K4_SIDE_POOL_WORKERS = 1 — the
call-site constant the pool reads — restoring the pre-change serial
schedule without touching the tree (r13 ADVICE: the previous global
ThreadPoolExecutor monkey-patch also capped PySpark's own pools, a
confound). Both arms compute the full k4 assignment on the sf0.1
derived graph and foot the identical result (count + assignment
checksum printed so the A/B also asserts result-equality run to run).

Usage: python tools/k4_overlap_probe.py {threaded|serial}
One arm per process (fresh JVM per measurement); alternate arms across
runs when collecting pairs.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    arm = sys.argv[1] if len(sys.argv) > 1 else "threaded"
    if arm not in ("threaded", "serial"):
        raise SystemExit(f"unknown arm {arm!r}")

    if arm == "serial":
        from pagerank_giraph_vs_mapreduce_spark.graph import motifs

        motifs.K4_SIDE_POOL_WORKERS = 1

    from pagerank_giraph_vs_mapreduce_spark.session import get_spark
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import derived_edges
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        multilevel_partition_k4,
    )
    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"k4-overlap-{arm}")
    spark.range(1000).count()  # JVM warmup outside the timed region

    sf_dir = "/root/testdata/sf0.1"
    t0 = time.monotonic()
    parts = multilevel_partition_k4(derived_edges(spark, sf_dir))
    chk = parts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id") * 4 + F.col("part")).alias("checksum"),
    ).collect()[0]
    wall = time.monotonic() - t0
    print(
        f"K4_PROBE arm={arm} wall_sec={wall:.3f} "
        f"n={chk['n']} checksum={chk['checksum']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
