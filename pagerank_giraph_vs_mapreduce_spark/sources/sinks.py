"""Output sinks matching the reference's file contracts (S6-S9, FIXTURES.md F4).

- final_scores: ``id\tpr`` lines, pr formatted %.10f (the reference's final
  merge+strip pass, MR/PageRankDriver.java:323-350; C4 formatting
  MR/PageRankReducer.java:119). Intermediate iterations are NOT written —
  keeping state cached instead of HDFS-round-tripping it is the entire
  Giraph-vs-MR lesson (README.md:256-257).
- top-k: ``id\tscore`` descending (MR/PageRankDriver.java:352-384).
- timings CSV: ``Phase,Duration_ms`` (GI/PageRankMasterCompute.java:125-143;
  MR/PerformanceMonitor.java:83-99).
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import PageRankResult, top_k


def write_final_scores(ranks: DataFrame, path: str, coalesce: int | None = None) -> None:
    """S8: ``id\tpr`` TSV. ``coalesce=1`` reproduces the reference's single
    merged part file; leave None at scale (one file per partition)."""
    out = ranks.select(
        F.col("id").cast("string").alias("id"),
        F.format_string("%.10f", F.col("pr")).alias("pr"),
    )
    if coalesce:
        out = out.coalesce(coalesce)
    out.write.mode("overwrite").option("sep", "\t").csv(path)


def write_top_k(ranks: DataFrame, path: str, k: int = 50) -> None:
    """T1 sink: top-k is tiny by construction, single file is correct."""
    (
        top_k(ranks, k)
        .select(
            F.col("id").cast("string").alias("id"),
            F.format_string("%.10f", F.col("pr")).alias("score"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .csv(path)
    )


def write_timings_csv(result: PageRankResult, path: str) -> None:
    """O1/S9: driver-side metrics dict → ``Phase,Duration_ms`` CSV.

    Mirrors the reference's per-phase rows: a Setup row (graph build —
    Giraph setup timing, GI/PageRankMasterCompute.java:59-64) and, per
    superstep, the total plus its plan/compute/stats split (the MR
    setup/map/reduce wall report, MR/PerformanceMonitor.java:49-99).
    """

    def ms(s: float) -> float:
        return round(s * 1000.0, 3)

    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["Phase", "Duration_ms"])
        w.writerow(["Setup", ms(result.build_seconds)])
        for it in result.history:
            w.writerow([f"Superstep_{it.iteration}", ms(it.seconds)])
            w.writerow([f"Superstep_{it.iteration}_plan", ms(it.plan_seconds)])
            if it.compute_seconds:
                w.writerow(
                    [f"Superstep_{it.iteration}_compute", ms(it.compute_seconds)]
                )
            w.writerow([f"Superstep_{it.iteration}_stats", ms(it.stats_seconds)])


def write_performance_report(result: PageRankResult, path: str) -> None:
    """S9: human-readable run report — the ``performance_report.txt``
    analog (MR/PerformanceMonitor.java:83-99: named phases, per-iteration
    breakdown, totals). Same numbers as _timings.csv, formatted for eyes.
    """
    hist = result.history
    total_iter = sum(it.seconds for it in hist)
    lines = [
        "PageRank Performance Report",
        "===========================",
        f"vertices:            {result.n_vertices}",
        f"iterations:          {result.iterations}"
        f" ({'converged' if result.converged else 'max-iterations reached'})",
        f"setup (graph build): {result.build_seconds * 1000.0:10.1f} ms",
        f"iteration total:     {total_iter * 1000.0:10.1f} ms",
        f"wall total:          {(result.build_seconds + total_iter) * 1000.0:10.1f} ms",
        "",
        "Iteration  Total_ms    Plan_ms Compute_ms  Stats_ms    AvgDiff      TotalPR",
    ]
    for it in hist:
        lines.append(
            f"{it.iteration:>9}  {it.seconds * 1000.0:8.1f}  "
            f"{it.plan_seconds * 1000.0:9.1f}  {it.compute_seconds * 1000.0:9.1f}  "
            f"{it.stats_seconds * 1000.0:8.1f}  {it.avg_diff:.3e}  {it.total_pr:.9f}"
        )
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def compact_parquet(
    spark,
    in_dir: str,
    out_dir: str,
    target_file_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dir into ~``target_file_mb``
    files, optionally sorted within files for row-group pruning.

    The small-files problem is the dominant operational failure of long-
    running ingestion at scale (every micro-batch/task writes a file; a
    100 TB table ingested in 1 MB files is 10^8 files — listing alone
    breaks). Compaction = read → repartition to ceil(bytes/target) →
    write. ``sort_by`` applies sortWithinPartitions so min/max row-group
    stats become selective (poor-man's clustering; at cluster scale use
    repartitionByRange on the same keys for global clustering).

    Returns the number of output partitions chosen.
    """
    import math

    from pyspark.sql import functions as F  # noqa: F401

    df = spark.read.parquet(in_dir)
    # Size from the files Spark actually scanned (driver-side listing).
    jvm_files = spark._jvm.org.apache.hadoop.fs.Path(in_dir)
    fs = jvm_files.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jvm_files).getLength()
    n_parts = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartition(n_parts).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_parts)
    out.write.mode("overwrite").parquet(out_dir)
    return n_parts


def zvalue_col(a, b, bits: int = 16):
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns (a's bit i lands at position 2i+1, b's at
    2i). Pure JVM-side shift/mask expression — one codegen'd projection,
    no UDF. Points close in (a, b) space get close z-values, so range-
    partitioning + sorting by z clusters BOTH dimensions at once.

    WIDTH CONTRACT: inputs must be in [0, 2**bits); values outside alias
    to unrelated z-keys (the high bits are silently ignored, negatives
    interleave their two's-complement low bits), which quietly destroys
    the clustering property. ``write_zordered`` asserts the bound at
    write time; callers using this column directly should bound-check or
    widen ``bits`` themselves (bits <= 31 keeps 2*bits in BIGINT range)."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bbit, 2 * i)
        )
    return z


def write_zordered(
    df: DataFrame,
    out_dir: str,
    c1: str,
    c2: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order clustered parquet layout: repartitionByRange + sort on the
    Morton key of (c1, c2), so every output file covers a tight rectangle
    in BOTH columns and parquet min/max footer stats prune 2-D predicates.

    Single-column sorting (compact_parquet's sort_by) makes only that
    column's stats selective; at 100 TB, tables queried on two independent
    dimensions (e.g. partkey x suppkey, user x time) need multi-dimensional
    clustering or every file intersects one of the two predicates. The
    range-exchange on z is the one shuffle; the sort is within partitions.

    Enforces zvalue_col's width contract (both columns in [0, 2**bits))
    with an in-plan assertion: out-of-range values would silently alias
    z-keys and destroy the clustering this writer promises, so the write
    fails instead. raise_error costs one codegen'd comparison per row.
    """
    hi = F.lit(1 << bits).cast("bigint")
    in_range = (
        (F.col(c1).cast("bigint") >= 0)
        & (F.col(c1).cast("bigint") < hi)
        & (F.col(c2).cast("bigint") >= 0)
        & (F.col(c2).cast("bigint") < hi)
    )
    z = F.when(in_range, zvalue_col(F.col(c1), F.col(c2), bits)).otherwise(
        F.raise_error(
            F.lit(
                f"write_zordered: {c1}/{c2} outside [0, 2**{bits}) — "
                "z-keys would alias; widen bits"
            )
        ).cast("bigint")
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
