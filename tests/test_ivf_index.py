"""Durable IVF index (operators/similarity.py:write_ivf_index /
probe_ivf_index): probe parity with the in-plan IVF, and the scale claim
— the probe's file scan reads ONLY the nprobe cell directories."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
    ivf_cosine_topk,
    probe_ivf_index,
    write_ivf_index,
)


def _fixture(spark, n=300, dim=8, k_cells=6, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = spark.createDataFrame(
        [(c, rows[c * 7][1]) for c in range(k_cells)],
        "centroid_id int, embedding array<float>",
    )
    return emb, cents


def test_probe_matches_inplan_ivf(spark, tmp_path):
    emb, cents = _fixture(spark)
    table = "ivf_idx_parity"
    write_ivf_index(emb, cents, table, str(tmp_path / "ivf"))
    try:
        q = emb.filter(F.col("vec_id") == 5)
        for nprobe in (1, 2):
            want = [
                (r["vec_id"], round(r["cos_sim"], 6))
                for r in ivf_cosine_topk(emb, q, cents, k=5, nprobe=nprobe).collect()
            ]
            for eager in (True, False):
                got = [
                    (r["vec_id"], round(r["cos_sim"], 6))
                    for r in probe_ivf_index(
                        spark, table, q, cents, k=5, nprobe=nprobe,
                        eager_cells=eager,
                    ).collect()
                ]
                assert got == want and len(got) == 5, (nprobe, eager)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_probe_prunes_to_nprobe_partitions(spark, tmp_path):
    emb, cents = _fixture(spark)
    table = "ivf_idx_prune"
    write_ivf_index(emb, cents, table, str(tmp_path / "ivf"))
    try:
        q = emb.filter(F.col("vec_id") == 5)
        probe = probe_ivf_index(spark, table, q, cents, k=5, nprobe=2)
        rows_total = spark.table(table).count()
        in_cells = probe  # force execution, then read the final metrics
        in_cells.collect()
        plan = in_cells._jdf.queryExecution().executedPlan().toString()
        # static pruning: the partition filter is a literal IN over the
        # probed cell ids (AQE-proof, unlike DPP — see probe_ivf_index)
        assert "PartitionFilters" in plan, plan
        # and the scan's output row count is the 2 probed cells only —
        # AQE-aware walk (query stages hide behind QueryStageExec nodes)
        jvm = spark._jvm

        def walk(n):
            yield n
            ch = n.children()
            for i in range(ch.size()):
                yield from walk(ch.apply(i))
            cls = n.getClass().getSimpleName()
            if "QueryStageExec" in cls:
                yield from walk(n.plan())
            if cls == "AdaptiveSparkPlanExec":
                yield from walk(n.finalPhysicalPlan())

        scans = []
        seen = set()
        for n in walk(in_cells._jdf.queryExecution().executedPlan()):
            if n.id() in seen:
                continue
            seen.add(n.id())
            if n.getClass().getSimpleName() == "FileSourceScanExec" and table in n.toString():
                jm = jvm.scala.collection.JavaConverters.mapAsJavaMap(n.metrics())
                for k in jm.keySet():
                    if k == "numOutputRows":
                        scans.append(jm.get(k).value())
        cell_rows = {
            r["centroid_id"]: r["n"]
            for r in spark.table(table)
            .groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        top2 = sum(sorted(cell_rows.values(), reverse=True)[:2])
        # every executed scan of the index read at most the 2 probed
        # cells' rows — never the full table
        assert scans, "no index FileScan found in executed plan"
        assert max(scans) <= top2 < rows_total
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_append_extends_probe_results(spark, tmp_path):
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        append_ivf_index,
    )

    emb, cents = _fixture(spark)
    base = emb.filter(F.col("vec_id") < 200)
    extra = emb.filter(F.col("vec_id") >= 200)
    table = "ivf_idx_append"
    write_ivf_index(base, cents, table, str(tmp_path / "ivf"))
    try:
        q = emb.filter(F.col("vec_id") == 5)
        before = {
            r["vec_id"]
            for r in probe_ivf_index(spark, table, q, cents, k=300, nprobe=6).collect()
        }
        append_ivf_index(extra, cents, table)
        after = {
            r["vec_id"]
            for r in probe_ivf_index(spark, table, q, cents, k=300, nprobe=6).collect()
        }
        # appended vectors are probe-able; nothing was lost
        assert before == set(range(200))
        assert after == set(range(300))
        # cell assignment of the appended rows matches a fresh full build
        full = "ivf_idx_append_full"
        write_ivf_index(emb, cents, full, str(tmp_path / "ivf_full"))
        try:
            a = sorted(
                (r["vec_id"], r["centroid_id"])
                for r in spark.table(table).collect()
            )
            b = sorted(
                (r["vec_id"], r["centroid_id"])
                for r in spark.table(full).collect()
            )
            assert a == b
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {full}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
