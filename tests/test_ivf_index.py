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


def test_delete_rewrites_only_affected_cells(spark, tmp_path):
    """GDPR-delete shape: removing ids rewrites ONLY the cells that held
    them (file mtimes of an untouched cell are identical), clears cells
    left empty, keeps probes exact, and re-running is a no-op."""
    import glob
    import os

    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        delete_from_ivf_index,
    )

    emb, cents = _fixture(spark)
    table = "ivf_idx_delete"
    path = tmp_path / "ivf"
    write_ivf_index(emb, cents, table, str(path))
    try:
        assign = {
            r["vec_id"]: r["centroid_id"] for r in spark.table(table).collect()
        }
        by_cell: dict[int, list[int]] = {}
        for vid, c in assign.items():
            by_cell.setdefault(c, []).append(vid)
        cells_sorted = sorted(by_cell, key=lambda c: len(by_cell[c]))
        emptied_cell = cells_sorted[0]  # delete this cell ENTIRELY
        partial_cell = cells_sorted[-1]  # and 2 ids from the biggest
        untouched_cell = next(
            c for c in cells_sorted if c not in (emptied_cell, partial_cell)
        )
        victims = by_cell[emptied_cell] + by_cell[partial_cell][:2]

        def cell_files(c):
            return {
                f: os.path.getmtime(f)
                for f in glob.glob(str(path / f"centroid_id={c}" / "*"))
            }

        before_untouched = cell_files(untouched_cell)
        ids = spark.createDataFrame([(v,) for v in victims], "vec_id bigint")
        stats = delete_from_ivf_index(spark, table, ids)
        assert stats["n_deleted"] == len(victims)
        assert stats["cells_emptied"] == 1
        assert stats["cells_rewritten"] == 1
        # untouched cell: byte-identical files, not rewritten
        assert cell_files(untouched_cell) == before_untouched
        # emptied cell directory is gone
        assert not os.path.isdir(path / f"centroid_id={emptied_cell}")
        # table state: exactly the survivors
        left = {r["vec_id"] for r in spark.table(table).collect()}
        assert left == set(assign) - set(victims)
        # probes: deleted ids never surface; results match an in-plan IVF
        # over the surviving embeddings
        q = emb.filter(F.col("vec_id") == 5)
        got = [
            (r["vec_id"], round(r["cos_sim"], 6))
            for r in probe_ivf_index(spark, table, q, cents, k=5, nprobe=6).collect()
        ]
        surviving_emb = emb.filter(~F.col("vec_id").isin(victims))
        want = [
            (r["vec_id"], round(r["cos_sim"], 6))
            for r in ivf_cosine_topk(
                surviving_emb, q, cents, k=5, nprobe=6
            ).collect()
        ]
        assert got == want
        assert not any(v in {g for g, _ in got} for v in victims)
        # idempotent: repeating the delete changes nothing
        stats2 = delete_from_ivf_index(spark, table, ids)
        assert stats2 == {
            "n_deleted": 0, "cells_rewritten": 0, "cells_emptied": 0,
        }
        assert {r["vec_id"] for r in spark.table(table).collect()} == left
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
