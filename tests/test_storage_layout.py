"""Storage-layout techniques for scale: partitioned parquet writes with
partition pruning (plan-verified), and CSV/JSON round-trips for the text
tables (source/sink breadth beyond the reference's raw-text-only IO)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_events, load_table


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    load_events(spark, sf_dir).drop("ts").write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    want = load_events(spark, sf_dir).filter(F.col("event_type") == "click").count()
    assert back.count() == want


def test_csv_round_trip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_csv")
    docs.write.option("header", True).option("escape", '"').csv(out)
    back = spark.read.option("header", True).option("escape", '"').csv(
        out, inferSchema=True
    )
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_json_round_trip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_json")
    docs.write.json(out)
    back = spark.read.json(out)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_ivf_partitioned_write_prunes_probe(spark, sf_dir, tmp_path):
    """The IVF scale claim made concrete: write the assignment partitioned
    by centroid_id and a probe's cell filter becomes partition pruning —
    only the probed cell's files are read."""
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        ivf_assign,
        ivf_query_cells,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 18)).select(
        (F.col("vec_id") - 10).alias("centroid_id"), "embedding"
    )
    out = str(tmp_path / "ivf")
    ivf_assign(emb, cents, keep=("embedding",)).write.partitionBy(
        "centroid_id"
    ).parquet(out)

    table = spark.read.parquet(out)
    qcell = ivf_query_cells(
        emb.filter(F.col("vec_id") == 0), cents, nprobe=1
    ).collect()[0]["qcells"][0]
    probe = table.filter(F.col("centroid_id") == qcell)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "centroid_id" in plan.split("PartitionFilters")[1][:200]
    n_probe, n_total = probe.count(), table.count()
    assert 0 < n_probe < n_total
