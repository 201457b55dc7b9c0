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
