"""compact_parquet: many small files -> few target-size files, content-preserving."""

from __future__ import annotations

from pagerank_giraph_vs_mapreduce_spark.sources.sinks import compact_parquet


def test_compact_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "fragmented")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(64).write.parquet(frag)  # 64 tiny files
    out = str(tmp_path / "compacted")
    n_parts = compact_parquet(spark, frag, out, target_file_mb=256)
    assert n_parts == 1  # sf0.001 lineitem is far below 256 MB
    got = spark.read.parquet(out)
    assert got.count() == li.count()
    assert set(got.columns) == set(li.columns)
    import glob
    assert len(glob.glob(f"{out}/part-*.parquet")) == 1


def test_compact_sorted_rowgroups(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag2")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(16).write.parquet(frag)
    out = str(tmp_path / "sorted")
    compact_parquet(spark, frag, out, target_file_mb=64, sort_by=["o_orderkey"])
    rows = spark.read.parquet(out).collect()
    # verify within-file ordering by reading back a single file directly
    import glob
    one = glob.glob(f"{out}/part-*.parquet")[0]
    keys = [r["o_orderkey"] for r in spark.read.parquet(one).collect()]
    assert keys == sorted(keys)
    assert len(rows) == 1500 or len(rows) > 0
