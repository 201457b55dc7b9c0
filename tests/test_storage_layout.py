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


def _file_bounds(out_dir, cols):
    import glob

    import pyarrow.parquet as pq

    bounds = []
    for f in sorted(glob.glob(f"{out_dir}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins: dict = {c: None for c in cols}
        maxs: dict = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = (
                        st.min if mins[name] is None else min(mins[name], st.min)
                    )
                    maxs[name] = (
                        st.max if maxs[name] is None else max(maxs[name], st.max)
                    )
        bounds.append((mins, maxs))
    return bounds


def test_zorder_layout_prunes_2d_predicates(spark, sf_dir, tmp_path):
    """write_zordered beats a wrong-column clustering on 2-D file skipping:
    with footer min/max as the pruning signal (what any lakehouse scanner
    uses), a narrow partkey x suppkey predicate must intersect fewer
    z-ordered files than files clustered by the unrelated l_orderkey."""
    from pagerank_giraph_vs_mapreduce_spark.sources.sinks import write_zordered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zout = str(tmp_path / "zord")
    write_zordered(li, zout, "l_partkey", "l_suppkey", n_files=8)
    ctrl = str(tmp_path / "bykey")
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(ctrl)
    )
    cols = {"l_partkey", "l_suppkey"}
    # predicate: l_partkey BETWEEN 0 AND 24 AND l_suppkey BETWEEN 0 AND 2
    def n_files_hit(out_dir):
        n = 0
        for mins, maxs in _file_bounds(out_dir, cols):
            if (
                mins["l_partkey"] <= 24
                and maxs["l_partkey"] >= 0
                and mins["l_suppkey"] <= 2
                and maxs["l_suppkey"] >= 0
            ):
                n += 1
        return n

    assert len(_file_bounds(zout, cols)) == 8
    assert n_files_hit(zout) < n_files_hit(ctrl)
    # layout change preserves content
    assert spark.read.parquet(zout).count() == li.count()


def test_zvalue_interleaves_bits(spark):
    from pagerank_giraph_vs_mapreduce_spark.sources.sinks import zvalue_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (5, 2)], "a bigint, b bigint"
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zvalue_col(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    # a's bit i -> position 2i+1, b's bit i -> position 2i
    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
        return z

    assert got == {(a, b): morton(a, b) for (a, b) in got}
