"""Round-6 fixes: kernel parity on degenerate inputs, index durability,
streaming replay idempotence."""

from __future__ import annotations

import math

from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
    cosine_scores,
    cosine_scores_vectorized,
)


def _emb_fixture(spark):
    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, [0.0, 0.0, 0.0]),  # zero-norm: cos undefined
        (3, [-1.0, 0.5, 2.0]),
        (4, [3.0, 2.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_vectorized_kernel_nulls_zero_norm_like_hof(spark):
    emb = _emb_fixture(spark)
    query = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0])], "vec_id bigint, embedding array<float>"
    )
    hof = {r["vec_id"]: r["cos_sim"] for r in cosine_scores(emb, query).collect()}
    vec = {
        r["vec_id"]: r["cos_sim"]
        for r in cosine_scores_vectorized(emb, query).collect()
    }
    assert set(hof) == set(vec) == {1, 2, 3, 4}
    # the zero vector must be NULL in BOTH kernels (Spark's non-ANSI
    # divide-by-zero), never nan/inf — nan sorts first under desc and
    # would flip top-k
    assert hof[2] is None and vec[2] is None
    for k in (1, 3, 4):
        assert hof[k] is not None and vec[k] is not None
        assert not math.isnan(vec[k])
        assert abs(hof[k] - vec[k]) < 1e-9


def test_vectorized_kernel_nulls_all_on_zero_query(spark):
    emb = _emb_fixture(spark)
    zq = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    hof = [r["cos_sim"] for r in cosine_scores(emb, zq).collect()]
    vec = [r["cos_sim"] for r in cosine_scores_vectorized(emb, zq).collect()]
    assert hof == [None] * 4
    assert vec == [None] * 4


def test_range_search_plan_has_no_exchange(spark, sf_dir):
    """sim_range_search is scan -> narrow map -> filter: a radius
    predicate needs no top-k reduction, so the whole plan must be
    shuffle-free."""
    from pagerank_giraph_vs_mapreduce_spark.plans.similarity_queries import (
        sim_range_search,
    )

    df = sim_range_search(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # the 1-row query vector travels by BroadcastExchange (fine); there
    # must be no SHUFFLE exchange anywhere
    assert "Exchange hashpartitioning" not in final, final
    assert "Exchange rangepartitioning" not in final, final


def test_stratified_sample_filter_pushes_to_scan(spark, sf_dir):
    """The md5 keep-predicate is row-local: it must sit in the scan
    stage (Filter directly over FileScan), not behind any exchange."""
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        pipeline_stratified_sample,
    )

    df = pipeline_stratified_sample(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final


def test_text_operators_survive_empty_documents(spark):
    """ANSI-mode robustness: at corpus scale empty documents exist, and a
    bare `/` with a zero denominator would abort the entire job. Every
    per-row text signal must come back (NULL where undefined), never
    throw."""
    from pagerank_giraph_vs_mapreduce_spark.operators.text import (
        fingerprints,
        language_id,
        quality_score,
        repetition_stats,
        token_stats,
    )

    d = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "the cat sat on the mat. 42 times.")],
        "doc_id bigint, text string",
    )
    q = {r["doc_id"]: r for r in quality_score(d, "doc_id", "text").collect()}
    assert q[1]["digit_ratio"] is None and q[1]["quality"] is None
    assert q[3]["digit_ratio"] is not None
    for fn in (token_stats, language_id, fingerprints, repetition_stats):
        assert fn(d, "doc_id", "text").count() == 3


def test_similarity_operators_survive_zero_vectors(spark):
    """Zero-norm embeddings must score NULL (and so never pair), not
    abort the scan under ANSI mode."""
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        embedding_near_dups,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (2, [0.0, 0.0, 0.0]),
            (3, [1.0, 2.0, 3.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    planes = emb.filter("vec_id = 1").selectExpr(
        "0 AS plane_id", "embedding"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, planes, threshold=0.99).collect()
    }
    assert (1, 3) in pairs
    assert not any(2 in p for p in pairs)


def test_python_datasource_partition_planning(spark):
    """The custom connector must expose real partition planning: 8
    independent id-range slices (the scale contract), correct rows."""
    from pagerank_giraph_vs_mapreduce_spark.sources.python_datasource import (
        register,
        synth_row,
    )

    register(spark)
    df = spark.read.format("synthetic_docs").option("n", "100").load()
    assert df.rdd.getNumPartitions() == 8
    got = {tuple(r) for r in df.collect()}
    assert got == {synth_row(i) for i in range(100)}


def test_wav_payloads_are_real_wave_files(spark):
    """synth_wav must emit RIFF/WAVE bytes any decoder opens."""
    import io
    import wave

    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        synth_wav,
    )

    docs = spark.createDataFrame([(7,), (123,)], "doc_id bigint")
    rows = {r["doc_id"]: bytes(r["wav"]) for r in synth_wav(docs).collect()}
    for doc_id, payload in rows.items():
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        with wave.open(io.BytesIO(payload), "rb") as w:
            assert w.getframerate() == 8000
            assert w.getnframes() == 100 + doc_id % 50


def test_warm_start_pagerank_converges_faster_same_fixpoint(spark):
    """Incremental-update shape: after adding edges, warm-starting from
    the previous fixpoint must reach the same ranks in fewer supersteps
    than a cold uniform init."""
    from tests.conftest import make_edges

    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank

    # skewed graph: the fixpoint must differ from uniform, else warm
    # init == cold init (a plain ring is degenerate that way)
    base_edges = [(i, (i * 7 + 3) % 60) for i in range(60)] + [
        (i, i % 10) for i in range(60)
    ]
    extra = [(i, (i * 11 + 5) % 60) for i in range(0, 60, 12)]
    base = make_edges(spark, base_edges)
    res0 = pagerank(base, max_iter=200, tol=1e-10, min_iter=2)
    updated = make_edges(spark, base_edges + extra)
    cold = pagerank(updated, max_iter=200, tol=1e-10, min_iter=2)
    warm = pagerank(
        updated, max_iter=200, tol=1e-10, min_iter=2,
        initial_ranks=res0.ranks,
    )
    assert warm.iterations < cold.iterations
    c = {r["id"]: r["pr"] for r in cold.ranks.collect()}
    w = {r["id"]: r["pr"] for r in warm.ranks.collect()}
    assert set(c) == set(w)
    assert all(abs(c[k] - w[k]) < 1e-7 for k in c)


def test_versioned_table_snapshot_isolation_and_vacuum(spark, tmp_path):
    """Crash-safety of the snapshot-versioned table: an uncommitted data
    dir (no manifest — simulated crash) is invisible to readers; vacuum
    reclaims it plus old versions; pinned reads survive later commits."""
    import os

    from pagerank_giraph_vs_mapreduce_spark.sources.versioned import (
        read_version,
        vacuum,
        versions,
        write_version,
    )

    base = str(tmp_path / "vt")
    d1 = spark.range(0, 10).withColumnRenamed("id", "k")
    d2 = spark.range(0, 25).withColumnRenamed("id", "k")
    assert write_version(d1, base) == 1
    assert write_version(d2, base) == 2
    # a crashed writer: data directory exists, manifest never renamed
    d1.write.parquet(os.path.join(base, "v3"))
    assert versions(base) == [1, 2]
    assert read_version(spark, base).count() == 25  # latest = v2, not v3
    assert read_version(spark, base, 1).count() == 10  # pinned v1 intact
    # inside the grace window the orphan is presumed in-flight and kept
    removed = vacuum(base, keep_last=2)
    assert removed == []  # both versions kept
    assert os.path.exists(os.path.join(base, "v3"))  # in-flight-safe
    # past the grace window it is crash garbage and reclaimed
    removed = vacuum(base, keep_last=2, orphan_grace_sec=0.0)
    assert removed == []
    assert not os.path.exists(os.path.join(base, "v3"))  # orphan reclaimed
    d3 = spark.range(0, 7).withColumnRenamed("id", "k")
    assert write_version(d3, base) == 3
    assert read_version(spark, base).count() == 7
    assert vacuum(base, keep_last=1) == [1, 2]
    assert versions(base) == [3]


def test_streaming_dedup_bootstrap_replays_over_partial_files(spark, tmp_path):
    """Crash between the bootstrap data write and its catalog commit
    leaves partial files at index_path with no table; the replayed batch
    must re-bootstrap over them, not error on a non-empty dir."""
    from pagerank_giraph_vs_mapreduce_spark.streaming.incremental_dedup import (
        process_batch,
    )

    idx_path = str(tmp_path / "idx")
    # partial files from the "crashed" first attempt
    spark.range(3).write.parquet(idx_path)
    spark.sql("DROP TABLE IF EXISTS sid_replay_idx")
    b0 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id bigint, text string",
    )
    try:
        process_batch(
            b0, 0,
            index_table="sid_replay_idx",
            index_path=idx_path,
            dup_table="sid_replay_dups",
            dup_path=str(tmp_path / "dups"),
            buckets=4,
        )
        assert spark.table("sid_replay_idx").count() == 4  # 1 doc x 4 bands
    finally:
        for t in ("sid_replay_idx", "sid_replay_dups"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stratified_sample_invariant_to_partitioning(spark, sf_dir):
    """The md5 keep-predicate must select the SAME rows regardless of
    physical layout — the reproducibility claim rng TABLESAMPLE cannot
    make."""
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        pipeline_stratified_sample,
    )

    a = {r["doc_id"] for r in pipeline_stratified_sample(spark, sf_dir).collect()}
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(13)
        .select("doc_id", "source")
    )
    thr = (
        "substr('0123456789abcdef', ((ascii(substr(source,1,1)) % 5) + 1) + 1, 1)"
    )
    from pyspark.sql import functions as F

    b = {
        r["doc_id"]
        for r in docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < F.expr(thr)
        ).collect()
    }
    assert a == b and len(a) > 0


def test_versioned_streaming_sink_exactly_once(spark, tmp_path):
    """foreachBatch -> versioned sink: each micro-batch commits one
    tagged version; a replayed batch_id is a no-op, so the union of
    versions equals the input exactly once even under replay."""
    from pagerank_giraph_vs_mapreduce_spark.sources.versioned import (
        committed_tags,
        read_all_versions,
        versions,
        write_version_tagged,
    )

    import glob
    import os
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    for i, t in enumerate((1_700_000_000, 1_700_000_060)):
        staging = str(tmp_path / f"stage{i}")
        spark.range(i * 10, i * 10 + 10).coalesce(1).write.parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        dest = str(src / f"b{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (t, t))
    base = str(tmp_path / "sink")
    seen = []

    def handle(batch, batch_id):
        seen.append(batch_id)
        write_version_tagged(batch, base, tag=batch_id)

    stream = spark.readStream.schema("id bigint").parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    assert len(versions(base)) >= 1
    total = read_all_versions(spark, base).count()
    assert total == 20
    # replay every batch: all no-ops
    for bid in seen:
        assert write_version_tagged(spark.range(5), base, tag=bid) is None
    assert read_all_versions(spark, base).count() == 20
    assert committed_tags(base) == set(seen) or committed_tags(base) <= set(seen)
