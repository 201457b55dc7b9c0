"""Measured runtime metrics per query: actual shuffle bytes/records and
scan output rows from the executed (AQE-final) physical plan's SQLMetrics
— the ground truth behind PLANS.md's static audit. A query whose static
plan shows one exchange but whose measured shuffle is corpus-sized is a
scale bug the static audit can't see; this tool writes RUNTIME.md so
both views sit in the repo.

Usage: python tools/runtime_metrics.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pagerank_giraph_vs_mapreduce_spark.plans.registry import (  # noqa: E402
    QUERIES,
    load_all_queries,
)
from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402

# Queries whose shuffle volume is the scale story: dedup candidate
# routing, ANN probes, the composed pipeline, pack/window shapes, and
# the big TPC-H joins.
DEFAULT = [
    "rel_q1_pricing",
    "rel_join_q3",
    "rel_q9_product_profit",
    "rel_q21_waiting_supplier",
    "dedup_minhash_near_dups",
    "dedup_incremental_indexed",
    "dedup_semantic",
    "sim_lsh_ann_top5",
    "sim_range_search",
    "text_tfidf_top_term",
    "pipeline_curation",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
    "mm_audio_stats",
    "dedup_lsh_star_candidates",
    "storage_bucketed_join",
    "rel_bloom_semi_join",
    # (iterative kernels like g_sssp_k4 materialize via localCheckpoint
    # mid-run, so the returned frame's SQLMetrics are empty — excluded)
    "text_repeated_ngrams",
    "sql_pivot",
    "sim_ivf_indexed_top5",
    "pipeline_rag_retrieve",
    # round-7 additions
    "pipeline_rag_retrieve_encoder",
    "mm_jpeg_decode",
    # round-7 third/fourth waves
    "dedup_cdc_chunks",
    "g_link_adamic_adar",
    "sim_matryoshka_rerank",
    "sim_binary_rerank",
    "mm_ahash_pairs",
    "pipeline_shuffle_shards",
    "pipeline_corpus_build",
    # round-8
    "g_link_aa_pervertex",
    "pipeline_weighted_sample",
    "pipeline_domain_cap",
    "fn_cms_heavy_hitters",
    "fn_kmv_distinct",
    "rel_exact_quantiles",
    "pipeline_k_anonymity",
    "mm_jpeg_progressive_decode",
    # round-9
    "rel_outlier_mad",
    "rel_resample_gapfill",
    "fn_kmv_set_ops",
    "mm_ivf_frames",
    "pipeline_train_quality_lr_mb",
    # round-10
    "g_square_count",
    "g_link_jaccard",
    "rel_profile_columns",
    "pipeline_url_dedup",
    "rel_win_ewma8",
    "mm_scene_cuts",
    "pipeline_model_auc",
    "pipeline_span_corrupt",
    "rel_asof_join_tol",
    "rel_er_fuzzy_join",
    "fn_quantile_sketch",
    "rel_skyline_2d",
    "text_pmi_bigrams",
    "g_degree_gini",
    "rel_assoc_rules",
    "g_matching_r3",
    "g_coarsen_r3",
]


def walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from walk(ch.apply(i))
    cls = node.getClass().getSimpleName()
    if "QueryStageExec" in cls:
        yield from walk(node.plan())
    if cls == "AdaptiveSparkPlanExec":
        yield from walk(node.finalPhysicalPlan())
    if cls == "InMemoryTableScanExec":
        try:
            yield from walk(node.relation().cachedPlan())
        except Exception:
            pass


def measure(spark, name: str, sf_dir: str) -> dict:
    df = QUERIES[name](spark, sf_dir)
    # collect() on THIS DataFrame: metrics live on the executed plan's
    # own SQLMetric objects — a count() would execute a different query
    # and leave this plan's scan metrics at zero
    n_rows = len(df.collect())
    jvm = spark._jvm
    plan = df._jdf.queryExecution().executedPlan()
    shuffle_bytes = 0
    shuffle_records = 0
    scan_rows = 0
    n_exchanges = 0
    seen = set()
    for n in walk(plan):
        nid = n.id()
        if nid in seen:  # AQE reuse / repeated subtrees
            continue
        seen.add(nid)
        cls = n.getClass().getSimpleName()
        jm = jvm.scala.collection.JavaConverters.mapAsJavaMap(n.metrics())
        if cls == "ShuffleExchangeExec":
            n_exchanges += 1
            for k in jm.keySet():
                if k == "shuffleBytesWritten":
                    shuffle_bytes += jm.get(k).value()
                elif k == "shuffleRecordsWritten":
                    shuffle_records += jm.get(k).value()
        elif cls in ("FileSourceScanExec", "ColumnarToRowExec"):
            if cls == "FileSourceScanExec":
                for k in jm.keySet():
                    if k == "numOutputRows":
                        scan_rows += jm.get(k).value()
    return {
        "rows_out": n_rows,
        "exchanges": n_exchanges,
        "shuffle_records": shuffle_records,
        "shuffle_mb": round(shuffle_bytes / 1e6, 3),
        "scan_rows": scan_rows,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    load_all_queries()
    spark = get_spark(cpus=8, shuffle_partitions=8)
    lines = [
        "# RUNTIME — measured shuffle/scan metrics (SQLMetrics, AQE-final plans)",
        "",
        f"Generated by tools/runtime_metrics.py at {sf_dir}.",
        "`shuffle_mb` is actual bytes written to shuffle across ALL exchanges",
        "(post-compression) — the quantity that must stay sub-corpus-sized at",
        "100 TB. `scan_rows` is rows out of the parquet scans (pushdown proof).",
        "",
        "| query | rows out | exchanges | shuffle records | shuffle MB | scan rows |",
        "|---|---|---|---|---|---|",
    ]
    for name in names:
        m = measure(spark, name, sf_dir)
        lines.append(
            f"| {name} | {m['rows_out']} | {m['exchanges']} | "
            f"{m['shuffle_records']} | {m['shuffle_mb']} | {m['scan_rows']} |"
        )
        print("measured", name, m)
    # Preserve EVERY appended "## " section (the spot-run tools own them;
    # their measurements are independent, expensive artifacts). Keying on
    # one section's name dropped whichever sections happened to precede it
    # in the file — "\n## sf1 spot-run" even prefix-matched a DIFFERENT
    # section's longer title — so preserve from the first heading onward.
    tail = ""
    try:
        with open("/root/repo/RUNTIME.md") as fh:
            doc = fh.read()
        marker = "\n## "
        if marker in doc:
            tail = doc[doc.index(marker) :]
    except OSError:
        pass
    with open("/root/repo/RUNTIME.md", "w") as fh:
        fh.write("\n".join(lines) + "\n" + tail)
    print("wrote RUNTIME.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
