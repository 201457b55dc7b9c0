"""Generate PLANS.md: physical-plan quality evidence for the headline
queries — pushdown, pruned read schemas, join strategies, codegen spans.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pagerank_giraph_vs_mapreduce_spark.plans.registry import (  # noqa: E402
    QUERIES,
    load_all_queries,
)
from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "rel_q6_forecast",
    "rel_q1_pricing",
    "rel_join_q3",
    "rel_broadcast_dim_join",
    "rel_q18_large_orders",
    "g_gather_sum",
    "dedup_minhash_sig",
    "sim_cosine_top10",
    "win_tumbling_15m",
    "asof_click_purchase",
    "range_join_signup_errors",
    "fn_hash_sample",
    "sql_higher_order",
    "g_triangle_count",
    "g_two_hop_count",
    "g_degree_hist",
    "mm_frame_sample",
    "fn_stats_agg",
    "dedup_simhash_near_dups",
    "sim_ann_recall",
    "sim_kmeans_2iter",
    "g_kcore64_r4",
    "sim_ivf_assign",
    "sim_ivf_top5_nprobe2",
    "pipeline_curation",
    "pipeline_curation_funnel",
    "text_vocab_top20",
    "text_chunks",
    "g_lpa_r3",
    "rel_q5_local_supplier",
    "text_tfidf_top_term",
    "text_feature_hash_64",
    "sql_map_funcs",
    "rel_user_funnel",
    "pipeline_chunk_dedup",
    # round-4 additions
    "pipeline_curation_staged",
    "pipeline_curation_staged_funnel",
    "mm_png_decode",
    "rel_q7_volume_shipping",
    "rel_q8_market_share",
    "rel_q10_returned_items",
    "rel_q13_order_distribution",
    "rel_q19_disjunctive",
    "rel_q22_idle_customers",
    "g_clustering_coeff",
    "g_scc_of_source_k4",
    "g_degree_assortativity",
    "pipeline_class_balance",
    "text_bigrams_top20",
    "sim_quantize_int8",
    "udf_grouped_agg_wmean",
    "sim_pq_encode",
    "sim_pq_adc_top5",
    "text_repetition",
    "text_bpe_merges_k3",
    "pipeline_decontaminate",
    "pipeline_domain_mix",
    "g_random_walks_k3",
    "pipeline_split_leakage_safe",
    "dedup_recall_planted",
    "text_lm_score",
    "text_pii_scrub",
    "sim_ivfpq_top5",
    "dedup_incremental",
    "rel_q14_promo_revenue",
    "rel_q15_top_supplier",
    "rel_q17_small_quantity",
    "pipeline_pack_sequences",
    "dedup_semantic",
    "pipeline_quality_bins",
    "source_schema_evolution",
    "storage_zorder_buckets",
    "pipeline_dsir_resample",
    "dedup_incremental_indexed",
    "rel_scd2_history",
    "rel_salted_skew_join",
    "mm_resize",
    "sim_cosine_top10_vectorized",
    "sim_filtered_top5",
    # round-6 additions
    "text_bpe_encode",
    "pipeline_stratified_sample",
    "sim_range_search",
    "text_dedup_paragraphs",
    "rel_q2_min_cost_supplier",
    "rel_q4_order_priority",
    "rel_q9_product_profit",
    "rel_q11_important_parts",
    "rel_q12_priority_lines",
    "rel_q16_supplier_part_count",
    "rel_q20_excess_shipped",
    "rel_q21_waiting_supplier",
    "mm_audio_stats",
    "sql_lateral_topk",
    "source_orc_roundtrip",
    "source_python_datasource",
    "udf_arrow_optimized",
    "dedup_lsh_star_candidates",
    "storage_time_travel",
    "storage_bucketed_join",
    "g_pagerank_incremental",
    # round-6 close-out wave
    "rel_bloom_semi_join",
    "text_repeated_ngrams",
    "sql_pivot",
    "pipeline_rag_retrieve",
    "sim_ivf_indexed_top5",
    "fn_hll_union_rollup",
    "source_variant_props",
    "dedup_containment",
    # round-7 additions
    "mm_jpeg_decode",
    "pipeline_rag_retrieve_encoder",
    "text_bpe_merges_k64",
    "g_pagerank_hubsplit_k3",
    "mm_gif_decode",
    "mm_gif_frames",
    "mm_resize_jpeg",
    "pipeline_rag_mmr",
    "source_tar_members",
    "source_warc_records",
    # round-7 third wave
    "dedup_cdc_chunks",
    "g_link_adamic_adar",
    "sim_matryoshka_rerank",
    "text_entropy",
    "storage_partition_prune",
    "mm_ahash_pairs",
    "sim_binary_rerank",
    "pipeline_shuffle_shards",
    "pipeline_corpus_build",
    "g_walk_cooccurrence",
    "dedup_cdc_strip",
    # round-8
    "g_link_aa_pervertex",
    "mm_webp_decode",
    "mm_jpeg_progressive_decode",
    "source_avro_roundtrip",
    "source_jsonl_bz2",
    "g_ktruss4_r3",
    "pipeline_weighted_sample",
    "pipeline_domain_cap",
    "fn_cms_heavy_hitters",
    "fn_kmv_distinct",
    "rel_exact_quantiles",
    "pipeline_k_anonymity",
    "g_betweenness_k3",
    "pipeline_train_quality_lr",
    "pipeline_model_gate",
    "rel_exact_quantiles_grouped",
    # round-9
    "g_ktruss4_conv",
    "pipeline_train_quality_lr_mb",
    "g_betweenness_k3_norm",
    # round-10
    "rel_asof_join",
    "g_louvain_r2",
    "g_modularity_score",
    "rel_ohlc_candles",
    "mm_ivf_external_features",
    "rel_asof_join_fwd",
    "stream_ohlc_candles",
    "g_louvain_w_r2",
    "g_square_count",
    "g_link_jaccard",
    "rel_profile_columns",
    "pipeline_url_dedup",
    "mm_wav_decimate",
    "rel_win_ewma8",
    "g_diameter_lb_k4",
    "mm_scene_cuts",
    "text_readability",
    "source_xml_roundtrip",
    "pipeline_model_auc",
    "pipeline_span_corrupt",
    "stream_model_gate",
    "rel_asof_join_tol",
    "rel_er_fuzzy_join",
    "fn_quantile_sketch",
    "stream_quantile_sketch",
    "source_fixed_width",
    "rel_skyline_2d",
    "text_pmi_bigrams",
    "g_degree_gini",
    # round-11
    "g_degree_gini_exact",
    "g_partition_k2",
    "g_partition_k2_refined",
    "g_partition_k2_vcycle",
    "g_partition_cut_stats",
    "g_partition_k4",
    "mm_external_poison_mix",
    # round-13
    "g_partition_k4_cut_stats",
    "g_pagerank_warm_delta",
    "g_wcc_delta_stream",
]


def audit(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    df.collect()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    # dict.fromkeys: dedupe (AQE plan text repeats initial+final sections)
    pushed = list(dict.fromkeys(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)))
    schemas = list(dict.fromkeys(re.findall(r"ReadSchema: struct<([^>]*)>", plan)))
    joins = sorted(
        set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)", plan))
    )
    # Count DISTINCT operator ids, not text occurrences: cached
    # (InMemoryRelation) and AQE initial+final sections repeat whole
    # subtrees in the rendered plan, which would overcount a bushy
    # pipeline's exchanges by 10-100x.
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    exchanges = len(
        set(
            re.findall(
                r"\bExchange (?:hashpartitioning|rangepartitioning|"
                r"RoundRobinPartitioning|SinglePartition)[^\n]*?plan_id=(\d+)",
                plan,
            )
        )
    )
    lines = [f"### {name}", ""]
    lines.append(f"- join strategies: {', '.join(joins) if joins else 'none (scan/agg only)'}")
    lines.append(f"- codegen spans: {codegen} · shuffle exchanges: {exchanges}")
    for i, s in enumerate(schemas):
        cols = [c.split(":")[0] for c in s.split(",") if c]
        lines.append(f"- scan {i}: reads {len(cols)} col(s): {', '.join(cols[:8])}")
    for i, p in enumerate(pf for pf in pushed if pf.strip()):
        lines.append(f"- pushed filters: `{p[:160]}`")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    load_all_queries()
    spark = get_spark(cpus=8, shuffle_partitions=8)
    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by tools/plan_report.py at {sf_dir} (AQE-finalized plans).",
        "Codegen spans are WholeStageCodegen regions (rendered `*(n)` by Spark).",
        "",
    ]
    for name in HEADLINE:
        out.append(audit(spark, name, sf_dir))
        print(f"audited {name}")
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
