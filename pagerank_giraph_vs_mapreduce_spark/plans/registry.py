"""Registry binding each declared query (SURVEY.md §2 operator surface) to
its DuckDB oracle SQL.

The driver runs every ``QUERIES[name](spark, sf_dir)`` against
``ORACLES[name]`` on the same parquet tables and compares row count, schema
and an order-insensitive value hash. Registration happens at import of the
query modules; ``load_all_queries()`` imports them all.

Hash-stability rules every query here follows (see tools/check_oracle.py):
- per-row double arithmetic is IEEE-deterministic and bit-identical across
  engines — safe to emit raw;
- aggregates over doubles are order-dependent in the last bits — sum via
  per-row DECIMAL cast (exact, order-independent) then cast back to DOUBLE,
  or round to a coarse enough precision;
- timestamps are emitted as epoch seconds (BIGINT) or ISO date strings,
  never raw timestamp objects;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "pagerank_giraph_vs_mapreduce_spark.plans.graph_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.relational_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.dedup_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.similarity_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.text_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.window_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.multimodal_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.sql_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.function_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.udf_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.streaming_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries",
    "pagerank_giraph_vs_mapreduce_spark.plans.source_queries",
)

# The driver's correctness gate checks queries in registration order with a
# ~50-query budget per round — so registration order IS hard-signal coverage.
# Round-8 budget math (r07 recorded exactly 50 rows, all green; cumulative
# newest-driver-row ages after r07: 5 queries at r02, 39 at r03, 43 at r04):
# VERDICT r07 "Next round" #1 is the hard criterion — after CORRECTNESS_r08,
# no registered query's newest driver row may be older than r04 — so ALL 44
# r02/r03 rows lead the order (they alone are 88% of a 50-slot budget), and
# the round's new queries take whatever slots remain (~6); new rows that miss
# the r08 gate lead r09's. Everything is additionally re-proven every round by
# tools/check_oracle.py (stricter: exact stringified values, not hashes).
_PRIORITY = (
    # --- rotation: ALL remaining r02-era rows (fn_* tail)
    "fn_c5_c6",
    "fn_date_arith",
    "fn_hash_sample",
    "fn_math",
    "fn_null_semantics",
    # --- rotation: ALL remaining r03-era rows
    "g_vertex_universe",
    "g_graph_counts",
    "g_out_degree",
    "g_dangling",
    "g_scatter_contribs",
    "g_gather_sum",
    "g_wcc_k4",
    "g_bfs_hops_k4",
    "g_ppr_k3",
    "g_degree_hist",
    "g_lpa_r3",
    "rel_q1_pricing",
    "rel_join_q3",
    "rel_broadcast_dim_join",
    "rel_semi_join",
    "rel_anti_join",
    "rel_scalar_subquery",
    "rel_q5_local_supplier",
    "rel_q6_forecast",
    "rel_q14_promo_ratio",
    "rel_q18_large_orders",
    "rel_user_funnel",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_lsh_candidates",
    "dedup_minhash_near_dups",
    "dedup_ngram_jaccard",
    "sim_lsh_buckets",
    "sim_ivf_assign",
    "sim_kmeans_2iter",
    "sql_array_agg",
    "sql_array_funcs",
    "sql_higher_order",
    "sql_map_funcs",
    "pipeline_curation_funnel",
    "pipeline_chunk_dedup",
    "text_vocab_top20",
    "text_chunks",
    "stream_vocab_top20",
    # --- new in r08: certify with the remaining ~6 slots; overflow leads r09
    "text_bpe_merges_k64_batched",  # NEW: top-B non-overlapping merges/round
    "g_link_aa_pervertex",  # NEW: per-vertex top-k Adamic-Adar candidates
    "mm_webp_decode",  # NEW: real VP8L (WebP-lossless) decoder
    "source_avro_roundtrip",  # NEW: pure-Python Avro OCF reader
    "g_ktruss4_r3",  # NEW: k-truss peeling (edge-cohesion kernel)
    "pipeline_weighted_sample",  # NEW: integer-exact systematic w-sampling
    # ---- ~50-row budget line (r08 gate reaches about here) ----
    "pipeline_domain_cap",  # NEW: two-phase per-domain top-k cap
    "source_jsonl_bz2",  # NEW: splittable-codec JSONL round-trip
    "mm_jpeg_progressive_decode",  # NEW: real SOF2 progressive decoder
    "rel_exact_quantiles",  # NEW: histogram-cumsum exact quantiles
    "fn_cms_heavy_hitters",  # NEW: count-min sketch heavy hitters (md5 rows)
    "fn_kmv_distinct",  # NEW: k-minimum-values distinct sketch (md5 space)
    "pipeline_k_anonymity",  # NEW: quasi-identifier suppression gate
    "g_betweenness_k3",  # NEW: truncated sampled-source Brandes
    "pipeline_train_quality_lr",  # NEW: distributed GD trainer, exact oracle
    "pipeline_model_gate",  # NEW: train + apply as one lazy curation gate
    "stream_cms_heavy_hitters",  # NEW: the CMS as an incremental stream agg
    "pipeline_train_per_source_lr",  # NEW: applyInPandas model fleet, exact oracle
    "rel_exact_quantiles_grouped",  # NEW: per-group percentile_disc, no whale sort
    "rel_outlier_zscore",  # NEW: group-moment broadcast outlier sweep
    "rel_corr_exact",  # NEW: Pearson corr via order-independent moments
    "mm_y4m_frames",  # NEW: real video-container (YUV4MPEG2) frame parsing
    # --- code-changed in r08: re-certify (also re-proven by check_oracle)
    "g_pagerank_k3",  # hub-split auto-threshold now derived at build time
    "g_pagerank_hubsplit_k3",  # same kernel, explicit split path
    "pipeline_curation",  # planted-dup offsets now scale-safe (1e9)
    "dedup_incremental",  # same offset change
    "dedup_semantic",  # same offset change (vec_id planted dups)
    # --- r04 cohort (newest driver row r04), queued for r09
    "mm_features",
    "mm_png_decode",
    "text_tfidf_top_term",
    "sim_ivfpq_top5",
    "sim_pq_adc_top5",
    "sim_quantize_int8",
    "sim_knn_join_top3",
    "dedup_recall_planted",
    "dedup_wcc_canonical",
    "text_lm_score",
    "text_pii_scrub",
    "text_repetition",
    "text_bigrams_top20",
    "pipeline_split_leakage_safe",
    "pipeline_decontaminate",
    "pipeline_domain_mix",
    "pipeline_class_balance",
    "pipeline_curation_staged",
    "pipeline_curation_staged_funnel",
    "stream_curation_gate",
    "stream_enrich_features",
    "udf_grouped_agg_wmean",
    "g_random_walks_k3",
    "g_clustering_coeff",
    "g_scc_of_source_k4",
    "g_multi_bfs_k4",
    "g_harmonic_k4",
    "g_degree_assortativity",
    "rel_upsert_merge",
    "rel_retention_cohorts",
    "rel_q7_volume_shipping",
    "rel_q8_market_share",
    "rel_q10_returned_items",
    "rel_q13_order_distribution",
    "rel_q19_disjunctive",
    "rel_q22_idle_customers",
    "rel_q14_promo_revenue",
    "rel_q15_top_supplier",
    "rel_q17_small_quantity",
    "source_json_corrupt_records",
    "g_pagerank_weighted_k3",
    "sql_recursive_bfs_k3",
    "g_two_hop_count",
    "sql_exists_correlated",
    "sql_grouping_sets",
    "sql_unpivot",
    "sql_posexplode",
    "edge_parse_snap",
    "win_session_30m",
    "win_sliding_1h_30m",
    "win_tumbling_15m",
    "text_lang_id",
    "text_regexp_tokens",
    "text_token_stats",
    "fn_sketch_bounds",
    "fn_stats_agg",
    "fn_win_frames",
    "fn_agg_breadth",
)


def _apply_priority_order() -> None:
    # Mutate in place: callers hold references to these dicts.
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in _PRIORITY]
    q = {n: QUERIES[n] for n in ordered}
    o = {n: ORACLES[n] for n in ordered if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` → driver does rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_queries() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _apply_priority_order()
