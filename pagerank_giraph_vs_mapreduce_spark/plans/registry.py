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
# Round-9 budget math (r08 recorded exactly 50 rows, all green; after r08 no
# query's newest driver row predates r04): VERDICT r08 "Next round" #1 is the
# hard criterion — the 16 round-8 queries that overflowed the r08 gate lead,
# then queries whose code changed in r09 (re-certify), then the r08
# code-changed re-certs, then the r04 cohort (43 rows — what the ~50-slot
# budget can't reach this round leads r10). Everything is additionally
# re-proven every round by tools/check_oracle.py (stricter: exact stringified
# values, not hashes).
_PRIORITY = (
    # --- the 16 round-8 queries that overflowed the r08 gate (VERDICT #1)
    "pipeline_domain_cap",  # two-phase per-domain top-k cap
    "source_jsonl_bz2",  # splittable-codec JSONL round-trip
    "mm_jpeg_progressive_decode",  # real SOF2 progressive decoder
    "rel_exact_quantiles",  # histogram-cumsum exact quantiles
    "fn_cms_heavy_hitters",  # count-min sketch heavy hitters (md5 rows)
    "fn_kmv_distinct",  # KMV distinct sketch (+ r09 small-n guard)
    "pipeline_k_anonymity",  # quasi-identifier suppression gate
    "g_betweenness_k3",  # truncated sampled-source Brandes
    "pipeline_train_quality_lr",  # distributed GD trainer, exact oracle
    "pipeline_model_gate",  # train + apply as one lazy curation gate
    "stream_cms_heavy_hitters",  # the CMS as an incremental stream agg
    "pipeline_train_per_source_lr",  # applyInPandas model fleet, exact oracle
    "rel_exact_quantiles_grouped",  # per-group percentile_disc, no whale sort
    "rel_outlier_zscore",  # group-moment broadcast outlier sweep
    "rel_corr_exact",  # Pearson corr via order-independent moments
    "mm_y4m_frames",  # YUV4MPEG2 frames (+ r09 chroma-truncation guard)
    # --- new or code-changed in r09: certify/re-certify
    # (new r09 queries are appended here as they land)
    "g_ktruss4_r3",  # re-fixtured to realistic sparsity (VERDICT #3)
    "g_ktruss4_conv",  # NEW: peel to convergence, 8-round fixpoint oracle
    "pipeline_train_quality_lr_mb",  # NEW: mini-batch + L2 GD (VERDICT #7)
    "g_betweenness_k3_norm",  # NEW: NetworkX-rescale normalization (VERDICT #8)
    "rel_outlier_mad",  # NEW: robust MAD outliers, two-phase exact medians
    "mm_ivf_frames",  # NEW: IVF/DKIF compressed-video container parse
    "rel_resample_gapfill",  # NEW: dense-grid hourly rollup + forward fill
    "fn_kmv_set_ops",  # NEW: theta-sketch union/intersection estimates
    "text_zipf_fit",  # NEW: rank-frequency OLS fit, corpus-QA stats
    "stream_resample_gapfill",  # NEW: streaming rollup + query-time gapfill
    "g_ppr_multi_k3",  # NEW: per-seed batched PPR vectors, sparse state
    "rel_resample_lerp",  # NEW: linear-interpolation gapfill companion
    "mm_webp_decode",  # VP8L close-distance-codes (VERDICT #6)
    "g_clustering_coeff",  # re-certify: closed_triangles_of rewritten (r09)
    # (g_link_aa_pervertex — r09 explode fix — already leads in the 16)
    # --- code-changed in r08, newest driver row r07: re-certify
    "g_pagerank_k3",  # hub-split auto-threshold now derived at build time
    "g_pagerank_hubsplit_k3",  # same kernel, explicit split path
    "pipeline_curation",  # planted-dup offsets now scale-safe (1e9)
    "dedup_incremental",  # same offset change
    "dedup_semantic",  # same offset change (vec_id planted dups)
    # --- r04 cohort (newest driver row r04); overflow leads r10
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
