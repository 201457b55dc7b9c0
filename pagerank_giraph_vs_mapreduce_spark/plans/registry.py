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
# Round-6 budget math (r05 recorded exactly 50 rows, all green, covering the
# r05 _PRIORITY head down through dedup_simhash64_near_dups):
# first the queries that are NEW or whose code changed this round (the cosine
# kernel's zero-norm semantics moved to try_divide, touching every cosine
# consumer; dedup_incremental_indexed's cache/table-name plumbing changed;
# text_bpe_encode is newly registered), then the rotation CONTINUES from
# where the r05 budget stopped: the remaining r02-only rows, then the
# fn_*/win_*/text_* tail that has not had a fresh row since r02/r03.
# Everything r05-green sits at the bottom; overflow rolls to r07.
_PRIORITY = (
    # --- new or code-changed in r06: must (re)certify
    # (the ANSI-robustness sweep moved quality_score's ratios and the
    # bucketed-cosine pair kernels to try_divide — value-identical on
    # defined rows, but the touched queries re-certify first)
    "stream_python_source",  # NEW: streaming custom-connector face
    "source_variant_props",  # NEW: Spark 4 VARIANT semi-structured path
    "fn_hll_union_rollup",  # NEW: mergeable-sketch rollup
    "g_wcc_incremental",  # NEW: warm-start component maintenance
    "pipeline_rag_retrieve",  # NEW: chunk→embed→score→top-k, one plan
    "sim_ivf_indexed_top5",  # NEW: durable cell-partitioned ANN index
    "rel_bloom_semi_join",  # NEW: runtime bloom filter join pruning
    "g_sssp_k4",  # NEW: weighted SSSP, delta-frontier Bellman-Ford
    "text_repeated_ngrams",  # NEW: exact repeated-span detection
    "sql_pivot",  # NEW: SQL-standard PIVOT (conditional-agg plan)
    "stream_incremental_dedup",  # NEW: continuous probe→flag→index loop
    "text_bpe_encode",  # NEW: BPE tokenizer APPLY path (advice r05 #4)
    "pipeline_stratified_sample",  # NEW: per-stratum md5 downsampling
    "sim_range_search",  # NEW: cosine radius search (shuffle-free)
    "text_dedup_paragraphs",  # NEW: intra-doc chunk dedup audit
    "stream_stream_join",  # NEW: watermarked interval join, state-bounded
    "source_orc_roundtrip",  # NEW: built-in ORC source/sink fidelity
    "source_python_datasource",  # NEW: custom Python DataSource connector
    "mm_audio_stats",  # NEW: real WAV encode->decode round trip
    "sql_lateral_topk",  # NEW: correlated LATERAL ORDER BY+LIMIT
    "udf_arrow_optimized",  # NEW: Spark 4 Arrow-optimized scalar UDF
    "dedup_lsh_star_candidates",  # NEW: mega-cluster-safe B-1 candidates
    "storage_time_travel",  # NEW: snapshot-versioned reads + atomic commit
    "storage_bucketed_join",  # NEW: co-located zero-exchange fact join
    "g_pagerank_incremental",  # NEW: warm-start carry, two-phase oracle
    "dedup_containment",  # NEW: asymmetric excerpt detection
    # --- NEW in r06: the remaining 8 TPC-H query shapes (fixture-adapted
    # where partsupp/shipmode/receiptdate don't exist — see the module
    # comment in relational_queries.py)
    "rel_q2_min_cost_supplier",
    "rel_q4_order_priority",
    "rel_q9_product_profit",
    "rel_q11_important_parts",
    "rel_q12_priority_lines",
    "rel_q16_supplier_part_count",
    "rel_q20_excess_shipped",
    "rel_q21_waiting_supplier",
    "sim_cosine_top10",  # HOF kernel now try_divide (zero-norm → NULL)
    "sim_cosine_top10_vectorized",  # Arrow kernel masks zero norms to NULL
    "dedup_embedding_cosine",  # consumes cosine_scores
    "sim_ann_recall",  # brute-force arm consumes cosine_topk
    "sim_lsh_ann_top5",  # bucket-pruned rescore consumes the kernel
    "dedup_incremental_indexed",  # bounded cand cache + digest table name
    "text_quality",  # quality_col ratios now try_divide
    "dedup_semantic",  # pair kernel now try_divide
    "pipeline_curation",  # composes quality_col
    "pipeline_quality_bins",  # composes quality_col
    # --- rotation continuation: rows whose newest green evidence is r02
    "dedup_simhash_near_dups",
    "dedup_simhash",
    "asof_click_purchase",
    "range_join_signup_errors",
    "g_kcore64_r4",
    "g_triangle_count",
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
    "fn_hash_sample",
    "fn_math",
    "fn_date_arith",
    "fn_null_semantics",
    "fn_c5_c6",
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
