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
# Round-12 budget math (VERDICT r11 "Next round" #4): the final 21 r05-stale
# rows LEAD (end-of-r12 criterion: no registered query's newest driver row
# may predate r06 — this drains the backlog), then the 7 queries whose CODE
# changed this round (the whole partition family re-certifies the
# region-growing initial coloring + the cut_stats NULL-side/oracle-rewrite
# fixes; both ktruss queries re-certify the pinned shuffle-merge adjacency
# joins), then the oldest r06 rows fill the remaining ~22 slots — the
# freshness rotation continues with nothing older than two rounds left.
# Everything is additionally re-proven every round by
# tools/check_oracle.py (stricter: exact stringified values, not hashes).
_PRIORITY = (
    # --- the last 21 r05-stale rows: drained this round (end-of-r12
    #     criterion met when these certify)
    "rel_win_lag",
    "rel_win_rank",
    "rel_win_ranking_family",
    "rel_win_running",
    "sim_filtered_top5",
    "sim_ivf_top5",
    "sim_ivf_top5_nprobe2",
    "sim_ivf_trained_top5",
    "sim_pq_encode",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_schema_evolution",
    "storage_zorder_buckets",
    "stream_dedup_counts",
    "stream_late_data_gate",
    "stream_session_30m",
    "stream_stateful_totals",
    "stream_tumbling_15m",
    "udf_grouped_zscore",
    "udf_pandas_normalize",
    "udf_udtf_tokenize",
    # --- code changed in r12: re-certify
    "g_partition_k2",
    "g_partition_k2_refined",
    "g_partition_k2_vcycle",
    "g_partition_cut_stats",
    "g_partition_k4",
    "g_ktruss4_r3",
    "g_ktruss4_conv",
    # --- oldest r06 rows: what the remaining budget reaches
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_incremental_indexed",
    "dedup_lsh_star_candidates",
    "dedup_simhash",
    "dedup_simhash_near_dups",
    "fn_hll_union_rollup",
    "g_kcore64_r4",
    "g_sssp_k4",
    "g_triangle_count",
    "g_wcc_incremental",
    "mm_audio_stats",
    "pipeline_quality_bins",
    "pipeline_stratified_sample",
    "range_join_signup_errors",
    "rel_q11_important_parts",
    "rel_q12_priority_lines",
    "rel_q16_supplier_part_count",
    "rel_q20_excess_shipped",
    "rel_q21_waiting_supplier",
    "rel_q2_min_cost_supplier",
    "rel_q4_order_priority",
    "rel_q9_product_profit",
    "sim_ann_recall",
    "sim_cosine_top10",
    "sim_cosine_top10_vectorized",
    "sim_ivf_indexed_top5",
    "sim_lsh_ann_top5",
    "sim_range_search",
    "source_orc_roundtrip",
    "source_python_datasource",
    "source_variant_props",
    "sql_lateral_topk",
    "sql_pivot",
    "storage_bucketed_join",
    "stream_incremental_dedup",
    "stream_stream_join",
    "text_dedup_paragraphs",
    "text_quality",
    "text_repeated_ngrams",
    "udf_arrow_optimized",
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
