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
# Round-5 budget math (r04 recorded exactly 50 rows; VERDICT_r04 items 1+2
# name the must-certify set):
# 3 rows red in r04 whose code was FIXED this round (the two _ROUNDTRIP_ORACLE
# BIGINT casts; sim_pq_encode's hashable string reshape) + the 6 queries that
# have never been in any gate rotation (VERDICT_r04 item 2, verbatim) +
# pipeline_pack_sequences whose window was re-sharded this round (VERDICT
# item 3) + any new r05 queries (inserted at the top block as they land).
# After those: the 19 rows whose newest green evidence is r01 (re-verified
# locally through check_oracle's stricter compare in r04, 19/19 — scheduling
# debt, not correctness doubt), the 4 r03-green rows with r04 guard changes,
# then the r02-only rows. Everything r04-green sits at the bottom; overflow
# rolls to r06.
_PRIORITY = (
    # --- red in r04, fixed this round: must re-certify
    "source_json_roundtrip",  # JSON fidelity (oracle now casts to BIGINT)
    "source_csv_roundtrip",  # CSV fidelity (same oracle fix)
    "sim_pq_encode",  # PQ codes now '_'-joined string (hashable)
    # --- never in any gate rotation (VERDICT_r04 item 2)
    "dedup_semantic",  # SemDedup cluster-then-prune
    "pipeline_dsir_resample",  # DSIR importance resampling (hashed n-grams)
    "pipeline_quality_bins",  # broadcast-threshold curriculum binning
    "sim_filtered_top5",  # metadata-filtered ANN (pre-filter semantics)
    "source_schema_evolution",  # mergeSchema scan over evolved batches
    "storage_zorder_buckets",  # Morton-key 2-D clustering audit
    # --- code changed this round (r05), needs fresh green row
    "pipeline_pack_sequences",  # window re-keyed (source, shard) — VERDICT #3
    "dedup_incremental_indexed",  # durable band-index probe — VERDICT #5
    "rel_scd2_history",  # CDC -> SCD2 versioned rows — VERDICT #7
    "rel_salted_skew_join",  # content-hash salt spreads hot keys (new r05)
    "mm_resize",  # nearest-neighbor resize via decoded PNG pixels (new r05)
    "mm_thumbnail",  # strided 1-D resample stand-in certified (new r05)
    "sim_cosine_top10_vectorized",  # Arrow-kernel distance twin — VERDICT #6
    "stream_late_data_gate",  # watermark lateness accounting — VERDICT #8
    "stream_stateful_totals",  # applyInPandasWithState certified (new r05)
    # --- r01-only rows (19; locally re-certified 19/19 in r04)
    "rel_outer_join",
    "rel_agg_rollup",
    "rel_agg_cube",
    "rel_distinct_agg",
    "rel_having",
    "rel_pivot",
    "rel_win_rank",
    "rel_win_running",
    "rel_win_lag",
    "rel_win_ranking_family",
    "rel_intersect",
    "rel_except",
    "rel_json_extract",
    "rel_date_funcs",
    "rel_sort_limit",
    "rel_union_all",
    "rel_string_funcs",
    "rel_case_coalesce",
    "rel_filter_project",
    # --- code changed in r03 only (r03 green rows, guards added in r04)
    "sim_ivf_top5",  # ivf_query_cells limit(1) contract
    "sim_ivf_top5_nprobe2",
    "sim_ivf_trained_top5",
    "g_hits_k2",  # rounds >= 1 guard
    # r02-only rows, next-oldest; composite/stateful surfaces first, the
    # overflow past the budget rolls to r06
    "stream_dedup_counts",
    "stream_session_30m",
    "stream_tumbling_15m",
    "udf_grouped_zscore",
    "udf_pandas_normalize",
    "udf_udtf_tokenize",
    "mm_meta",
    "mm_frame_sample",
    "dedup_simhash64_near_dups",
    "dedup_simhash_near_dups",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_ann_recall",
    "sim_lsh_ann_top5",
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
    "text_quality",
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
