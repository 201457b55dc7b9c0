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
# Round-11 budget math (VERDICT r10 "Next round" #1/#4): the r10 gate's 50
# slots ended at rel_asof_join_tol, so the 10 round-10 queries that have
# never had a driver row lead (g_degree_gini now certifies the BINNED
# default — its semantics changed this round), then the round-11 newcomers,
# then queries whose CODE or ORACLE changed in r11 (pipeline_url_dedup's
# anchored tracker regex changes values; mm_wav_decimate gained input
# validation), then the r10 re-cert block the r10 budget never reached,
# then the r05-stale cohort (hard criterion: no registered query's newest
# row may predate r06 by end of r12 — ~30 fit this round, the rest leads
# r12). Everything is additionally re-proven every round by
# tools/check_oracle.py (stricter: exact stringified values, not hashes).
_PRIORITY = (
    # --- the 10 round-10 queries with no driver row yet (VERDICT r10 #1)
    "rel_er_fuzzy_join",
    "fn_quantile_sketch",
    "stream_quantile_sketch",
    "source_fixed_width",
    "rel_skyline_2d",
    "text_pmi_bigrams",
    "g_degree_gini",
    "rel_assoc_rules",
    "g_matching_r3",
    "g_coarsen_r3",
    # --- new in r11
    "g_degree_gini_exact",
    "g_partition_k2",
    "g_partition_k2_refined",
    "g_partition_k2_vcycle",
    "g_partition_cut_stats",
    "g_partition_k4",
    "mm_external_poison_mix",
    # --- code/oracle changed in r11: re-certify
    "pipeline_url_dedup",
    "mm_wav_decimate",
    # --- r10 re-cert block the r10 budget never reached
    "pipeline_train_quality_lr_mb",
    "rel_resample_gapfill",
    "rel_resample_lerp",
    "stream_resample_gapfill",
    "mm_ivf_frames",
    "mm_y4m_frames",
    "asof_click_purchase",  # operator change: atomic payload struct
    # --- oldest r05 rows: what the remaining budget reaches
    "dedup_simhash64_near_dups",
    "g_hits_k2",
    "mm_frame_sample",
    "mm_meta",
    "mm_resize",
    "mm_thumbnail",
    "pipeline_pack_sequences",
    "rel_agg_cube",
    "rel_agg_rollup",
    "rel_case_coalesce",
    "rel_date_funcs",
    "rel_distinct_agg",
    "rel_except",
    "rel_filter_project",
    "rel_having",
    # --- rest of the r05 cohort (overflow leads r11)
    "rel_intersect",
    "rel_json_extract",
    "rel_outer_join",
    "rel_pivot",
    "rel_salted_skew_join",
    "rel_scd2_history",
    "rel_sort_limit",
    "rel_string_funcs",
    "rel_union_all",
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
