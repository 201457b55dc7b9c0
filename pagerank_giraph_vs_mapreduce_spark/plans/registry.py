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
)

# The driver's correctness gate checks queries in registration order with a
# ~50-query budget per round — so registration order IS hard-signal coverage.
# Round-3 rotation (VERDICT_r02 item 3): first the 4 rows that were red in
# r02 (oracle representation fixes — they MUST be re-checked), then the
# queries whose code changed this round (shuffle-free IVF argmax, in-plan
# scalar subquery, builder partitioning pin — g_pagerank_k3 re-certifies the
# graph kernel), then every r01-only row (2 rounds stale by r03). The five
# most trivial stale rows sit last and may overflow into r04's budget.
_PRIORITY = (
    # new this round — the composite curation pipeline needs first rows
    "pipeline_curation",
    "pipeline_curation_funnel",
    "sim_ivf_top5_nprobe2",
    "text_vocab_top20",
    "text_chunks",
    "g_lpa_r3",
    "stream_vocab_top20",
    "rel_q5_local_supplier",
    "pipeline_chunk_dedup",
    "g_hits_k2",
    "text_tfidf_top_term",
    "text_feature_hash_64",
    "sql_map_funcs",
    "rel_user_funnel",
    # red in CORRECTNESS_r02 — oracle fixes must be re-verified
    "text_fingerprint",
    "sql_array_funcs",
    "sql_array_agg",
    "sql_higher_order",
    # code changed this round: IVF family (higher-order argmax, no window),
    # scalar subquery (in-plan crossJoin), graph builder (shuffle_hash pin)
    "sim_ivf_assign",
    "sim_kmeans_2iter",
    "sim_ivf_top5",
    "sim_ivf_trained_top5",
    "rel_scalar_subquery",
    "g_pagerank_k3",
    # r01-only rows, oldest-green backfill (not re-checked since round 1)
    "g_wcc_k4",
    "g_bfs_hops_k4",
    "g_ppr_k3",
    "g_pagerank_top20",
    "g_scatter_contribs",
    "g_gather_sum",
    "g_vertex_universe",
    "g_graph_counts",
    "g_out_degree",
    "g_dangling",
    "g_degree_hist",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_minhash_near_dups",
    "dedup_lsh_candidates",
    "dedup_ngram_jaccard",
    "sim_cosine_top10",
    "sim_lsh_buckets",
    "rel_q1_pricing",
    "rel_join_q3",
    "rel_q6_forecast",
    "rel_q14_promo_ratio",
    "rel_q18_large_orders",
    "rel_broadcast_dim_join",
    "rel_semi_join",
    "rel_anti_join",
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
    # trivial stale rows — lowest information, may fall past the budget
    "rel_sort_limit",
    "rel_union_all",
    "rel_string_funcs",
    "rel_case_coalesce",
    "rel_filter_project",
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
