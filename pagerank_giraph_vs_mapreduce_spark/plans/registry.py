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
)

# The driver's correctness gate checks queries in registration order and (as of
# round 1) truncated at 50 of 87 — so registration order IS hard-signal
# coverage. Queries listed here are surfaced first: everything that did not get
# a CORRECTNESS_r01 row, the queries whose semantics changed this round, and
# new queries — followed by a sentinel sample of the already-green families.
# Anything not named keeps its module-import order after the priority block.
_PRIORITY = (
    # similarity / ANN family (4 of 6 unchecked in r01)
    "sim_ivf_assign",
    "sim_ivf_top5",
    "dedup_embedding_cosine",
    "sim_lsh_ann_top5",
    "sim_ann_recall",
    "sim_kmeans_2iter",
    "sim_ivf_trained_top5",
    # text analysis (all unchecked in r01)
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_regexp_tokens",
    # event-time windows (all unchecked)
    "win_tumbling_15m",
    "win_sliding_1h_30m",
    "win_session_30m",
    # multimodal (all unchecked)
    "mm_meta",
    "mm_features",
    "mm_frame_sample",
    # sql breadth (all unchecked)
    "sql_grouping_sets",
    "sql_exists_correlated",
    "sql_array_agg",
    "sql_array_funcs",
    "edge_parse_snap",
    "sql_higher_order",
    "sql_posexplode",
    "sql_unpivot",
    # scalar/aggregate function breadth (all unchecked)
    "fn_c5_c6",
    "fn_math",
    "fn_date_arith",
    "fn_agg_breadth",
    "fn_null_semantics",
    "fn_win_frames",
    "fn_stats_agg",
    "fn_hash_sample",
    "fn_sketch_bounds",
    # pandas-UDF surface (all unchecked)
    "udf_pandas_normalize",
    "udf_grouped_zscore",
    "udf_udtf_tokenize",
    # temporal joins (all unchecked)
    "asof_click_purchase",
    "range_join_signup_errors",
    # streaming surface, driven to end-of-input (new this round)
    "stream_tumbling_15m",
    "stream_session_30m",
    "stream_dedup_counts",
    # changed this round (degree-oriented wedges / bounded fan-out / multi-probe)
    "g_triangle_count",
    "g_two_hop_count",
    "dedup_simhash",
    "dedup_simhash_near_dups",
    "dedup_simhash64_near_dups",
    "g_kcore64_r4",
    # green-in-r01 sentinels, one per family, to catch regressions
    # (ordered by information value in case the gate's cap truncates)
    "g_pagerank_k3",
    "dedup_minhash_near_dups",
    "rel_q1_pricing",
    "rel_join_q3",
    "g_vertex_universe",
    "g_graph_counts",
    "rel_win_rank",
    "dedup_exact",
    "g_scatter_contribs",
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
