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
)


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
