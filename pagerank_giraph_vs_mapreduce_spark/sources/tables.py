"""Parquet table loaders for the driver's synthetic TPC-H-ish tables, plus
the deterministic derived ``edges`` graph used by the graph-operator surface.

The reference's datasets are SNAP web graphs (README.md:116-120); the driver
testdata has no graph table, so we derive one deterministically from
``lineitem`` — expressible identically in Spark and ANSI SQL so every graph
query keeps a DuckDB oracle:

    src = l_orderkey % 997          (vertices 0..996 have out-edges)
    dst = l_partkey  % 1500         (vertices 997..1499 are dangling/dst-only)

This construction guarantees the structural features the reference's parser
and kernel must handle (FIXTURES.md F1): duplicate edges (multi-lineitem
orders), dangling vertices (dst >= 997 never appears as src), dst-only
vertices (J3), and self-loops (src == dst collisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SRC_MOD = 997
DST_MOD = 1500

# The same derivation as ANSI SQL, reused by oracle queries.
EDGES_SQL = (
    f"SELECT l_orderkey % {SRC_MOD} AS src, l_partkey % {DST_MOD} AS dst FROM lineitem"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges(src BIGINT, dst BIGINT) derived from lineitem (see module doc)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % SRC_MOD).alias("src"),
        (F.col("l_partkey") % DST_MOD).alias("dst"),
    )
