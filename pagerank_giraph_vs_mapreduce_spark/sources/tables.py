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
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` normalized to a microsecond TIMESTAMP.

    The testdata generations have written ``ts`` two ways, so the loader
    adapts to the file's physical schema:

    - INT64 TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
      ``nanosAsLong`` reads the raw nanos and we floor-divide to micros —
      exactly the truncation DuckDB applies when casting TIMESTAMP_NS to
      its micro-precision TIMESTAMP.
    - TIMESTAMP(MICROS) (isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ;
      with the session timezone pinned to UTC the NTZ→LTZ cast is an
      identity on the epoch value, so ``unix_micros`` yields the same
      number DuckDB's ``epoch_us(ts)`` does.

    Either way the output schema is identical: ``ts_us`` (BIGINT micros,
    for arithmetic that must avoid engine-specific epoch functions) and
    ``ts`` (micro-precision TIMESTAMP), keeping event-time queries
    oracle-comparable.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql.types import LongType

    if isinstance(raw.schema["ts"].dataType, LongType):
        # raw nanos: integer DIV — a double `/` would lose precision on
        # ~1.7e18 nanos
        ts_us = F.expr("ts DIV 1000")
    else:
        ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return raw.select(
        "event_id",
        ts_us.alias("ts_us"),
        F.timestamp_micros(ts_us).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges(src BIGINT, dst BIGINT) derived from lineitem (see module doc)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % SRC_MOD).alias("src"),
        (F.col("l_partkey") % DST_MOD).alias("dst"),
    )
