"""R2 state-file codec: ``NodeID\\tPR|out1,out2,...`` (the reference's
inter-iteration format — written at MR/GraphBuilderReducer.java:34-37 and
MR/PageRankReducer.java:119, parsed at MR/PageRankMapper.java:38-69).

Our engine never round-trips state through files inside the loop (that is
MR's documented 3.7× tax, README.md:252-256); this codec exists for file
contract parity: emitting state a MR-pipeline consumer could read, and
ingesting state produced by the reference. Malformed rows are dropped,
matching PageRankMapper's drop-don't-fail policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(spark: SparkSession, path: str) -> DataFrame:
    """Parse R2 lines → (id BIGINT, pr DOUBLE, outlinks ARRAY<BIGINT>)."""
    lines = spark.read.text(path)
    parts = lines.select(
        F.split(F.col("value"), "\t").alias("kv")
    ).filter(F.size("kv") == 2)
    split_payload = parts.select(
        F.col("kv").getItem(0).try_cast("bigint").alias("id"),
        F.split(F.col("kv").getItem(1), r"\|").alias("pv"),
    ).filter(F.col("id").isNotNull() & (F.size("pv") >= 1))
    return split_payload.select(
        "id",
        F.col("pv").getItem(0).try_cast("double").alias("pr"),
        F.when(
            (F.size("pv") < 2) | (F.col("pv").getItem(1) == ""), F.array().cast("array<bigint>")
        )
        .otherwise(
            F.transform(
                F.split(F.col("pv").getItem(1), ","),
                lambda s: s.try_cast("bigint"),
            )
        )
        .alias("outlinks"),
    ).filter(F.col("pr").isNotNull())


def write_state(state: DataFrame, path: str) -> None:
    """(id, pr, outlinks) → R2 text lines, pr as %.10f (C4 formatting)."""
    out = state.select(
        F.concat(
            F.col("id").cast("string"),
            F.lit("\t"),
            F.format_string("%.10f", F.col("pr")),
            F.lit("|"),
            F.concat_ws(",", F.transform("outlinks", lambda x: x.cast("string"))),
        ).alias("value")
    )
    out.write.mode("overwrite").text(path)
