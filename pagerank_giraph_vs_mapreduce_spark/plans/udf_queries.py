"""User-extensible function surface (SURVEY.md §2.9 — absent in the
reference; mandated by the extension charter): Arrow-vectorized scalar
pandas UDF, grouped-map applyInPandas, and a Python UDTF — each with a
DuckDB oracle proving the Python path computes exactly what the SQL spells
out. (mapInPandas and applyInPandasWithState live in multimodal/streaming.)

UDFs are the slow path by design — these exist to prove the plumbing and
its correctness, not for operations the built-ins already cover. The
pandas_udf/udtf decorators resolve their return types against the active
session, so they are constructed lazily inside each query.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.plans.registry import query
from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table


def _norm_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm_text(s: pd.Series) -> pd.Series:
        """Vectorized normalize: trim + lowercase + collapse space runs."""
        return s.str.strip().str.lower().str.replace(r" +", " ", regex=True)

    return norm_text


@query(
    "udf_pandas_normalize",
    oracle="""SELECT doc_id,
       lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm,
       CAST(length(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS BIGINT)
         AS norm_len
FROM documents""",
)
def udf_pandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF vs the equivalent SQL expression."""
    d = load_table(spark, sf_dir, "documents")
    norm_text = _norm_udf()
    return d.select(
        "doc_id",
        norm_text(F.col("text")).alias("norm"),
        F.length(norm_text(F.col("text"))).cast("bigint").alias("norm_len"),
    )


@query(
    "udf_grouped_zscore",
    oracle="""WITH stats AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS mu,
         count(*) AS n
  FROM orders GROUP BY o_custkey)
SELECT o.o_orderkey, o.o_custkey,
       round(CASE WHEN s.n > 1 THEN (o.o_totalprice - s.mu) ELSE 0.0 END, 6)
         AS delta_from_mean
FROM orders o JOIN stats s ON o.o_custkey = s.o_custkey""",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer mean-delta of order totals.

    The pandas side reproduces the oracle's exact arithmetic: an
    order-independent exact mean (Python integer arithmetic over
    picodollars — pandas' float sum would be order-dependent across
    shuffles), then a per-row float delta, rounded.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > 1:
            total = sum(int(round(v * 1e12)) for v in pdf["o_totalprice"])
            mu = (total / 1e12) / n
            delta = (pdf["o_totalprice"] - mu).round(6)
        else:
            delta = pd.Series([0.0] * n, index=pdf.index)
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "delta_from_mean": delta,
            }
        )

    return o.groupBy("o_custkey").applyInPandas(
        per_group, "o_orderkey bigint, o_custkey bigint, delta_from_mean double"
    )


@query(
    "udf_udtf_tokenize",
    oracle="""SELECT doc_id,
       CAST(unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS INT) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents WHERE doc_id < 20""",
)
def udf_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) exploding docs into positioned tokens."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for pos, tok in enumerate(text.split(" ")):
                yield (pos, tok)

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
    )
    spark.udtf.register("tokenize_udtf", Tokenize)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """SELECT d.doc_id, t.pos, t.token
           FROM docs_for_udtf d, LATERAL tokenize_udtf(d.doc_id, d.text) t"""
    )


@query(
    "udf_grouped_agg_wmean",
    oracle="""SELECT l_returnflag,
       round(sum(l_quantity * l_linenumber) / sum(l_linenumber), 9)
         AS wmean_qty
FROM lineitem GROUP BY l_returnflag""",
)
def udf_grouped_agg_wmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (the vectorized UDAF surface — the one
    pandas-UDF flavor the other udf_* queries don't exercise): per return
    flag, quantity weighted-mean with line-number weights.

    Exists to prove the surface, not as the recommended plan: a grouped-agg
    pandas UDF ships every group's rows to Python with NO partial
    aggregation (built-in sum/avg would combine map-side). Float
    determinism: quantity and weight are small integer-valued, so every
    partial product/sum is an exact integer below 2^53 — bit-identical in
    any summation order and engine; the single division is then rounded."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            wmean(F.col("l_quantity"), F.col("l_linenumber").cast("double")), 9
        ).alias("wmean_qty")
    )


@query(
    "udf_arrow_optimized",
    oracle="""SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
         AS n_words,
       upper(substr(text, 1, 12)) AS head_up
FROM documents""",
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ARROW-OPTIMIZED scalar Python UDF (``useArrow=True``):
    row-at-a-time author ergonomics with Arrow-batched transfer —
    ~2-5x over pickled row UDFs without rewriting to pandas Series.
    Still slower than builtin expressions (docstring discipline: UDFs
    only where expressions can't express the logic — this query exists
    to certify the API path, not to recommend it for string ops)."""
    from pyspark.sql.functions import udf

    @udf(returnType="n_words bigint, head_up string", useArrow=True)
    def word_stats(text: str):
        return (text.count(" ") + 1, text[:12].upper())

    d = load_table(spark, sf_dir, "documents")
    out = d.select("doc_id", word_stats(F.col("text")).alias("s"))
    return out.select(
        "doc_id",
        F.col("s.n_words").alias("n_words"),
        F.col("s.head_up").alias("head_up"),
    )
