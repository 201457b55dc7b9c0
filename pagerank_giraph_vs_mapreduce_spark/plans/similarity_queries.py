"""Declared similarity-search queries with DuckDB oracles.

Brute-force cosine is the baseline; the hyperplane-LSH variant is the ANN
scale path. Hyperplanes are data-derived (embeddings of vec_id 1..6) so the
oracle reconstructs identical planes without shipping constants. FLOAT
elements are cast to DOUBLE before any arithmetic (float ops differ across
engines; the cast is exact), and cosine values are rounded to 6 dp — the
cross-engine summation-order noise is ~1e-15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
)
from pagerank_giraph_vs_mapreduce_spark.plans.registry import query
from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table

QUERY_ID = 0
N_PLANES = 6
TOP_K = 10

_DOT = (
    "list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
    " p -> p[1] * p[2]))"
)


def _sql_cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


@query(
    "sim_cosine_top10",
    oracle=f"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_ID})
SELECT e.vec_id, round({_sql_cos('e.embedding', 'q.embedding')}, 6) AS cos_sim
FROM embeddings e, q
ORDER BY cos_sim DESC, e.vec_id LIMIT {TOP_K}""",
)
def sim_cosine_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_ID)
    top = cosine_topk(emb, q, k=TOP_K)
    return top.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


_PLANES_SQL = f"""planes AS (
  SELECT vec_id - 1 AS plane_id, embedding FROM embeddings
  WHERE vec_id BETWEEN 1 AND {N_PLANES})"""

_BUCKET_SQL = f"""buckets AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN {_DOT.format(a='e.embedding', b='p.embedding')} > 0
                  THEN 1 << CAST(p.plane_id AS INT) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e, planes p GROUP BY e.vec_id)"""


@query(
    "sim_lsh_buckets",
    oracle=f"""WITH {_PLANES_SQL},
{_BUCKET_SQL}
SELECT vec_id, bucket FROM buckets""",
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-sign LSH bucket id per vector (6 planes → 64 buckets)."""
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        hyperplane_bucket,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    planes = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_PLANES)
    ).select((F.col("vec_id") - 1).alias("plane_id"), "embedding")
    return hyperplane_bucket(emb, planes)


N_CENTROIDS = 8

_CENTROIDS_SQL = f"""cents AS (
  SELECT vec_id - 10 AS centroid_id, embedding FROM embeddings
  WHERE vec_id BETWEEN 10 AND {10 + N_CENTROIDS - 1})"""

_ASSIGN_SQL = """assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({dot}, 6) DESC, c.centroid_id) AS rn
    FROM embeddings e, cents c)
  WHERE rn = 1)""".format(dot=_DOT.format(a="e.embedding", b="c.embedding"))


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(
        (F.col("vec_id") >= 10) & (F.col("vec_id") < 10 + N_CENTROIDS)
    ).select((F.col("vec_id") - 10).alias("centroid_id"), "embedding")


@query(
    "sim_ivf_assign",
    oracle=f"""WITH {_CENTROIDS_SQL},
{_ASSIGN_SQL}
SELECT vec_id, centroid_id FROM assign""",
)
def sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: max-dot centroid per vector (8 data-derived
    centroids standing in for a k-means codebook)."""
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_assign(emb, _centroids(spark, sf_dir))


@query(
    "sim_ivf_top5",
    oracle=f"""WITH {_CENTROIDS_SQL},
{_ASSIGN_SQL},
q AS (SELECT e.embedding, a.centroid_id AS qc FROM embeddings e
      JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id = {QUERY_ID})
SELECT e.vec_id, round({_sql_cos('e.embedding', 'q.embedding')}, 6) AS cos_sim
FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, q
WHERE a.centroid_id = q.qc
ORDER BY cos_sim DESC, e.vec_id LIMIT 5""",
)
def sim_ivf_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (nprobe=1): cosine top-5 within the query's coarse cell."""
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        ivf_cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_ID)
    top = ivf_cosine_topk(emb, q, _centroids(spark, sf_dir), k=5)
    return top.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


_EMB2_SQL = """emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0)"""


@query(
    "dedup_embedding_cosine",
    oracle=f"""WITH {_EMB2_SQL}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_sql_cos('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
WHERE round({_sql_cos('a.embedding', 'b.embedding')}, 6) >= 0.99""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over embeddings + planted verbatim
    copies (vec_id % 10 == 0 at +10000). Spark prunes candidates through
    LSH buckets; the oracle brute-forces all pairs — same survivors."""
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        embedding_near_dups,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    emb2 = emb.unionAll(dups)
    planes = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_PLANES)
    ).select((F.col("vec_id") - 1).alias("plane_id"), "embedding")
    return embedding_near_dups(emb2, planes, threshold=0.99)


@query(
    "sim_lsh_ann_top5",
    oracle=f"""WITH {_PLANES_SQL},
{_BUCKET_SQL},
q AS (SELECT e.embedding, b.bucket FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
      WHERE e.vec_id = {QUERY_ID})
SELECT e.vec_id, round({_sql_cos('e.embedding', 'q.embedding')}, 6) AS cos_sim
FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id, q
WHERE b.bucket = q.bucket
ORDER BY cos_sim DESC, e.vec_id LIMIT 5""",
)
def sim_lsh_ann_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: cosine top-5 restricted to the query's LSH bucket."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_PLANES)
    ).select((F.col("vec_id") - 1).alias("plane_id"), "embedding")
    q = emb.filter(F.col("vec_id") == QUERY_ID)
    top = lsh_cosine_topk(emb, q, planes, k=5)
    return top.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))
