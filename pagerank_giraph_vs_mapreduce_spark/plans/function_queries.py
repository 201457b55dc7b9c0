"""Scalar-function parity queries.

``fn_c5_c6`` exercises exactly the reference's scalar surface (SURVEY.md
§2.5): abs/ceil/max(0,·) (C5 — MR/PageRankReducer.java:113-125) and
split/join/trim/startswith/substring/indexOf (C6 — the R1/R2 codec
functions). The others add the math/date breadth any relational engine
user expects; libm-backed functions (exp/ln) are rounded because they are
not correctly-rounded and differ across engines' libm builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.plans.registry import query
from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table


@query(
    "fn_c5_c6",
    oracle="""SELECT p_partkey,
  abs(p_retailprice - 1000.0) AS abs_delta,
  CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS ceil_bucket,
  greatest(p_size - 25, 0) AS clamped_size,
  split_part(p_name, ' ', 1) AS first_word,
  concat_ws(',', p_brand, p_type) AS joined,
  trim(concat('  ', p_name, '  ')) AS trimmed,
  starts_with(p_name, 'small') AS is_small,
  substr(p_type, 1, 4) AS type4,
  CAST(strpos(p_name, ' ') AS BIGINT) AS space_at
FROM part""",
)
def fn_c5_c6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact scalar-function inventory as one projection."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_delta"),
        F.ceil(F.col("p_retailprice") / 100.0).cast("bigint").alias("ceil_bucket"),
        F.greatest(F.col("p_size") - 25, F.lit(0)).alias("clamped_size"),
        F.substring_index("p_name", " ", 1).alias("first_word"),
        F.concat_ws(",", "p_brand", "p_type").alias("joined"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.instr("p_name", " ").cast("bigint").alias("space_at"),
    )


@query(
    "fn_math",
    oracle="""SELECT l_orderkey, l_linenumber,
  round(sqrt(l_extendedprice), 6) AS sqrt_price,
  round(ln(l_extendedprice), 6) AS ln_price,
  round(exp(l_discount), 6) AS exp_disc,
  round(pow(1.0 + l_tax, 2), 6) AS tax_sq,
  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
  CAST(sign(l_extendedprice - 30000.0) AS BIGINT) AS price_sign
FROM lineitem WHERE l_orderkey < 500""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions; exp/ln rounded (libm is not correctly-rounded)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.signum(F.col("l_extendedprice") - 30000.0).cast("bigint").alias("price_sign"),
    )


@query(
    "fn_date_arith",
    oracle="""SELECT o_orderkey,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  date_diff('day', TIMESTAMP '1994-01-01', o_orderdate) AS days_since_epoch_94,
  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
  CAST(quarter(o_orderdate) AS BIGINT) AS q
FROM orders WHERE o_orderkey < 1000""",
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic + parts (DuckDB dayofweek: Sunday=0; Spark: 1..7)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1994-01-01")).cast("bigint").alias(
            "days_since_epoch_94"
        ),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
    )


@query(
    "fn_agg_breadth",
    oracle="""SELECT o_orderstatus,
  min_by(o_orderkey, o_totalprice) AS cheapest_order,
  max_by(o_orderkey, o_totalprice) AS priciest_order,
  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
  bool_and(o_totalprice > 0) AS all_positive,
  bool_or(o_orderpriority = '1-URGENT') AS any_urgent
FROM orders GROUP BY o_orderstatus""",
)
def fn_agg_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by, filtered count, boolean aggregates.

    min_by/max_by ties would be nondeterministic, but o_totalprice values
    collide with probability ~0 in this data; tie-free verified by the
    oracle match itself.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
    )


@query(
    "fn_null_semantics",
    oracle="""SELECT
  coalesce(NULL, NULL, 'fallback') AS c3,
  nullif('a', 'a') AS n1,
  nullif('a', 'b') AS n2,
  ifnull(NULL, 42) AS i1,
  count(*) AS n_rows,
  count(nullif(o_orderstatus, 'P')) AS n_not_p
FROM orders""",
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling functions + count's NULL-skipping contract."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.coalesce(F.lit(None), F.lit(None), F.lit("fallback")).alias("c3"),
        F.nullif(F.lit("a"), F.lit("a")).alias("n1"),
        F.nullif(F.lit("a"), F.lit("b")).alias("n2"),
        F.ifnull(F.lit(None), F.lit(42)).alias("i1"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.nullif(F.col("o_orderstatus"), F.lit("P"))).alias("n_not_p"),
    )


@query(
    "fn_win_frames",
    oracle="""SELECT o_custkey, o_orderkey,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice)  OVER w AS last_price,
  nth_value(o_totalprice, 2) OVER w AS second_price,
  round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
)
def fn_win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame specs: full-partition frame + 3-row moving average."""
    o = load_table(spark, sf_dir, "orders")
    full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    mov = (
        Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(full).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        F.round(F.avg("o_totalprice").over(mov), 6).alias("mov_avg3"),
    )


@query(
    "fn_stats_agg",
    oracle="""SELECT o_orderstatus,
  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
  round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
  round(median(o_totalprice), 6) AS med,
  round(stddev_samp(o_totalprice), 4) AS sd,
  round(var_samp(o_totalprice), 2) AS var,
  CAST(sum(CAST(o_totalprice AS DECIMAL(28, 6))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderstatus""",
)
def fn_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: continuous percentiles, median, sample
    stddev/variance.

    Determinism: percentile_cont interpolates between two order statistics
    of the sorted values — engine-independent up to one IEEE op, round(6).
    stddev/var accumulate sums of squares in engine-specific order →
    rounded coarser (4/2 dp ≈ 1e-10 relative on these magnitudes). The
    plain sum goes through DECIMAL like every other money aggregate here.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 6).alias("p50"),
        F.round(F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)"), 6).alias("p90"),
        F.round(F.median("o_totalprice"), 6).alias("med"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double").alias("total"),
    )


@query(
    "fn_hash_sample",
    oracle="""SELECT count(*) AS n_sampled,
  CAST(sum(CAST(o_totalprice AS DECIMAL(28, 6))) AS DOUBLE) AS sampled_total
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'""",
)
def fn_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via md5-prefix filter (md5 is standardized,
    so the SAME rows are selected by any engine, any cluster layout, any
    run — unlike rng-based TABLESAMPLE, whose selection is seed- and
    partitioning-dependent).

    This is the reproducible-sampling pattern a 100 TB training-data
    pipeline needs: the sample is a pure row-local predicate (pushes to the
    scan, no shuffle), stable under retries/re-partitioning, and composable
    (rate = prefix threshold; '1a'/256 ≈ 10.2%).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double").alias("sampled_total"),
    )


@query(
    "fn_sketch_bounds",
    oracle="""SELECT
  count(DISTINCT o_custkey) AS n_exact,
  TRUE AS hll_within_3pct,
  TRUE AS approx_p50_within_1pct
FROM orders""",
)
def fn_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (HyperLogLog++ distinct count, approx
    percentile) validated IN-PLAN against their exact counterparts.

    Sketch outputs are estimator-specific and can never hash-match another
    engine, so the declared result is the *error-bound check*: Spark
    computes both the sketch and the exact value and emits whether the
    sketch landed inside its error envelope (HLL++ rsd=0.01 with a
    3-sigma bound — rsd is a standard deviation, not a hard cap, so the
    1-sigma bound is wrong ~1/3 of the time; approx_percentile accuracy
    10000 ≈ 1e-4 rank error, 1% value slack). HLL++ is deterministic for
    a fixed input, so the checks are stable, not flaky. The oracle
    independently recomputes the exact value and asserts
    the bounds hold (literal TRUE). At 100 TB the sketches are the only
    option — single-pass, bounded memory, mergeable across partitions —
    and this query is the harness proving they stay honest.
    """
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("n_hll"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("p50_approx"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50_exact"),
    )
    return row.select(
        "n_exact",
        (
            F.abs(F.col("n_hll") - F.col("n_exact"))
            <= 0.03 * F.col("n_exact")
        ).alias("hll_within_3pct"),
        (
            F.abs(F.col("p50_approx") - F.col("p50_exact"))
            <= 0.01 * F.col("p50_exact")
        ).alias("approx_p50_within_1pct"),
    )


@query(
    "fn_hll_union_rollup",
    oracle="""SELECT n.n_regionkey AS region,
  CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_exact,
  TRUE AS union_within_5pct
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_regionkey""",
)
def fn_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup — the incremental-OLAP pattern: per-nation
    DataSketches HLL sketches of customer keys are built ONCE, then
    region-level distinct counts come from ``hll_union_agg`` over the
    stored sketches — no rescan of the base data. This is how a 100 TB
    cube maintains COUNT(DISTINCT) at every rollup level: sketches are
    a few KB each, merge associatively (so partial aggregation and
    incremental day-over-day folds both work), and re-aggregate to any
    grouping without touching the fact table again.

    Sketch estimates can't hash-match another engine, so (same contract
    as fn_sketch_bounds) the declared result is exact value + in-plan
    error-envelope check: lgConfigK=12 ⇒ rsd ≈ 1.04/√4096 ≈ 1.6%,
    checked at ~3σ (5%). DataSketches HLL is deterministic for fixed
    input — stable, not flaky."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey, 12)").alias("sk"),
        F.countDistinct("c_custkey").alias("n_nation_exact"),
    )
    rolled = (
        per_nation.join(
            F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey")
        )
        .groupBy(F.col("n_regionkey").alias("region"))
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, true))").alias("est"),
            F.sum("n_nation_exact").alias("n_exact"),
        )
    )
    return rolled.select(
        "region",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("union_within_5pct"),
    )


@query(
    "fn_cms_heavy_hitters",
    oracle="""WITH js(j) AS (VALUES (0), (1), (2)),
buckets AS (
  SELECT j,
    CAST(('0x' || substr(md5('cms' || j || ':' || CAST(user_id AS VARCHAR)), 1, 15))
         AS UBIGINT) % 256 AS b
  FROM events, js
),
sketch AS (SELECT j, b, count(*) AS c FROM buckets GROUP BY 1, 2),
users AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1),
probes AS (
  SELECT user_id, exact_cnt, j,
    CAST(('0x' || substr(md5('cms' || j || ':' || CAST(user_id AS VARCHAR)), 1, 15))
         AS UBIGINT) % 256 AS b
  FROM users, js
),
est AS (
  SELECT user_id, exact_cnt, min(c) AS cms_est
  FROM probes JOIN sketch USING (j, b) GROUP BY 1, 2
)
SELECT user_id, exact_cnt, cms_est, cms_est >= exact_cnt AS never_underestimates
FROM est WHERE cms_est >= 75""",
)
def fn_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters, hash-matchable across engines.

    Unlike ``fn_sketch_bounds``/``fn_hll_union_rollup`` (whose estimators
    are library-specific, so only error envelopes are comparable), this CMS
    is built from first principles on md5 — a hash both engines compute
    identically — so the oracle reproduces the sketch bit-for-bit and the
    gate checks exact estimates, not just bounds. d=3 rows x w=256 buckets;
    row hashes are the top 60 bits of md5("cms{j}:" || key) mod w.

    Scale shape: the sketch build is ONE pass over events (explode to d
    rows per event, then a map-side-combinable groupBy on (j, bucket) —
    3*w=768 cells total regardless of input size); the probe side joins
    the 768-cell sketch BROADCAST against the distinct keys. At 100 TB
    the sketch is the only fixed-memory way to screen for heavy keys
    before an exact per-key count of the survivors; the CMS one-sided
    error guarantee (never underestimates) is asserted per row."""
    ev = load_table(spark, sf_dir, "events")
    w, d, thresh = 256, 3, 75

    def bucket(j: int, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{j}:"), col.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            % w
        )

    jb = lambda col: F.explode(  # noqa: E731
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), bucket(j, col).alias("b"))
                for j in range(d)
            ]
        )
    ).alias("jb")
    sketch = (
        ev.select(jb(F.col("user_id")))
        .select(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = users.select("user_id", "exact_cnt", jb(F.col("user_id"))).select(
        "user_id",
        "exact_cnt",
        F.col("jb.j").alias("j"),
        F.col("jb.b").alias("b"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .filter(F.col("cms_est") >= thresh)
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_underestimates"),
        )
    )


def _kmv_setops_oracle() -> str:
    h = (
        "CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))"
        " AS UBIGINT)"
    )
    u_est = """CASE WHEN ku.k < 256 THEN ku.k
       ELSE CAST(floor(255.0 * 1152921504606846976
                       / CAST(ku.theta AS DOUBLE)) AS BIGINT) END"""
    return f"""WITH ha AS (
  SELECT DISTINCT {h} AS h FROM customer WHERE c_custkey % 3 <> 0),
hb AS (
  SELECT DISTINCT {h} AS h FROM customer WHERE c_custkey % 2 <> 0),
sa AS (SELECT h FROM ha ORDER BY h LIMIT 256),
sb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
u AS (SELECT DISTINCT h
      FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
      ORDER BY h LIMIT 256),
ku AS (SELECT max(h) AS theta, count(*) AS k FROM u),
p AS (SELECT count(*) AS pc FROM sa JOIN sb USING (h), ku
      WHERE sa.h <= ku.theta),
ex AS (SELECT
  count(DISTINCT CASE WHEN c_custkey % 3 <> 0 OR c_custkey % 2 <> 0
                      THEN c_custkey END) AS n_exact_union,
  count(DISTINCT CASE WHEN c_custkey % 3 <> 0 AND c_custkey % 2 <> 0
                      THEN c_custkey END) AS n_exact_inter
  FROM customer)
SELECT ex.n_exact_union, ex.n_exact_inter,
  {u_est} AS kmv_union_est,
  CAST(floor(CAST(p.pc * ({u_est}) AS DOUBLE) / ku.k) AS BIGINT)
    AS kmv_inter_est,
  abs({u_est} - ex.n_exact_union) <= 0.20 * ex.n_exact_union
    AS union_within_20pct,
  abs(CAST(floor(CAST(p.pc * ({u_est}) AS DOUBLE) / ku.k) AS BIGINT)
      - ex.n_exact_inter) <= 0.25 * ex.n_exact_inter AS inter_within_25pct
FROM ex, ku, p"""


@query("fn_kmv_set_ops", oracle=_kmv_setops_oracle())
def fn_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch SET OPERATIONS — the capability that picks KMV
    over HLL (fn_kmv_distinct's docstring promise, now implemented):
    distinct-count estimates for the UNION and INTERSECTION of two sets
    from their 2 KB sketches alone. Sets: customers with custkey%3!=0
    (A) vs custkey%2!=0 (B) — deterministic, genuinely overlapping.

    Estimators (Beyer et al. 2007): the union sketch is the K smallest
    of the two sketches' union (mergeability); theta = its K-th value;
    |A∪B| ~ (K-1)*2^60/theta; |A∩B| ~ |{h in SA∩SB : h <= theta}| *
    |A∪B|_est / k, with k the combined sketch's actual size — so when
    the sketches are not full (sf0.001) both estimates are EXACT by
    construction (the guard fn_kmv_distinct carries). Rebuilt from md5
    primitives in the oracle, so the gate compares the exact integer
    estimates, not an error envelope; measured error on this table:
    union exact, intersection +8.2% (bounds: 20%/25% ~ 3 sigma).

    Scale shape: two TakeOrderedAndProject sketch builds (per-partition
    K-heaps, no data shuffle) and then arithmetic over <=3*K rows."""
    cust = load_table(spark, sf_dir, "customer")
    kk = 256
    h = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 15), 16, 10
    ).cast("bigint")

    def sketch(pred):
        return (
            cust.filter(pred)
            .select(h.alias("h"))
            .distinct()
            .orderBy("h")
            .limit(kk)
        )

    sa = sketch(F.col("c_custkey") % 3 != 0)
    sb = sketch(F.col("c_custkey") % 2 != 0)
    u = sa.unionAll(sb).distinct().orderBy("h").limit(kk)
    ku = u.agg(F.max("h").alias("theta"), F.count("*").alias("k"))
    p = (
        sa.join(sb, "h")
        .crossJoin(F.broadcast(ku))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).alias("pc"))
    )
    ex = cust.agg(
        F.countDistinct(
            F.when(
                (F.col("c_custkey") % 3 != 0) | (F.col("c_custkey") % 2 != 0),
                F.col("c_custkey"),
            )
        ).alias("n_exact_union"),
        F.countDistinct(
            F.when(
                (F.col("c_custkey") % 3 != 0) & (F.col("c_custkey") % 2 != 0),
                F.col("c_custkey"),
            )
        ).alias("n_exact_inter"),
    )
    u_est = F.when(F.col("k") < kk, F.col("k")).otherwise(
        F.floor(
            F.lit(float(kk - 1)) * F.lit(float(2**60))
            / F.col("theta").cast("double")
        ).cast("bigint")
    )
    i_est = F.floor(
        (F.col("pc") * u_est).cast("double") / F.col("k")
    ).cast("bigint")
    return (
        ex.crossJoin(F.broadcast(ku))
        .crossJoin(F.broadcast(p))
        .select(
            "n_exact_union",
            "n_exact_inter",
            u_est.alias("kmv_union_est"),
            i_est.alias("kmv_inter_est"),
            (F.abs(u_est - F.col("n_exact_union")) <= 0.20 * F.col("n_exact_union")).alias(
                "union_within_20pct"
            ),
            (F.abs(i_est - F.col("n_exact_inter")) <= 0.25 * F.col("n_exact_inter")).alias(
                "inter_within_25pct"
            ),
        )
    )


@query(
    "fn_kmv_distinct",
    oracle="""WITH h AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
              AS UBIGINT) AS h
  FROM customer
),
k AS (SELECT max(h) AS hk, count(*) AS n_sk
      FROM (SELECT h FROM h ORDER BY h LIMIT 256)),
e AS (SELECT count(DISTINCT c_custkey) AS n_exact FROM customer)
SELECT n_exact,
  CASE WHEN n_sk < 256 THEN n_sk
       ELSE CAST(floor(255.0 * 1152921504606846976 / CAST(hk AS DOUBLE))
                 AS BIGINT) END AS kmv_est,
  abs(CASE WHEN n_sk < 256 THEN n_sk
       ELSE CAST(floor(255.0 * 1152921504606846976 / CAST(hk AS DOUBLE))
                 AS BIGINT) END
      - n_exact) <= 0.20 * n_exact AS within_20pct
FROM k, e""",
)
def fn_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch, hash-matchable across engines.

    KMV (Bar-Yossef et al. 2002; the core of Theta sketches): keep the K
    smallest 60-bit md5 hashes of the keys; if the K-th smallest is h_K,
    the estimate is (K-1) * 2^60 / h_K. Like fn_cms_heavy_hitters, the
    estimator is rebuilt from md5 primitives in the oracle, so the gate
    compares the exact estimate (floored to BIGINT — both engines do the
    identical int64->double cast and IEEE division), not just a bound.
    The within_20pct column is ~3 sigma at K=256 (rse = 1/sqrt(K-2) ~
    6.3%); measured error on this table is 6.4%. When the table holds
    fewer than K distinct keys the sketch is not full, h_K is the max
    hash of the whole table and the ratio estimator is badly biased —
    standard KMV practice returns the observed sketch size (which is the
    exact distinct count) instead; both engines apply the same guard.

    Scale shape: "K smallest" is TakeOrderedAndProject — each partition
    keeps a local K-heap, the driver merges P*K values — no global sort,
    no shuffle of the data. The sketch is mergeable (union = K smallest
    of the concatenated sketches), which is what a 100 TB cube wants for
    incremental distinct counts; vs HLL it also supports intersection
    estimates. K=256 is 2 KB per sketch."""
    cust = load_table(spark, sf_dir, "customer")
    kk = 256
    h = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    kmin = (
        cust.select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(kk)
        .agg(F.max("h").alias("hk"), F.count("*").alias("n_sk"))
    )
    exact = cust.agg(F.countDistinct("c_custkey").alias("n_exact"))
    ratio_est = F.floor(
        F.lit(float(kk - 1)) * F.lit(float(2**60)) / F.col("hk").cast("double")
    ).cast("bigint")
    # sketch not full -> n_sk IS the exact distinct count; the ratio
    # estimator on a non-full sketch is meaningless (h_K = table max hash)
    est = F.when(F.col("n_sk") < kk, F.col("n_sk")).otherwise(ratio_est)
    return (
        kmin.crossJoin(exact)
        .select(
            "n_exact",
            est.alias("kmv_est"),
            (F.abs(est - F.col("n_exact")) <= 0.20 * F.col("n_exact")).alias(
                "within_20pct"
            ),
        )
    )


# ------------------------------------------------- binned quantile sketch

# Fixed-grid histogram quantile sketch — the quantile member of the
# sketch family (HLL distinct / CMS frequency / KMV-theta set ops):
# 128 uniform bins over the DECLARED domain [0, 512) (events.value is
# bounded by construction; out-of-range values clip into the end bins,
# which only widens the error bound, never drops mass). Per-bin counts
# are a map-side-combined hash agg — mergeable across shards/streams by
# plain addition, fixed 128-counter memory, the same deployment shape
# as the other sketches. Estimates interpolate linearly inside the
# target bin, so the error is bounded by one bin width (4.0) — unlike
# rel_exact_quantiles' two-phase exact medians, this never moves more
# than 128 counters after the scan.
QSK_BINS = 128
QSK_LO, QSK_HI = 0.0, 512.0
QSK_W = (QSK_HI - QSK_LO) / QSK_BINS
QSK_QS = (0.5, 0.95, 0.99)


def _qsketch_oracle() -> str:
    qs_rows = ", ".join(f"({q})" for q in QSK_QS)
    return f"""WITH b AS (
  SELECT CAST(least(greatest(floor((value - {QSK_LO}) / {QSK_W}), 0),
              {QSK_BINS - 1}) AS BIGINT) AS bin,
         count(*) AS c
  FROM events GROUP BY 1),
cum AS (
  SELECT bin, c,
         sum(c) OVER (ORDER BY bin) AS cum,
         coalesce(sum(c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_before,
         (SELECT sum(c) FROM b) AS n
  FROM b),
qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {qs_rows}) t(q)),
hit AS (
  SELECT q, bin, c, cum_before, n,
         row_number() OVER (PARTITION BY q ORDER BY bin) AS rk
  FROM qs JOIN cum ON cum.cum >= ceil(q * cum.n))
SELECT q, CAST(n AS BIGINT) AS n,
       round({QSK_LO} + (bin + (ceil(q * n) - cum_before) / c) * {QSK_W}, 6)
         AS est
FROM hit WHERE rk = 1"""


@query("fn_quantile_sketch", oracle=_qsketch_oracle())
def fn_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of events.value from the 128-bin histogram sketch (see
    the module note above QSK_BINS): one map-side-combined scan into 128
    counters, a 128-row cumulative window, linear interpolation inside
    the hit bin — error bounded by one bin width, memory fixed, counts
    mergeable by addition. Interpolation inputs are integers (cum
    counts, ceil(q·n)); each estimate is one division and one
    multiply-add, rounded to 6 dp — identical IEEE sequence both
    engines."""
    e = load_table(spark, sf_dir, "events")
    b = (
        e.select(
            F.least(
                F.greatest(
                    F.floor((F.col("value") - QSK_LO) / QSK_W), F.lit(0)
                ),
                F.lit(QSK_BINS - 1),
            )
            .cast("bigint")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_bef = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    n_df = b.agg(F.sum("c").alias("n"))
    cum = b.select(
        "bin",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.coalesce(F.sum("c").over(w_bef), F.lit(0)).alias("cum_before"),
    ).crossJoin(F.broadcast(n_df))
    qs = spark.createDataFrame([(q,) for q in QSK_QS], "q double")
    hit = (
        qs.join(cum, cum.cum >= F.ceil(F.col("q") * F.col("n")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("q").orderBy("bin")
            ),
        )
        .filter(F.col("rk") == 1)
    )
    return hit.select(
        "q",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            QSK_LO
            + (
                F.col("bin")
                + (F.ceil(F.col("q") * F.col("n")) - F.col("cum_before"))
                / F.col("c")
            )
            * QSK_W,
            6,
        ).alias("est"),
    )
