"""Additional declared queries exercising the spark.sql() API path, array
functions, grouping sets, correlated subqueries — and the SNAP text-parse
pipeline (S1-S3/P1) as a declared query over lines synthesized from
lineitem (the driver tables have no text file, so both engines construct
identical lines, including comment/blank/malformed ones, then parse)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.plans.registry import query
from pagerank_giraph_vs_mapreduce_spark.sources.edgelist import parse_edgelist
from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "sql_grouping_sets",
    oracle="""SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the spark.sql() API (same Catalyst plan as the
    DataFrame rollup/cube queries — declared to evidence the SQL surface)."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
    )


@query(
    "sql_exists_correlated",
    oracle="""SELECT o_orderkey, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.5)""",
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (decorrelated by Catalyst into a semi-join)."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """SELECT o_orderkey, o_totalprice FROM orders
           WHERE EXISTS (SELECT 1 FROM lineitem
                         WHERE l_orderkey = o_orderkey AND l_quantity >= 49.5)"""
    )


@query(
    "sql_array_agg",
    oracle="""SELECT l_orderkey,
       array_to_string(list_sort(list(l_linenumber)), ',') AS linenums,
       CAST(len(list(l_linenumber)) AS INT) AS n_lines
FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey""",
)
def sql_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + sort (order-insensitive via array_sort). The
    aggregation stays an ARRAY in-plan; only the output boundary serializes
    it to a canonical comma string so the driver's pandas canonicalizer can
    hash it (list cells are unhashable in pandas)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 100)
        .groupBy("l_orderkey")
        .agg(
            F.array_sort(F.collect_list("l_linenumber")).alias("linenums_arr"),
            F.count(F.lit(1)).cast("int").alias("n_lines"),
        )
        .select(
            "l_orderkey",
            F.concat_ws(",", "linenums_arr").alias("linenums"),
            "n_lines",
        )
    )


@query(
    "sql_array_funcs",
    oracle="""WITH arrs AS (
  SELECT l_orderkey, list_sort(list(l_partkey)) AS parts
  FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey)
SELECT l_orderkey,
       parts[1] AS first_part,
       CAST(len(parts) AS INT) AS n_parts,
       CAST(list_contains(parts, 1) AS BOOLEAN) AS has_part_1,
       CAST(list_sum(list_transform(parts, x -> x % 10)) AS BIGINT) AS mod_sum
FROM arrs""",
)
def sql_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array element access / contains / transform+aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    arrs = (
        li.filter(F.col("l_orderkey") < 200)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_partkey")).alias("parts"))
    )
    return arrs.select(
        "l_orderkey",
        F.element_at("parts", 1).alias("first_part"),
        F.size("parts").alias("n_parts"),
        F.array_contains("parts", 1).alias("has_part_1"),
        F.aggregate(
            F.transform("parts", lambda x: x % 10),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("mod_sum"),
    )


# --- S1-S3/P1 as a declared query: synthesize SNAP lines, then parse ------

_LINES_SQL = """lines AS (
  SELECT CASE
    WHEN l_linenumber = 7 THEN '# synthetic comment line'
    WHEN l_linenumber = 6 THEN ''
    WHEN l_linenumber = 5 THEN concat('x', CAST(l_orderkey AS VARCHAR), ' junk')
    ELSE concat(CAST(l_orderkey % 997 AS VARCHAR), ' ',
                CAST(l_partkey % 1500 AS VARCHAR))
  END AS value
  FROM lineitem)"""


@query(
    "edge_parse_snap",
    oracle=f"""WITH {_LINES_SQL},
parsed AS (
  SELECT TRY_CAST(split_part(trim(value), ' ', 1) AS BIGINT) AS src,
         TRY_CAST(split_part(trim(value), ' ', 2) AS BIGINT) AS dst
  FROM lines
  WHERE trim(value) <> '' AND NOT starts_with(trim(value), '#'))
SELECT src, dst, count(*) AS n
FROM parsed WHERE src IS NOT NULL AND dst IS NOT NULL
GROUP BY src, dst""",
)
def edge_parse_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's text-scan pipeline (S1-S3/P1) as a declared query:
    identical SNAP-ish lines are synthesized in both engines (including
    comment, blank, and malformed lines, which must be dropped), then the
    engine's real parser (sources/edgelist.py) runs on the Spark side."""
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        F.when(F.col("l_linenumber") == 7, "# synthetic comment line")
        .when(F.col("l_linenumber") == 6, "")
        .when(
            F.col("l_linenumber") == 5,
            F.concat(F.lit("x"), F.col("l_orderkey").cast("string"), F.lit(" junk")),
        )
        .otherwise(
            F.concat(
                (F.col("l_orderkey") % 997).cast("string"),
                F.lit(" "),
                (F.col("l_partkey") % 1500).cast("string"),
            )
        )
        .alias("value")
    )
    return parse_edgelist(lines).groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "sql_higher_order",
    oracle="""WITH arrs AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
  FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey)
SELECT l_orderkey,
  coalesce(array_to_string(list_filter(parts, x -> x % 2 = 0), ','), '') AS evens,
  CAST(len(list_filter(parts, x -> x > 1000)) > 0 AS BOOLEAN) AS any_big,
  CAST(len(list_filter(parts, x -> x <= 0)) = 0 AS BOOLEAN) AS all_positive,
  array_to_string(
    list_transform(range(1, CAST(len(parts) AS BIGINT) + 1),
                   i -> parts[CAST(i AS INT)]
                        + parts[CAST(len(parts) AS INT) - CAST(i AS INT) + 1]
  ), ',') AS palindrome_sum
FROM arrs""",
)
def sql_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: filter / exists / forall / zip_with
    (with reverse). All lambda bodies run JVM-side inside codegen — the
    whole point vs a Python UDF doing the same list work. Array-valued
    outputs are serialized to canonical comma strings at the output
    boundary only (pandas cannot hash list cells in the driver check)."""
    li = load_table(spark, sf_dir, "lineitem")
    arrs = (
        li.filter(F.col("l_orderkey") < 100)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    return arrs.select(
        "l_orderkey",
        F.concat_ws(",", F.filter("parts", lambda x: x % 2 == 0)).alias("evens"),
        F.exists("parts", lambda x: x > 1000).alias("any_big"),
        F.forall("parts", lambda x: x > 0).alias("all_positive"),
        F.concat_ws(
            ",", F.zip_with("parts", F.reverse("parts"), lambda x, y: x + y)
        ).alias("palindrome_sum"),
    )


@query(
    "sql_posexplode",
    oracle="""WITH arrs AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
  FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey)
SELECT l_orderkey, u.part AS part,
       CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY u.part) - 1 AS INT) AS pos
FROM arrs, LATERAL unnest(parts) u(part)""",
)
def sql_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral array fan-out with position). The array is
    sorted-distinct, so position ≡ rank-by-value — which is how the
    order-insensitive oracle reconstructs pos deterministically."""
    li = load_table(spark, sf_dir, "lineitem")
    arrs = (
        li.filter(F.col("l_orderkey") < 100)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    return arrs.select(
        "l_orderkey", F.posexplode("parts").alias("pos", "part")
    ).select("l_orderkey", "part", "pos")


@query(
    "sql_unpivot",
    oracle="""SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
FROM lineitem WHERE l_orderkey < 50
UNION ALL
SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val
FROM lineitem WHERE l_orderkey < 50
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount' AS metric, l_discount AS val
FROM lineitem WHERE l_orderkey < 50""",
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt): three measure columns into (metric, val)
    rows — the inverse of rel_pivot. Values are per-row doubles (no
    aggregation), so they hash-match raw."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .withColumnsRenamed(
            {"l_quantity": "quantity", "l_extendedprice": "price", "l_discount": "discount"}
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["quantity", "price", "discount"],
            "metric",
            "val",
        )
    )


@query(
    "sql_map_funcs",
    oracle="""WITH lines AS (
  SELECT l_orderkey, l_linenumber, min(l_partkey) AS pk
  FROM lineitem WHERE l_orderkey < 100
  GROUP BY l_orderkey, l_linenumber)
SELECT l_orderkey,
       max(CASE WHEN l_linenumber = 1 THEN pk END) AS part_line1,
       CAST(count(*) AS INT) AS n_entries,
       string_agg(l_linenumber || ':' || pk, ',' ORDER BY l_linenumber) AS entries
FROM lines GROUP BY l_orderkey""",
)
def sql_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type surface: build a linenumber->partkey map per order
    (map_from_entries over sorted deduped entries), probe it with
    element_at, measure it with size, and serialize map_entries to a
    canonical string at the output boundary (pandas cannot hash map
    cells; the map computation itself stays in-plan). The oracle produces
    the same rows relationally — maps are a Spark-side representation
    choice, not a semantic one."""
    li = load_table(spark, sf_dir, "lineitem")
    lines = (
        li.filter(F.col("l_orderkey") < 100)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.min("l_partkey").alias("pk"))
    )
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("l_linenumber", "pk")))
    )
    return (
        lines.groupBy("l_orderkey")
        .agg(m.alias("m"))
        .select(
            "l_orderkey",
            F.element_at("m", 1).alias("part_line1"),
            F.size("m").alias("n_entries"),
            F.concat_ws(
                ",",
                F.transform(
                    F.map_entries("m"),
                    lambda e: F.concat_ws(":", e["key"], e["value"]),
                ),
            ).alias("entries"),
        )
    )


@query(
    "sql_lateral_topk",
    oracle="""SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, round(c_acctbal, 6) AS c_acctbal
         FROM customer c WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c.c_acctbal DESC, c_name LIMIT 2) t""",
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-outer-row ORDER BY + LIMIT —
    the top-K-per-group idiom written the SQL-standard way instead of a
    window + filter. Catalyst decorrelates it into the same
    rank-and-filter shape the window formulation plans to, so the
    declared surface covers both spellings; the lateral form is what
    users migrating warehouse SQL bring with them."""
    _register(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """SELECT n.n_name, t.c_name, t.c_acctbal
           FROM nation n,
           LATERAL (SELECT c_name, round(c_acctbal, 6) AS c_acctbal
                    FROM customer c WHERE c.c_nationkey = n.n_nationkey
                    ORDER BY c.c_acctbal DESC, c_name LIMIT 2) t"""
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_PIVOT_ORACLE = "SELECT user_id, " + ", ".join(
    f"CAST(round(sum(CAST(value AS DECIMAL(38,12))) "
    f"FILTER (WHERE event_type = '{t}'), 6) AS DOUBLE) AS {t}_value"
    for t in _EVENT_TYPES
) + " FROM events GROUP BY user_id"


@query("sql_pivot", oracle=_PIVOT_ORACLE)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard PIVOT: per-user value totals fanned out to one column
    per event type. Catalyst rewrites PIVOT into a single conditional
    aggregation (one scan, one shuffle keyed on user_id, map-side
    combined) — identical plan to the FILTER-clause spelling the oracle
    uses, so the declared surface covers both. Sums go through exact
    DECIMAL per the repo's hash-stability rules; a user with no events of
    a type gets NULL in both engines."""
    _register(spark, sf_dir, "events")
    in_list = ", ".join(f"'{t}' AS {t}_value" for t in _EVENT_TYPES)
    return spark.sql(
        f"""SELECT * FROM (SELECT user_id, event_type, value FROM events)
            PIVOT (CAST(round(sum(CAST(value AS DECIMAL(38,12))), 6) AS DOUBLE)
                   FOR event_type IN ({in_list}))"""
    )
