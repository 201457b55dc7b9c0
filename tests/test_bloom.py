"""Bloom runtime-filter operator (operators/bloom.py): exactness of the
filtered semi join, structural false-negative freedom, and actual pruning."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


def _fixture(spark, n_facts=2000, n_dim=60, seed=7):
    rng = random.Random(seed)
    facts = spark.createDataFrame(
        [(i, rng.randrange(400)) for i in range(n_facts)],
        "row_id bigint, k bigint",
    )
    dim = spark.createDataFrame(
        [(rng.randrange(400),) for _ in range(n_dim)], "dk bigint"
    )
    return facts, dim


def test_bloom_semi_join_equals_exact_semi_join(spark):
    facts, dim = _fixture(spark)
    got = sorted(
        r["row_id"] for r in bloom_semi_join(facts, "k", dim, "dk").collect()
    )
    want = sorted(
        r["row_id"]
        for r in facts.join(
            dim.select(F.col("dk").alias("k")).distinct(), "k", "left_semi"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_never_false_negative_even_when_saturated(spark):
    # 64 bits / 1 hash: heavy collisions, many false positives — but every
    # true member must still pass the probe.
    facts, dim = _fixture(spark)
    bloom = bloom_build(dim, "dk", n_bits=64, n_hashes=1)
    passed = {
        r["k"]
        for r in bloom_might_contain(
            facts, "k", bloom, n_bits=64, n_hashes=1
        ).collect()
    }
    members = {r["dk"] for r in dim.collect()}
    fact_keys = {r["k"] for r in facts.collect()}
    assert (members & fact_keys) <= passed


def test_bloom_prunes_most_nonmembers_at_default_size(spark):
    # 60 keys in a 65536-bit / 3-hash filter: expected FP rate ~(kn/m)^k,
    # essentially zero here — the pre-filter should pass only true matches
    # plus at most a handful of false positives.
    facts, dim = _fixture(spark)
    bloom = bloom_build(dim, "dk")
    pre = bloom_might_contain(facts, "k", bloom).count()
    exact = facts.join(
        dim.select(F.col("dk").alias("k")).distinct(), "k", "left_semi"
    ).count()
    assert exact <= pre <= exact + 50
    assert pre < facts.count()  # it actually pruned


def test_bloom_broadcast_probe_no_shuffle_on_fact_side(spark):
    facts, dim = _fixture(spark)
    bloom = bloom_build(dim, "dk")
    plan = (
        bloom_might_contain(facts, "k", bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # probe = broadcast of the 1-row bitmap into the fact scan; the fact
    # side must reach the filter without an Exchange
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    fact_branch = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in fact_branch
