"""Round-11 operator tests: binned degree-Gini (error bound vs the exact
form, plan pin) — VERDICT r10 What's-wrong #1 / Next-round #2."""

from __future__ import annotations

import math
from fractions import Fraction

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.plans.graph_queries import (
    GINI_D0,
    binned_degree_gini,
)

# Peak relative bin width of the sqrt bins: (2k+1)/(GINI_D0+k^2) at k=32.
_GINI_REL_W = Fraction(65, 2048)


def _bin(d: int) -> int:
    return d if d < GINI_D0 else GINI_D0 + math.isqrt(d - GINI_D0)


def _gini_exact(degs: list[int]) -> Fraction:
    ds = sorted(degs)
    n, s = len(ds), sum(ds)
    t = 2 * sum(r * d for r, d in enumerate(ds, start=1))
    return Fraction(t - (n + 1) * s, n * s)


def _gini_binned(degs: list[int]) -> Fraction:
    groups: dict[int, list[int]] = {}
    for d in degs:
        groups.setdefault(_bin(d), []).append(d)
    n_tot, s_tot, t, cb = len(degs), sum(degs), 0, 0
    for b in sorted(groups):
        n_b, s_b = len(groups[b]), sum(groups[b])
        t += s_b * (2 * cb + n_b + 1)
        cb += n_b
    return Fraction(t - (n_tot + 1) * s_tot, n_tot * s_tot)


def test_binned_gini_exact_below_d0_and_bounded_above(spark):
    """Identity bins below GINI_D0 mean ZERO binning error whenever max
    degree < 1024; with hubs above, the grouped Gini underestimates the
    exact one by at most (65/2048)*(1 + N/S) — the per-bin relative-width
    bound (|d_i - m_b| <= width_b <= r*(m_b+1), cov_b <= (r/2)*n_b*
    (s_b+n_b), error = 2*sum(cov_b)/(N*S) <= r*(1+N/S)). Both checked
    against the Spark plan's 9-dp output."""
    fixtures = {
        # every degree < GINI_D0: binned == exact EXACTLY
        "sub_d0": [1] * 50 + [2] * 30 + [5] * 10 + [100] * 3 + [1023],
        # hub-heavy: sqrt bins engaged, bound must hold
        "hubs": [1] * 400
        + [2] * 200
        + [3] * 100
        + list(range(10, 60))
        + [1500, 2048, 4095, 50_000, 123_456, 1_048_576],
        # adversarial: many values packed into ONE sqrt bin
        "one_fat_bin": [1] * 100 + [GINI_D0 + 900 + i for i in range(40)],
    }
    for name, degs in fixtures.items():
        ge, gb = _gini_exact(degs), _gini_binned(degs)
        tol = _GINI_REL_W * (1 + Fraction(len(degs), sum(degs)))
        assert 0 <= ge - gb <= tol, (name, float(ge), float(gb), float(tol))
        if max(degs) < GINI_D0:
            assert ge == gb, name
        deg_df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(degs)], "id bigint, outdeg bigint"
        )
        row = binned_degree_gini(deg_df).collect()[0]
        assert row["n_vertices"] == len(degs)
        assert row["sum_deg"] == sum(degs)
        assert abs(row["gini"] - float(gb)) <= 1e-9, (name, row["gini"], float(gb))


def test_binned_gini_plan_has_no_vertex_window(spark, sf_oracle_dir):
    """The scale pin VERDICT r10 ordered: the default g_degree_gini must
    not rank the V-row degree table — no row_number anywhere in the
    executed plan; the one (cumulative-sum) window runs over the bin
    table, whose size is bounded by GINI_D0 + sqrt(max_degree), checked
    directly."""
    from pagerank_giraph_vs_mapreduce_spark.plans.graph_queries import (
        _graph_parts,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    df = QUERIES["g_degree_gini"](spark, sf_oracle_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan, plan
    assert "Window" in plan, plan

    _, _, _, deg = _graph_parts(spark, sf_oracle_dir)
    max_d = deg.agg(F.max("outdeg")).collect()[0][0]
    n_bins = (
        deg.select(
            F.when(F.col("outdeg") < GINI_D0, F.col("outdeg"))
            .otherwise(GINI_D0 + F.floor(F.sqrt(F.col("outdeg") - GINI_D0)))
            .alias("bin")
        )
        .distinct()
        .count()
    )
    assert n_bins <= GINI_D0 + math.isqrt(max(max_d - GINI_D0, 0)) + 2
