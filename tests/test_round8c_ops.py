"""Round-8 third wave: cross-engine-exact sketches, bucketed exact
quantiles, k-anonymity suppression, truncated betweenness, and the
distributed GD trainer.

- fn_cms_heavy_hitters: CMS one-sided error (estimate >= exact for every
  key, not just the emitted ones) and partition-layout independence.
- fn_kmv_distinct: the KMV estimate equals a pure-Python replay of the
  same md5 hash space, and the sketch is mergeable (union of two halves'
  K-smallest == K-smallest of the whole).
- rel_exact_quantiles: the bucketed two-phase answer equals Python's
  sorted()[ceil(q*n)-1] on the real table for all three quantiles.
- pipeline_k_anonymity: every surviving (lang, source_k8 != '*') group
  has >= k members; suppressed rows keep their lang (only the finer
  identifier is generalized).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cms_never_underestimates_any_key(spark, sf_oracle_dir):
    from pagerank_giraph_vs_mapreduce_spark.plans.function_queries import (
        fn_cms_heavy_hitters,
    )

    out = fn_cms_heavy_hitters(spark, sf_oracle_dir).collect()
    assert out, "threshold should keep at least one heavy user"
    assert all(r.never_underestimates for r in out)
    assert all(r.cms_est >= 75 for r in out)
    # One-sided error holds for EVERY key, not just the emitted survivors:
    # replay the sketch in Python from the raw events.
    rows = (
        spark.read.parquet(f"{sf_oracle_dir}/events.parquet")
        .select("user_id")
        .collect()
    )
    sketch: dict[tuple[int, int], int] = {}
    exact: dict[int, int] = {}
    for r in rows:
        exact[r.user_id] = exact.get(r.user_id, 0) + 1
        for j in range(3):
            b = _md5_60bit(f"cms{j}:{r.user_id}") % 256
            sketch[(j, b)] = sketch.get((j, b), 0) + 1
    spark_est = {r.user_id: r.cms_est for r in out}
    for uid, cnt in exact.items():
        est = min(sketch[(j, _md5_60bit(f"cms{j}:{uid}") % 256)] for j in range(3))
        assert est >= cnt
        if uid in spark_est:
            assert spark_est[uid] == est


def test_kmv_matches_python_replay_and_merges(spark, sf_oracle_dir):
    from pagerank_giraph_vs_mapreduce_spark.plans.function_queries import (
        fn_kmv_distinct,
    )

    row = fn_kmv_distinct(spark, sf_oracle_dir).collect()[0]
    keys = [
        r.c_custkey
        for r in spark.read.parquet(f"{sf_oracle_dir}/customer.parquet")
        .select("c_custkey")
        .collect()
    ]
    hs = sorted(_md5_60bit(str(k)) for k in set(keys))
    hk = hs[255]
    assert row.n_exact == len(set(keys))
    assert row.kmv_est == math.floor(255.0 * float(2**60) / float(hk))
    # Mergeability: K-smallest of (K-smallest of each half) == K-smallest
    # of the union — the property that makes the sketch a partial agg.
    half = len(hs) // 2
    merged = sorted(hs[:half][:256] + hs[half:][:256])[:256]
    assert merged == hs[:256]


def test_kmv_small_table_guard_returns_exact(spark, sf_dir):
    # sf0.001 customer has 150 rows < K=256: the sketch is not full, the
    # ratio estimator would be badly biased (h_K = table max hash), so
    # the guard must return the observed sketch size — the exact count.
    from pagerank_giraph_vs_mapreduce_spark.plans.function_queries import (
        fn_kmv_distinct,
    )

    row = fn_kmv_distinct(spark, sf_dir).collect()[0]
    assert row.n_exact < 256
    assert row.kmv_est == row.n_exact
    assert row.within_20pct


def test_exact_quantiles_match_sorted_python(spark, sf_oracle_dir):
    from pagerank_giraph_vs_mapreduce_spark.plans.relational_queries import (
        rel_exact_quantiles,
    )

    got = {
        r.label: r.value for r in rel_exact_quantiles(spark, sf_oracle_dir).collect()
    }
    vals = sorted(
        r.l_extendedprice
        for r in spark.read.parquet(f"{sf_oracle_dir}/lineitem.parquet")
        .select("l_extendedprice")
        .collect()
    )
    n = len(vals)
    for label, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        assert got[label] == vals[math.ceil(q * n) - 1], label
    assert set(got) == {"p50", "p90", "p99"}


def test_k_anonymity_min_group_size(spark, sf_oracle_dir):
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        pipeline_k_anonymity,
    )

    out = pipeline_k_anonymity(spark, sf_oracle_dir)
    docs = spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
    assert out.count() == docs.count()
    surviving = (
        out.filter(F.col("source_k8") != "*")
        .groupBy("lang", "source_k8")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").alias("m"))
        .collect()[0]
        .m
    )
    assert surviving >= 8
    n_sup = out.filter(F.col("suppressed")).count()
    assert 0 < n_sup < out.count()
    # Suppression only generalizes the finer identifier: langs unchanged.
    assert out.select("lang").distinct().count() == docs.select(
        "lang"
    ).distinct().count()


def _py_truncated_brandes(pairs, sources, max_hops):
    """Independent reference: per-source truncated BFS sigma + Brandes
    dependency accumulation, plain dicts."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in set(pairs):
        if a != b:
            adj[a].add(b)
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        levels = [[s]]
        for h in range(1, max_hops + 1):
            nxt = defaultdict(float)
            for u in levels[-1]:
                for w in adj[u]:
                    if w not in dist or dist[w] == h:
                        nxt[w] += sigma[u]
            cur = []
            for w, sg in nxt.items():
                if w not in dist:
                    dist[w] = h
                    cur.append(w)
                sigma[w] = sigma.get(w, 0.0) + (sg if w not in sigma else 0.0)
            if not cur:
                break
            levels.append(cur)
        delta = defaultdict(float)
        for h in range(len(levels) - 2, 0, -1):
            for v in levels[h]:
                for w in adj[v]:
                    if dist.get(w) == h + 1:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            for v in levels[h]:
                if delta[v]:
                    bc[v] += delta[v]
    return dict(bc)


def test_truncated_betweenness_matches_python(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.paths import (
        truncated_betweenness,
    )
    from tests.conftest import make_edges

    # Diamond + tail + a branch: 0->1, 0->2, 1->3, 2->3, 3->4, 1->5, 5->6
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 5), (5, 6), (0, 1)]
    got = {
        r.id: r.bc
        for r in truncated_betweenness(
            make_edges(spark, pairs), [0, 1], max_hops=3
        ).collect()
    }
    want = _py_truncated_brandes(pairs, [0, 1], 3)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)
    # One value derived by hand, independent of both implementations:
    # delta_0(2) = sigma_2/sigma_3 * (1 + delta_0(3)); sigma_2 = 1,
    # sigma_3 = 2 (via 1 and 2), delta_0(3) = 1 (the 3->4 leaf) -> 1.0.
    assert abs(want[2] - 1.0) < 1e-12


def test_logreg_gd_matches_python_replay(spark, sf_oracle_dir):
    """The full 3-step GD trajectory equals a plain-Python replay using
    the same rational squash, 12-dp round points, and exact (Fraction)
    order-independent gradient sums."""
    from fractions import Fraction

    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        pipeline_train_quality_lr,
    )

    row = pipeline_train_quality_lr(spark, sf_oracle_dir).collect()[0]
    docs = (
        spark.read.parquet(f"{sf_oracle_dir}/documents.parquet")
        .select("text", "lang")
        .collect()
    )
    feats = []
    for r in docs:
        ln = len(r.text)
        if ln == 0:
            continue
        feats.append(
            (
                1.0,
                float(ln) / 1000.0,
                float(ln - len(r.text.replace(" ", ""))) / float(ln),
                1.0 if r.lang == "en" else 0.0,
            )
        )
    n = float(len(feats))
    w = [0.0, 0.0, 0.0]

    def squash(z: float) -> float:
        return 0.5 + z / (2.0 * (1.0 + abs(z)))

    for _ in range(3):
        g = [Fraction(0), Fraction(0), Fraction(0)]
        for b, f1, f2, y in feats:
            z = w[0] * b + w[1] * f1 + w[2] * f2
            resid = y - squash(z)
            for j, x in enumerate((b, f1, f2)):
                g[j] += Fraction(round(x * resid, 12)).limit_denominator(
                    10**12
                )
        w = [
            round(w[j] + round(float(g[j]) * 1.0 / n, 12), 12)
            for j in range(3)
        ]
    assert (row.w_bias, row.w_f_len, row.w_f_space) == tuple(w)
    correct = sum(
        1
        for b, f1, f2, y in feats
        if (squash(w[0] * b + w[1] * f1 + w[2] * f2) >= 0.5) == (y >= 0.5)
    )
    assert row.accuracy == round(correct / n, 9)
    assert 0.0 < row.accuracy <= 1.0


def test_grouped_exact_quantiles_match_python(spark, sf_oracle_dir):
    from collections import defaultdict

    from pagerank_giraph_vs_mapreduce_spark.plans.relational_queries import (
        rel_exact_quantiles_grouped,
    )

    got = {
        (r.grp, r.label): r.value
        for r in rel_exact_quantiles_grouped(spark, sf_oracle_dir).collect()
    }
    by_grp = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_oracle_dir}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        by_grp[r.l_returnflag].append(r.l_extendedprice)
    want = {}
    for g, vals in by_grp.items():
        vals.sort()
        for label, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            want[(g, label)] = vals[math.ceil(q * len(vals)) - 1]
    assert got == want


def test_y4m_roundtrip_and_degrade():
    from pagerank_giraph_vs_mapreduce_spark.operators.y4m import (
        decode_y4m,
        encode_y4m,
    )

    frames = [bytes([v]) * 64 for v in (10, 200, 33)]
    for cs in ("mono", "420jpeg"):
        d = decode_y4m(encode_y4m(frames, 8, 8, colorspace=cs), keep_frames=True)
        assert d["frames"] == frames and d["colorspace"].startswith(cs[:4])
        assert d["frame_luma_means"] == [10.0, 200.0, 33.0]
        assert (d["fps_num"], d["fps_den"]) == (25, 1)
    # truncation keeps the leading intact frames; garbage degrades to None
    b = encode_y4m(frames, 8, 8)
    assert decode_y4m(b[: len(b) // 2])["n_frames"] >= 1
    assert decode_y4m(b"not a y4m") is None
    assert decode_y4m(b"YUV4MPEG2 W0 H8 F25:1\n") is None
    assert decode_y4m(b"YUV4MPEG2 W8 H8 C444\nFRAME\n" + b"x" * 64) is None
    # a 420 final frame with complete luma but truncated chroma is NOT an
    # intact frame: it must be dropped, not counted (and must not overrun)
    b420 = encode_y4m(frames, 8, 8, colorspace="420jpeg")
    full = 64 + 2 * 16  # luma + 2 quarter-size chroma planes
    for cut in (1, 16, 32):  # chop 1 byte .. one whole chroma plane
        d = decode_y4m(b420[: len(b420) - cut])
        assert d["n_frames"] == 2 and d["frame_luma_means"] == [10.0, 200.0]
    # chop into the luma of the last frame: same verdict
    d = decode_y4m(b420[: len(b420) - full + 10])
    assert d["n_frames"] == 2
