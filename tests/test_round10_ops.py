"""Round-10 operator tests: ASOF joins (backward plan pin), one-level
modularity (Louvain — unweighted monotonicity + weighted reduction/
sensitivity), the real-codec seam composition, OHLC plan pin, the
empty-bucket trainer parity (ADVICE r09 #1), and the shared
ASCII-fixture pin the video-container oracles rely on (ADVICE r09)."""

from __future__ import annotations

import glob

import duckdb


def test_ivf_zlib_frames_are_real_zlib_and_poison_isolated(spark):
    """The container->seam->codec chain runs REAL compressed bytes: the
    IVF frame payloads must be genuine zlib streams (0x78 CMF byte,
    round-trip through zlib.decompress), and a corrupted frame must
    degrade only ITS row to the byte-stat stub while sibling frames of
    the same container decode fine."""
    import zlib

    from pagerank_giraph_vs_mapreduce_spark.operators.ivf_container import (
        decode_ivf,
        encode_ivf,
    )
    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        IVF_N_FRAMES,
        decode_external,
        ivf_explode_frames,
        ivf_zlib_payload,
        zlib_luma16_codec,
    )

    docs = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo foxtrot golf hotel indi")],
        "doc_id bigint, text string",
    )
    payload = ivf_zlib_payload(docs).collect()[0]["payload"]
    d = decode_ivf(bytes(payload), keep_frames=True)
    assert d["fourcc"] == "ZL00" and d["n_frames"] == IVF_N_FRAMES
    text = "alpha bravo charlie delta echo foxtrot golf hotel indi"
    for f, frame in enumerate(d["frames"]):
        assert frame[0] == 0x78, "not a zlib stream"
        plane = text.encode()[f * 16 : f * 16 + 16].ljust(16, b" ")
        assert frame != plane  # genuinely compressed, not stored
        assert zlib.decompress(frame) == plane

    # poison one frame's bitstream; siblings must still decode
    frames = list(d["frames"])
    frames[2] = b"\x78\x9c" + b"\x00" * 8  # truncated/corrupt deflate body
    bad = encode_ivf(frames, 8, 2, fourcc=b"ZL00")
    media = spark.createDataFrame([(1, bytearray(bad))], "doc_id bigint, payload binary")
    out = decode_external(
        ivf_explode_frames(media), zlib_luma16_codec, formats=("ZL00",)
    ).collect()
    rows = {r["doc_id"] % IVF_N_FRAMES: r for r in out}
    assert len(rows) == IVF_N_FRAMES
    assert rows[2]["pixel_mean"] is None and rows[2]["width"] is None
    for f in (0, 1, 3):
        plane = text.encode()[f * 16 : f * 16 + 16].ljust(16, b" ")
        assert rows[f]["pixel_mean"] == sum(plane) / 16
        assert rows[f]["width"] == 8 and rows[f]["bit_depth"] == 8


def _modularity(pairs, comm):
    """Exact (Fraction) Newman modularity of an undirected simple graph
    given as one-direction pairs, under community assignment ``comm``:
    Q = (1/2m) sum_C in_C - sum_C (tot_C / 2m)^2."""
    from collections import Counter
    from fractions import Fraction

    sym = set()
    for u, v in pairs:
        if u != v:
            sym.add((u, v))
            sym.add((v, u))
    m2 = len(sym)
    k = Counter(u for u, _ in sym)
    inside = sum(1 for u, v in sym if comm[u] == comm[v])
    tot = Counter()
    for i, ki in k.items():
        tot[comm[i]] += ki
    return Fraction(inside, m2) - sum(
        Fraction(t, m2) ** 2 for t in tot.values()
    )


def test_louvain_modularity_nondecreasing_per_round(spark):
    """Each synchronous local-move sweep must not decrease modularity on
    the seeded fixtures (VERDICT r09 item 3) — computed EXACTLY with
    Fractions from the returned assignments, so double noise in the
    in-engine scores can't mask a regression. Also pins that two
    4-cliques joined by one bridge separate into the two obvious
    communities."""
    from tests.conftest import make_edges

    from pagerank_giraph_vs_mapreduce_spark.graph.communities import (
        louvain_one_level,
    )

    def clique(ids):
        return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]

    import random

    fixtures = {
        "two_cliques_bridge": clique([0, 1, 2, 3])
        + clique([10, 11, 12, 13])
        + [(3, 10)],
        "ring8": [(i, (i + 1) % 8) for i in range(8)],
        "barbell": clique([0, 1, 2]) + clique([5, 6, 7]) + [(2, 3), (3, 4), (4, 5)],
    }
    rng = random.Random(7)
    for t in range(3):
        fixtures[f"gnp12_{t}"] = [
            (a, b)
            for a in range(12)
            for b in range(a + 1, 12)
            if rng.random() < 0.3
        ]
    for name, pairs in fixtures.items():
        edges = make_edges(spark, pairs)
        verts = sorted({x for p in pairs for x in p})
        prev_q = _modularity(pairs, {v: v for v in verts})  # singletons
        for rounds in (1, 2, 3):
            got = {
                r["id"]: r["community"]
                for r in louvain_one_level(edges, rounds=rounds).collect()
            }
            q = _modularity(pairs, got)
            assert q >= prev_q, (name, rounds, float(prev_q), float(q))
            prev_q = q
        if name == "two_cliques_bridge":
            cs = {got[i] for i in (0, 1, 2, 3)}, {got[i] for i in (10, 11, 12, 13)}
            assert len(cs[0]) == 1 and len(cs[1]) == 1 and cs[0] != cs[1], got


def test_asof_join_plan_has_no_join_nodes(spark, sf_oracle_dir):
    """rel_asof_join's scale contract (VERDICT r09 item 2): the as-of
    must compile to tagged-union + per-key window — ZERO join operators
    of any kind (no CartesianProduct, no BroadcastNestedLoopJoin, no
    per-event subquery), one hash exchange on the key. Pinned on the
    EXECUTED plan so AQE can't sneak a strategy in."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    df = QUERIES["rel_asof_join"](spark, sf_oracle_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_documents_fixture_is_ascii_only():
    """The mm_ivf_frames and mm_y4m_frames oracles index CHARACTERS
    (length/ascii/substr) while the Spark side slices UTF-8 BYTES — the
    two agree iff the documents fixture is pure ASCII (ADVICE r09,
    multimodal_queries.py mm_ivf_frames/mm_y4m_frames oracles). This pin
    is the shared guard both queries cite: if the driver ever generates
    non-ASCII text, this fails loudly instead of the oracles silently
    diverging."""
    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert paths, "fixture glob matched nothing — the guard would be vacuous"
    for path in paths:
        (n,) = duckdb.sql(
            f"SELECT count(*) FROM '{path}' "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()
        assert n == 0, f"non-ASCII document text in {path}: {n} rows"


def test_mb_trainer_empty_bucket_matches_oracle(spark, tmp_path):
    """ADVICE r09 #1 end-to-end: with more buckets than distinct md5
    buckets present, some training steps hit an EMPTY bucket — the Spark
    trainer skips the step (weights unchanged, no L2 shrink) and the
    unrolled SQL oracle must produce the identical trajectory (its
    CASE WHEN n = 0 guard), instead of NULL gradients and n=0 division."""
    import duckdb

    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        _logreg_mb_oracle,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import QUERIES

    # 3 docs -> at most 3 of 4 md5 buckets occupied; verify at least one
    # of the 5 steps trains on an empty bucket, else the test is vacuous
    rows = [(i, "word " * (i + 2) + "tail", "en" if i % 2 else "fr") for i in range(3)]
    docs_dir = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    ).write.parquet(str(docs_dir / "documents.parquet"))

    import hashlib

    occupied = {
        int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 4
        for i in range(3)
    }
    assert len(occupied) < 4, "fixture must leave at least one bucket empty"

    got = QUERIES["pipeline_train_quality_lr_mb"](spark, str(docs_dir)).collect()
    con = duckdb.connect()
    # Spark writes a part-file directory; DuckDB needs the glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{docs_dir}/documents.parquet/*.parquet'"
    )
    want = con.execute(_logreg_mb_oracle()).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert (g["w_bias"], g["w_f_len"], g["w_f_space"], g["accuracy"]) == tuple(w)


def test_ohlc_is_single_aggregate_no_window(spark, sf_oracle_dir):
    """rel_ohlc_candles' scale contract: open/close ride min_by/max_by
    inside ONE map-side-combined aggregate — no Window operator, no
    second exchange (the oracle needs row_number only because DuckDB's
    arg_min takes a single ordering key)."""
    import re

    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    df = QUERIES["rel_ohlc_candles"](spark, sf_oracle_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString repeats the tree under "== Initial
    # Plan =="; inspect the final section only
    plan = plan.split("== Initial Plan ==")[0]
    assert "Window" not in plan, plan
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges <= 1, plan


def test_weighted_louvain_uniform_weights_reduce_to_unweighted(spark):
    """louvain_one_level(weight_col=) with ALL-ONES weights must produce
    the identical assignment to the unweighted kernel (the reduction
    g_pagerank_weighted pins for its kernel, applied here), and a
    2x-uniform scaling must be invariant too (modularity gain is scale-
    free: both kin and k*tot/2m double)."""
    from pyspark.sql import functions as F

    from tests.conftest import make_edges

    from pagerank_giraph_vs_mapreduce_spark.graph.communities import (
        louvain_one_level,
    )

    pairs = (
        [(a, b) for i, a in enumerate([0, 1, 2, 3]) for b in [0, 1, 2, 3][i + 1 :]]
        + [(10, 11), (11, 12), (12, 10), (3, 10), (20, 21)]
    )
    edges = make_edges(spark, pairs)
    base = {
        r["id"]: r["community"]
        for r in louvain_one_level(edges, rounds=2).collect()
    }
    for w in (1, 2):
        wedges = edges.select("src", "dst", F.lit(w).alias("w"))
        got = {
            r["id"]: r["community"]
            for r in louvain_one_level(wedges, rounds=2, weight_col="w").collect()
        }
        assert got == base, (w, got, base)


def test_weighted_louvain_weight_changes_partition(spark):
    """And weights must actually MATTER: strengthening the bridge edge
    between two triangles until it dominates pulls the bridge endpoints
    into one community, where the unweighted pass keeps the triangles
    separate."""
    from pyspark.sql import functions as F

    from tests.conftest import make_edges

    from pagerank_giraph_vs_mapreduce_spark.graph.communities import (
        louvain_one_level,
    )

    tri = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    edges = make_edges(spark, tri)
    unw = {
        r["id"]: r["community"]
        for r in louvain_one_level(edges, rounds=3).collect()
    }
    assert unw[0] == unw[1] == unw[2] != unw[10], unw
    # bridge weight 50 vs 1: (2, 10) becomes the strongest tie in the graph
    wedges = edges.select(
        "src",
        "dst",
        F.when((F.col("src") == 2) & (F.col("dst") == 10), 50)
        .otherwise(1)
        .alias("w"),
    )
    wgt = {
        r["id"]: r["community"]
        for r in louvain_one_level(wedges, rounds=3, weight_col="w").collect()
    }
    assert wgt[2] == wgt[10], wgt


def test_events_fixture_asof_preconditions():
    """The three as-of queries (asof_click_purchase, rel_asof_join,
    rel_asof_join_fwd) hash-match their DuckDB native-ASOF oracles only
    when the right side has NO (user_id, ts) ties and NO NULLs — both
    engines pick an arbitrary row on a tie, independently. Pin the
    precondition for every driver scale, the ASCII-pin discipline
    applied to time: if the generator ever emits same-microsecond
    same-user events, this fails loudly instead of the as-of family
    flaking."""
    paths = sorted(glob.glob("/root/testdata/sf*/events.parquet"))
    assert paths, "fixture glob matched nothing — the guard would be vacuous"
    for path in paths:
        dup, nulls = duckdb.sql(
            f"""SELECT
              (SELECT count(*) FROM (
                 SELECT user_id, ts FROM '{path}'
                 GROUP BY 1, 2 HAVING count(*) > 1)),
              (SELECT count(*) FROM '{path}'
               WHERE user_id IS NULL OR ts IS NULL
                  OR event_id IS NULL OR value IS NULL)"""
        ).fetchone()
        assert dup == 0, f"(user_id, ts) ties in {path}: {dup}"
        assert nulls == 0, f"NULLs in as-of columns of {path}: {nulls}"


def test_louvain_two_level_improves_on_one_level(spark):
    """The aggregated second phase must (a) never decrease modularity vs
    the level-1 assignment on the seeded fixtures, and (b) on the
    two-bridged-4-cliques graph reach the TRUE optimum (the two cliques,
    bridge absorbed) where one level provably plateaus — exact-Fraction
    Q, the same discipline as the one-level property test."""
    from tests.conftest import make_edges

    from pagerank_giraph_vs_mapreduce_spark.graph.communities import (
        louvain_one_level,
        louvain_two_level,
    )

    def clique(ids):
        return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]

    fixtures = {
        "two_cliques_bridge": clique([0, 1, 2, 3])
        + clique([10, 11, 12, 13])
        + [(3, 10)],
        "ring8": [(i, (i + 1) % 8) for i in range(8)],
        "four_cliques_chain": clique([0, 1, 2])
        + clique([10, 11, 12])
        + clique([20, 21, 22])
        + clique([30, 31, 32])
        + [(2, 10), (12, 20), (22, 30)],
    }
    for name, pairs in fixtures.items():
        edges = make_edges(spark, pairs)
        c1 = {
            r["id"]: r["community"]
            for r in louvain_one_level(edges, rounds=2).collect()
        }
        c2 = {
            r["id"]: r["community"]
            for r in louvain_two_level(edges, rounds1=2, rounds2=2).collect()
        }
        q1, q2 = _modularity(pairs, c1), _modularity(pairs, c2)
        assert q2 >= q1, (name, float(q1), float(q2))
        if name == "two_cliques_bridge":
            # the true optimum: the two 4-cliques, bridge inside one side
            assert len(set(c2.values())) == 2
            assert float(q2) > 0.42, float(q2)
