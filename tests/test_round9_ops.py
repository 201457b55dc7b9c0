"""Round-9 first wave: k-truss convergence mode and its under-peel proof.

- ktruss_edges(rounds=None) reaches the true peeling fixpoint on a
  triangular-grid fixture that erodes one boundary ring per round —
  the shape where ANY fixed round count under-peels (round 4 still
  removes edges), which is exactly what VERDICT r08 item 4 asked to
  pin down.
- The fixed 3-round slice provably under-peels the same fixture.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from tests.conftest import make_edges


def _py_ktruss_fixpoint(pairs, k):
    """Reference peel to convergence: loop until the edge set is stable."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        nxt = {e for e in edges if len(adj[e[0]] & adj[e[1]]) >= k - 2}
        if nxt == edges:
            return edges
        edges = nxt


def _py_ktruss_rounds(pairs, k, rounds):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    for _ in range(rounds):
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        edges = {e for e in edges if len(adj[e[0]] & adj[e[1]]) >= k - 2}
    return edges


def _tri_grid(m):
    """Planar triangulated grid (vertices (r, c), r+c <= m): every
    interior edge sits in exactly 2 triangles, boundary edges in 1, so
    a 4-truss peel erodes exactly one boundary ring per round — the
    slow-support-decay shape where a fixed round count under-peels."""
    vid = lambda r, c: r * (m + 1) + c  # noqa: E731
    edges = []
    for r in range(m + 1):
        for c in range(m + 1 - r):
            if c + 1 <= m - r:
                edges.append((vid(r, c), vid(r, c + 1)))
            if r + 1 <= m and c <= m - r - 1:
                edges.append((vid(r, c), vid(r + 1, c)))
            if r + 1 <= m and c - 1 >= 0:
                edges.append((vid(r, c), vid(r + 1, c - 1)))
    return edges


def test_ktruss_convergence_reaches_fixpoint(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import ktruss_edges

    # grid erodes ring-by-ring to nothing; the disjoint K5 (each edge in
    # 3 triangles) is a genuine 4-truss and must be the exact fixpoint
    k5 = [(9000 + a, 9000 + b) for a, b in combinations(range(5), 2)]
    pairs = _tri_grid(8) + k5
    # the fixture peels gradually: round 4 must still be removing edges
    # (the property that makes a fixed 3-round slice insufficient)
    r3 = _py_ktruss_rounds(pairs, 4, 3)
    r4 = _py_ktruss_rounds(pairs, 4, 4)
    assert len(r4) < len(r3), "fixture must still peel at round 4"
    fix = _py_ktruss_fixpoint(pairs, 4)
    assert fix == {tuple(sorted(e)) for e in k5}
    got = {
        (r["u"], r["v"])
        for r in ktruss_edges(make_edges(spark, pairs), k=4, rounds=None).collect()
    }
    assert got == fix


def test_logreg_minibatch_l2_python_replay(spark):
    """The mini-batch + L2 trajectory equals a pure-Python replay with
    the same op order (bucket filter, 12-dp rounds, Fraction-exact
    gradient sums), differs from full-batch, and L2 actually shrinks."""
    from decimal import ROUND_HALF_UP, Decimal
    from fractions import Fraction

    from pyspark.sql import functions as F

    from pagerank_giraph_vs_mapreduce_spark.operators.mlfit import logreg_gd

    def r12(x):
        # Spark F.round = BigDecimal.valueOf(double) (shortest repr) then
        # setScale(12, HALF_UP); Python round() is half-EVEN and differs
        # on exact 12-dp ties
        return float(Decimal(repr(float(x))).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP))

    rows = [
        (float(i % 7) / 7.0, float((i * 3) % 5) / 5.0, float(i % 2), i % 4)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, y double, bkt int")

    def replay(iters, lr, l2, batch=None, n_b=1):
        w = [0.0, 0.0, 0.0]  # bias, f1, f2
        for t in range(iters):
            data = rows if batch is None else [r for r in rows if r[3] == t % n_b]
            n = float(len(data))
            g = [Fraction(0)] * 3
            for f1, f2, y, _ in data:
                x = (1.0, f1, f2)
                z = w[0] * x[0] + w[1] * x[1] + w[2] * x[2]
                p = 0.5 + z / (2.0 * (1.0 + abs(z)))
                for j in range(3):
                    g[j] += Fraction(str(r12(x[j] * (y - p))))
            nw = []
            for j in range(3):
                d = r12(float(g[j]) * lr / n)
                base = w[j] + d
                if l2:
                    base = base - r12(lr * l2 * w[j])
                nw.append(r12(base))
            w = nw
        return w

    got_mb = logreg_gd(
        df, ["f1", "f2"], "y", iters=5, lr=1.0, l2=0.01,
        batch_col="bkt", n_batches=4,
    ).collect()[0]
    want = replay(5, 1.0, 0.01, batch="bkt", n_b=4)
    assert [got_mb.w_bias, got_mb.w_f1, got_mb.w_f2] == want
    # batching is real: full-batch with the same iters/l2 lands elsewhere
    got_fb = logreg_gd(df, ["f1", "f2"], "y", iters=5, lr=1.0, l2=0.01).collect()[0]
    assert [got_fb.w_bias, got_fb.w_f1, got_fb.w_f2] == replay(5, 1.0, 0.01)
    assert (got_fb.w_bias, got_fb.w_f1) != (got_mb.w_bias, got_mb.w_f1)
    # l2 is real: unregularized weights differ (and the regularized update
    # matches the replay, which applies the shrink as its own round)
    got_no = logreg_gd(df, ["f1", "f2"], "y", iters=5, lr=1.0).collect()[0]
    assert [got_no.w_bias, got_no.w_f1, got_no.w_f2] == replay(5, 1.0, 0.0)
    assert got_no.w_f1 != got_fb.w_f1
    # empty-bucket guard: a bucket id no row carries leaves weights alone
    got_gap = logreg_gd(
        df.filter(F.col("bkt") != 2), ["f1", "f2"], "y",
        iters=4, lr=1.0, batch_col="bkt", n_batches=4,
    ).collect()[0]
    rows_gap = [r for r in rows if r[3] != 2]

    def replay_gap():
        w = [0.0, 0.0, 0.0]
        for t in range(4):
            data = [r for r in rows_gap if r[3] == t % 4]
            if not data:
                continue
            n = float(len(data))
            g = [Fraction(0)] * 3
            for f1, f2, y, _ in data:
                x = (1.0, f1, f2)
                z = w[0] * x[0] + w[1] * x[1] + w[2] * x[2]
                p = 0.5 + z / (2.0 * (1.0 + abs(z)))
                for j in range(3):
                    g[j] += Fraction(str(r12(x[j] * (y - p))))
            w = [r12(w[j] + r12(float(g[j]) / n)) for j in range(3)]
        return w

    assert [got_gap.w_bias, got_gap.w_f1, got_gap.w_f2] == replay_gap()


def test_external_codec_seam_contract(spark):
    """The C-codec seam contract (VERDICT r08 item 5): lossy VP8/AV1 is
    deliberately decoded by an EXTERNAL library in production (see
    SCALING.md "Lossy video"), so the Spark-side plumbing — schema,
    bytes-in, per-row dispatch, poison-row isolation, layout
    independence — is what this repo must prove, with a fake codec."""
    from pyspark.sql import functions as F

    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        decode_external,
    )

    rows = [
        # (doc_id, payload, declared format)
        (1, b"VP80" + bytes(range(40)), "video/vp8"),
        (2, b"VP80" + bytes(100), "video/vp8"),
        (3, b"POISON", "video/vp8"),  # codec raises on this one
        (4, b"", "video/vp8"),  # empty payload
        (5, b"VP80\x07\x08", "image/png"),  # format not routed to codec
        (6, None, "video/vp8"),  # NULL payload
    ]
    media = spark.createDataFrame(
        [(d, p, (f, len(p) if p else 0)) for d, p, f in rows],
        "doc_id bigint, payload binary, "
        "meta struct<format string, n_bytes bigint>",
    )

    calls_seen = []

    def fake_vp8(payload: bytes) -> dict | None:
        # contract: plain bytes in, one call per routed row
        assert isinstance(payload, bytes)
        if payload.startswith(b"POISON"):
            raise ValueError("corrupt bitstream")
        if not payload.startswith(b"VP80"):
            return None
        return {
            "width": 16,
            "height": 9,
            "channels": 3,
            "bit_depth": 8,
            "pixel_mean": float(len(payload)),
            "format": "video/vp8",
            "irrelevant_extra_key": "ignored",
        }

    out = decode_external(media, fake_vp8, formats=("video/vp8",))
    assert out.schema == FEATURE_SCHEMA
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    # routed + decodable rows carry the codec's features
    for d in (1, 2):
        assert (got[d]["width"], got[d]["height"]) == (16, 9)
        assert got[d]["pixel_mean"] == float(len(rows[d - 1][1]))
        assert got[d]["format"] == "video/vp8"
    # poison row degrades to the stub WITHOUT killing its batch-mates
    assert got[3]["width"] is None
    assert got[3]["n_bytes"] == 6 and got[3]["first_byte"] == ord("P")
    assert abs(got[3]["byte_mean"] - sum(b"POISON") / 6) < 1e-9
    # empty / NULL payloads: stub zeros
    for d in (4, 6):
        assert got[d]["n_bytes"] == 0 and got[d]["first_byte"] == -1
    # non-matching declared format never reaches the codec
    assert got[5]["width"] is None and got[5]["format"] == "image/png"
    # partition-layout independence (and multi-batch execution)
    got8 = {
        r["doc_id"]: r.asDict()
        for r in decode_external(
            media.repartition(8, F.col("doc_id")), fake_vp8, ("video/vp8",)
        ).collect()
    }
    assert got8 == got


def test_ivf_container_roundtrip_and_degrade():
    from pagerank_giraph_vs_mapreduce_spark.operators.ivf_container import (
        decode_ivf,
        encode_ivf,
    )

    frames = [b"abc", b"", b"0123456789" * 5, b"\xff\x00\x7f"]
    b = encode_ivf(frames, 640, 360, fourcc=b"AV01", fps=(24, 1),
                   timestamps=[0, 33, 66, 99])
    d = decode_ivf(b, keep_frames=True)
    assert d["frames"] == frames
    assert (d["fourcc"], d["width"], d["height"]) == ("AV01", 640, 360)
    assert (d["fps_num"], d["fps_den"]) == (24, 1)
    assert d["timestamps"] == [0, 33, 66, 99]
    assert d["frame_sizes"] == [3, 0, 50, 3]
    assert d["frame_byte_means"][1] == 0.0
    assert abs(d["frame_byte_means"][3] - (255 + 0 + 127) / 3) < 1e-12
    # truncation: cut into the last frame's payload AND into its header —
    # both drop only that frame
    assert decode_ivf(b[:-1])["n_frames"] == 3
    assert decode_ivf(b[: len(b) - 3 - 5])["n_frames"] == 3
    # a stale header frame count must not be trusted: framing wins
    stale = bytearray(b)
    stale[24:28] = (999).to_bytes(4, "little")
    assert decode_ivf(bytes(stale))["n_frames"] == 4
    # foreign/garbage payloads degrade to None, never decode wrong
    assert decode_ivf(b"not ivf") is None
    assert decode_ivf(None) is None
    assert decode_ivf(b"DKIF" + b"\x01\x00" + b[6:]) is None  # version 1
    assert decode_ivf(b"\xff\xfe" * 30) is None


def test_ivf_frames_route_through_external_codec_seam(spark):
    """The full compressed-video path: REAL container parse (IVF) feeds
    frame payloads to the external-codec seam — container work is the
    engine's, decompression is the C library's."""
    from pagerank_giraph_vs_mapreduce_spark.operators.ivf_container import (
        decode_ivf,
        encode_ivf,
    )
    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        decode_external,
    )

    payload = encode_ivf([b"K" * 10, b"P" * 20], 16, 9, fourcc=b"VP80")
    media = spark.createDataFrame(
        [(7, payload, ("video/x-ivf", len(payload)))],
        "doc_id bigint, payload binary, "
        "meta struct<format string, n_bytes bigint>",
    )

    def container_then_codec(raw: bytes) -> dict | None:
        d = decode_ivf(raw, keep_frames=True)
        if d is None:
            return None
        # "decode" each frame with the external codec stand-in; the
        # container supplies geometry, the codec supplies pixel stats
        luma = [sum(f) / len(f) for f in d["frames"] if f]
        return {
            "width": d["width"],
            "height": d["height"],
            "channels": 3,
            "bit_depth": 8,
            "pixel_mean": sum(luma) / len(luma),
        }

    row = decode_external(media, container_then_codec, ("video/x-ivf",)).collect()[0]
    assert (row["width"], row["height"]) == (16, 9)
    assert abs(row["pixel_mean"] - (ord("K") + ord("P")) / 2) < 1e-9


def test_webp_close_distance_codes_roundtrip_and_table():
    """VP8L close distance codes 1..120 (VERDICT r08 item 6): the
    generated table reproduces the spec's printed entries, clamping
    matches spec, and random images encoded with close_codes=True decode
    pixel-identical (while actually exercising the remap: the bitstreams
    differ from the plain-distance encoding)."""
    import random

    from pagerank_giraph_vs_mapreduce_spark.operators.webp import (
        CLOSE_DIST_TABLE,
        close_code_distance,
        decode_webp,
        encode_webp,
    )

    # spec table spot checks: the head, the first row-0 gap, the tail
    assert len(CLOSE_DIST_TABLE) == len(set(CLOSE_DIST_TABLE)) == 120
    assert CLOSE_DIST_TABLE[:8] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)
    ]
    assert CLOSE_DIST_TABLE[34] == (0, 5)  # code 35
    assert CLOSE_DIST_TABLE[96] == (8, 0)  # code 97
    assert CLOSE_DIST_TABLE[119] == (8, 7)  # code 120: window corner
    # every window pixel appears exactly once
    assert set(CLOSE_DIST_TABLE) == {
        (x, y) for y in range(8) for x in range(-7, 9) if not (y == 0 and x < 1)
    }
    # scan-line mapping + the spec's < 1 clamp
    assert close_code_distance(1, 16) == 16  # (0,1) one row up
    assert close_code_distance(2, 16) == 1  # (1,0) previous pixel
    assert close_code_distance(4, 16) == 15  # (-1,1)
    assert close_code_distance(4, 1) == 1  # (-1,1) at w=1: clamps
    # fuzz: vertical/horizontal repeat patterns drive backrefs whose
    # distances land in the close window (dist = w, 2w, w±1, 1...)
    rng = random.Random(909)
    for trial in range(12):
        w = rng.choice([4, 8, 11, 16])
        h = rng.choice([6, 9, 16])
        period = rng.choice([1, 2, 3])
        base = [
            0xFF000000 | (rng.randrange(256) << 16) | (rng.randrange(256) << 8)
            | rng.randrange(256)
            for _ in range(w * period)
        ]
        px = [
            base[(y % period) * w + x] if rng.random() > 0.1
            else 0xFF000000 | rng.randrange(1 << 24)
            for y in range(h)
            for x in range(w)
        ]
        kw = {}
        if trial % 3 == 1:
            kw["subtract_green"] = True
        if trial % 4 == 2:
            kw["cache_bits"] = 3
        enc_close = encode_webp(px, w, h, close_codes=True, **kw)
        assert decode_webp(enc_close, keep_pixels=True)["pixels"] == px
        enc_plain = encode_webp(px, w, h, **kw)
        assert decode_webp(enc_plain, keep_pixels=True)["pixels"] == px
        if period <= 2 and trial % 3 != 1:
            # row repeats guarantee dist == w backrefs -> close code 1
            assert enc_close != enc_plain, (trial, w, h, period)


def test_betweenness_matches_networkx_on_random_digraphs(spark):
    """Property test (VERDICT r08 item 8): with all vertices as sources
    and a horizon >= the longest shortest path, truncated_betweenness is
    exact Brandes — normalized=True must equal
    networkx.betweenness_centrality(DiGraph, normalized=True) on seeded
    random digraphs, and unnormalized must equal normalized=False."""
    import random

    import networkx as nx

    from pagerank_giraph_vs_mapreduce_spark.graph.paths import (
        truncated_betweenness,
    )

    for seed in range(4):
        rng = random.Random(seed)
        n = 11
        pairs = sorted(
            {
                (a, b)
                for a in range(n)
                for b in range(n)
                if a != b and rng.random() < 0.22
            }
        )
        g = nx.DiGraph(pairs)
        verts = sorted(g.nodes)
        edges = make_edges(spark, pairs)
        for normalized in (False, True):
            want = nx.betweenness_centrality(g, normalized=normalized)
            got = {
                r["id"]: r["bc"]
                for r in truncated_betweenness(
                    edges, sources=verts, max_hops=n, normalized=normalized
                ).collect()
            }
            for v in verts:
                assert abs(got.get(v, 0.0) - want[v]) < 1e-9, (
                    seed,
                    normalized,
                    v,
                )


def test_gapfill_hourly_locf_semantics(spark):
    """gapfill_hourly on hand data: dense grid per user span, forward
    fill from the last observed bucket, gaps flagged; users never bleed
    into each other's spans."""
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import (
        gapfill_hourly,
    )

    hourly = spark.createDataFrame(
        [
            (1, 10, 5.0), (1, 13, 8.0), (1, 14, 2.0),  # gap at 11, 12
            (2, 100, 7.0),  # single observation: span of one
        ],
        "user_id bigint, h bigint, hv double",
    )
    got = {
        (r["user_id"], r["hour"]): (r["value_filled"], r["is_gap"])
        for r in gapfill_hourly(hourly).collect()
    }
    assert got == {
        (1, 10): (5.0, False),
        (1, 11): (5.0, True),
        (1, 12): (5.0, True),
        (1, 13): (8.0, False),
        (1, 14): (2.0, False),
        (2, 100): (7.0, False),
    }


def test_ppr_multi_equals_single_source_runs(spark):
    """Each seed's vector in the batched multi-seed PPR must equal the
    single-source personalized_pagerank run with sources=[s] for the
    same superstep count — the sparse (s, id) state with absent rows as
    exact 0.0 against the dense single-vector kernel."""
    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import (
        personalized_pagerank,
        personalized_pagerank_multi,
    )

    pairs = [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 1),
        (5, 0), (5, 6), (6, 7), (7, 5), (8, 9),  # 9 dangling
    ]
    edges = make_edges(spark, pairs)
    seeds = [0, 5, 8]
    k = 4
    multi = personalized_pagerank_multi(edges, seeds=seeds, k=k)
    got = {(r["s"], r["id"]): r["pr"] for r in multi.collect()}
    for s in seeds:
        single = personalized_pagerank(
            edges, sources=[s], max_iter=k, tol=-1.0, min_iter=0
        )
        dense = {r["id"]: r["pr"] for r in single.ranks.collect()}
        for vid, pr in dense.items():
            assert abs(got.get((s, vid), 0.0) - pr) < 1e-12, (s, vid)
    # sparse discipline: no (s, id) row for unreachable vertices
    assert (0, 8) not in got and (8, 0) not in got


def test_ktruss_fixed_rounds_underpeel_vs_convergence(spark):
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import ktruss_edges

    pairs = _tri_grid(8)
    edges = make_edges(spark, pairs)
    got3 = {(r["u"], r["v"]) for r in ktruss_edges(edges, k=4, rounds=3).collect()}
    gotc = {(r["u"], r["v"]) for r in ktruss_edges(edges, k=4, rounds=None).collect()}
    assert got3 == _py_ktruss_rounds(pairs, 4, 3)
    assert gotc == _py_ktruss_fixpoint(pairs, 4) == set()
    assert gotc < got3, "3 rounds must under-peel this fixture"
