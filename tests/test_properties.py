"""Property-based tests (hypothesis) for the dedup/similarity math.

Pure-Python mirrors of the cross-engine hash pipeline are checked against
the Spark operators, and MinHash's statistical contract (signature
agreement ≈ Jaccard) is asserted within generous bounds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_giraph_vs_mapreduce_spark.functions.hashing import (
    CODE_MOD,
    HASH_MOD,
    MINHASH_A,
    MINHASH_B,
    MULT,
)
from pagerank_giraph_vs_mapreduce_spark.operators.dedup import minhash_signatures

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]


def py_shingles(text: str, L: int = 5) -> set[int]:
    out = set()
    for i in range(len(text) - L + 1):
        sh = text[i : i + L]
        code = 0
        for j, ch in enumerate(sh):
            code += ord(ch) * MULT ** (L - 1 - j)
        out.add(code % CODE_MOD)
    return out


def py_signature(text: str, n: int = 12) -> tuple[int, ...]:
    codes = py_shingles(text)
    return tuple(
        min((MINHASH_A[j] * c + MINHASH_B[j]) % HASH_MOD for c in codes)
        for j in range(n)
    )


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12).map(" ".join),
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12).map(" ".join),
)
def test_spark_signature_matches_python_mirror(spark, t1, t2):
    """The Spark MinHash pipeline must equal the pure-Python mirror —
    this is the same property the DuckDB oracle checks, from a third
    independent implementation."""
    df = spark.createDataFrame([(1, t1), (2, t2)], "doc_id bigint, text string")
    got = {
        r["id"]: tuple(r[f"mh{j}"] for j in range(12))
        for r in minhash_signatures(df, "doc_id", "text").collect()
    }
    assert got[1] == py_signature(t1)
    assert got[2] == py_signature(t2)


def test_minhash_estimates_jaccard():
    """Statistical contract: fraction of agreeing signature components
    approximates true Jaccard (coarse bound, 12 hashes)."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy cat again and again"
    sa, sb = py_shingles(a), py_shingles(b)
    true_j = len(sa & sb) / len(sa | sb)
    siga, sigb = py_signature(a), py_signature(b)
    est = sum(x == y for x, y in zip(siga, sigb)) / len(siga)
    assert abs(est - true_j) < 0.35  # 12 hashes → wide but bounded


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=3,
        max_size=25,
    )
)
def test_pagerank_matches_python_oracle_on_random_graphs(spark, pairs):
    """On ARBITRARY small digraphs (self-loops, parallel edges, dangling
    vertices, disconnected pieces — whatever hypothesis draws), the Spark
    kernel must match the independent pure-Python implementation to
    1e-9 and keep the Σpr=1 invariant."""
    from tests.py_oracle import py_pagerank

    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank

    edges = [(int(a), int(b)) for a, b in pairs]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    res = pagerank(df, damping=0.85, max_iter=60, tol=-1.0, min_iter=0)
    got = {r["id"]: r["pr"] for r in res.ranks.collect()}
    want = py_pagerank(edges, d=0.85, max_iter=60, tol=-1.0)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_connected_components_match_union_find(spark, pairs):
    """WCC on arbitrary random digraphs must equal a plain union-find
    over the undirected view — independent third implementation."""
    from pagerank_giraph_vs_mapreduce_spark.graph.components import (
        connected_components,
    )

    edges = [(int(a), int(b)) for a, b in pairs]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).components.collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    # same vertex set, same PARTITION, and the canonical label is the
    # component's min id on both sides
    assert set(got) == set(want)
    for v in want:
        assert got[v] == want[v], (v, got[v], want[v])


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=0, max_value=100), # left ts
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=0, max_value=100), # right ts
            st.integers(min_value=0, max_value=999), # payload
        ),
        min_size=0,
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): ties have
        # operator-defined order, tested separately by the oracle query
    ),
)
def test_asof_join_matches_python_bisect(spark, lrows, rrows):
    """As-of join on arbitrary inputs must equal the obvious per-key
    latest-at-or-before lookup."""
    from pagerank_giraph_vs_mapreduce_spark.operators.temporal import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
        "k bigint, ts bigint, lid bigint",
    )
    right = spark.createDataFrame(
        rrows, "k bigint, ts bigint, payload bigint"
    ) if rrows else spark.createDataFrame([], "k bigint, ts bigint, payload bigint")
    got = {
        r["lid"]: r["right_payload"]
        for r in asof_join(left, right, "k", "ts", ["payload"]).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, p) for rk, rt, p in rrows if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, got[i], want)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet="abcdef gh.,x", min_size=1, max_size=500
        ),
        min_size=1,
        max_size=6,
    )
)
def test_chunking_reconstructs_documents(spark, texts):
    """Sliding-window chunking must lose no characters: dropping each
    chunk's overlap tail and concatenating in chunk order reconstructs
    the original text exactly, for arbitrary lengths around the
    chunk/stride boundaries."""
    from pagerank_giraph_vs_mapreduce_spark.operators.text import (
        chunk_documents,
    )

    chunk_chars, overlap = 20, 5
    stride = chunk_chars - overlap
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    rows = chunk_documents(
        df, "doc_id", "text", chunk_chars=chunk_chars, overlap=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
    for doc_id, text in enumerate(texts):
        chunks = [c for _, c in sorted(by_doc[doc_id])]
        rebuilt = "".join(c[:stride] for c in chunks[:-1]) + chunks[-1]
        assert rebuilt == text, (doc_id, text, chunks)


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.sampled_from(WORDS), min_size=4, max_size=10).map(" ".join),
    st.integers(min_value=2, max_value=5),
)
def test_star_candidates_preserve_components(spark, base_text, n_copies):
    """The star-shaped candidate set must be a SUBSET of the full pair
    set and yield the identical connected components under transitive
    closure — the exact claim the mega-cluster mitigation rests on."""
    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_star,
        minhash_signatures,
    )

    rows = [(i, base_text) for i in range(n_copies)] + [
        (100, "completely different spark catalyst tungsten codegen text"),
        (101, base_text + " with a tiny suffix change here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = minhash_signatures(df, "doc_id", "text", 24, 5)
    full = {
        (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, 4, 6).collect()
    }
    star = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs_star(sigs, 4, 6).collect()
    }
    assert star <= full

    def comps(pairs, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in nodes}

    nodes = {i for p in full for i in p} | {i for p in star for i in p}
    assert comps(star, nodes) == comps(full, nodes)


@given(
    bw=st.integers(min_value=1, max_value=5),
    bh=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_block_constant_roundtrip_property(bw, bh, data):
    """ANY block-constant grayscale image (the mm_jpeg_decode fixture
    class) round-trips the baseline encoder/decoder bit-exactly —
    arbitrary dims in 8px blocks, arbitrary 0-255 block values."""
    import numpy as np

    from pagerank_giraph_vs_mapreduce_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    vals = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=bw * bh,
            max_size=bw * bh,
        )
    )
    w, h = bw * 8, bh * 8
    px = np.zeros((h, w), dtype=np.uint8)
    for i, v in enumerate(vals):
        by, bx = divmod(i, bw)
        px[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    d = decode_jpeg(encode_jpeg_gray(px.tobytes(), w, h), keep_pixels=True)
    assert d is not None
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w)
    assert np.array_equal(got, px)
    assert d["pixel_mean"] == sum(vals) / len(vals)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=12),
    interlace=st.booleans(),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_property(w, h, interlace, data):
    """ANY indexed image (arbitrary dims, arbitrary indices, interlaced
    or not) round-trips the GIF encoder/decoder losslessly — the LZW
    dictionary dynamics and interlace reorder hold for all inputs, not
    just the fixture shapes."""
    from pagerank_giraph_vs_mapreduce_spark.operators.gif import (
        decode_gif,
        encode_gif,
    )

    idx = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    d = decode_gif(encode_gif([idx], w, h, interlace=interlace), keep_pixels=True)
    assert d is not None and (d["width"], d["height"]) == (w, h)
    fw, fh, rgb = d["frames"][0]
    assert bytes(rgb[3 * i] for i in range(w * h)) == idx  # gray palette


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=0, max_size=400),
        min_size=1,
        max_size=5,
    ),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1, max_size=40),
)
def test_cdc_chunks_properties(spark, texts, prefix):
    """Content-defined chunking on ARBITRARY printable-ASCII inputs:
    (1) chunks reassemble byte-exact (every non-empty doc), and
    (2) shift-resilience — prepending a prefix preserves every chunk of
    the original from the second chunk on (the property that makes CDC
    hashes edit-stable where fixed blocks are not)."""
    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
        cdc_chunk_table,
    )

    shifted = [prefix + t for t in texts]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)]
        + [(1000 + i, t) for i, t in enumerate(shifted)],
        "doc_id bigint, text string",
    )
    rows = cdc_chunk_table(df, "doc_id", "text").collect()
    by_doc: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["id"], r["chunk_idx"])):
        by_doc.setdefault(r["id"], []).append(r["chunk"])
    for i, t in enumerate(texts):
        if t:
            assert "".join(by_doc[i]) == t, (i, t)
        if t and (1000 + i) in by_doc:
            assert "".join(by_doc[1000 + i]) == prefix + t
            tail = by_doc[i][1:]
            if tail:
                assert by_doc[1000 + i][-len(tail):] == tail, (i, t, prefix)


@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=12),
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
@settings(max_examples=60, deadline=None)
def test_ivf_container_roundtrip_property(frames, w, h):
    """Any frame list (empty frames and empty lists included) survives an
    IVF encode/decode round-trip byte-exactly with geometry, sizes,
    timestamps, and per-frame byte means intact."""
    from pagerank_giraph_vs_mapreduce_spark.operators.ivf_container import (
        decode_ivf,
        encode_ivf,
    )

    b = encode_ivf(frames, w, h, fourcc=b"VP90")
    d = decode_ivf(b, keep_frames=True)
    assert d is not None
    assert d["frames"] == frames
    assert (d["width"], d["height"], d["fourcc"]) == (w, h, "VP90")
    assert d["frame_sizes"] == [len(f) for f in frames]
    assert d["timestamps"] == list(range(len(frames)))
    for f, m in zip(frames, d["frame_byte_means"]):
        assert m == (sum(f) / len(f) if f else 0.0)
    # any strict prefix never decodes MORE frames, never errors
    for cut in (1, 7, 13):
        if cut <= len(b):
            dd = decode_ivf(b[:-cut]) if cut < len(b) else None
            if len(b) - cut >= 32:
                assert dd is not None and dd["n_frames"] <= len(frames)
