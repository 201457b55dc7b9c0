"""Round-7 operator tests: BPE-at-depth semantics, JPEG decode, and the
streaming exactly-once kill/replay path."""

from __future__ import annotations

import re
from collections import Counter


def _py_bpe(texts: list[str], merges: int) -> list[tuple[int, str, int]]:
    """Independent pure-Python BPE reference: word-frequency-weighted pair
    counts, top-1 per round (count desc, joined-pair-string asc — the same
    tie-break Spark's orderBy(desc(n_occ), asc(pair)) applies), greedy
    leftmost non-overlapping merge."""
    words: Counter[str] = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                words[w] += 1
    syms = {w: list(w) for w in words}
    out = []
    for r in range(1, merges + 1):
        pc: Counter[tuple[str, str]] = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += words[w]
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        out.append((r, a + " " + b, n))
        for w, s in syms.items():
            ns: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out


def test_bpe_learn_scaled_matches_python_oracle_at_depth(spark):
    """64 merge rounds on a small corpus must match the independent
    Python implementation row for row — includes repeated-symbol words
    ('aaaa'), ties, and vocabulary exhaustion ordering."""
    from pagerank_giraph_vs_mapreduce_spark.operators.text import (
        bpe_learn_scaled,
    )

    texts = [
        "the cat sat on the mat the cat",
        "a banana and a bandana in havana",
        "aaaa aaa aa baab abab",
        "low lower lowest newer newest wider wide",
        "the theme there these throne",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["merge_round"], r["pair"], r["n_occ"])
        for r in bpe_learn_scaled(
            df, "text", merges=64, sample_hexmax=None
        ).collect()
    ]
    want = _py_bpe(texts, 64)
    assert got == want


def test_jpeg_roundtrip_block_constant_exact():
    """Block-constant grayscale + all-ones quant must round-trip the DCT
    bit-exactly — the invariant the mm_jpeg_decode oracle stands on."""
    import numpy as np

    from pagerank_giraph_vs_mapreduce_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    vals = [0, 255, 1, 254, 128, 127, 40, 200]
    px = np.zeros((16, 32), dtype=np.uint8)
    for i, v in enumerate(vals):
        by, bx = divmod(i, 4)
        px[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    d = decode_jpeg(encode_jpeg_gray(px.tobytes(), 32, 16), keep_pixels=True)
    assert (d["width"], d["height"], d["channels"], d["bit_depth"]) == (
        32, 16, 1, 8,
    )
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 32)
    assert np.array_equal(got, px)
    assert d["pixel_mean"] == sum(vals) / 8


def test_jpeg_roundtrip_arbitrary_content_within_rounding():
    """Arbitrary pixels at quality-100 (all-ones quant): every sample
    within +-1 of the original (pure DCT float rounding), including
    non-multiple-of-8 dimensions (edge-replicated pad, cropped back)."""
    import numpy as np

    from pagerank_giraph_vs_mapreduce_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (19, 29), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg_gray(px.tobytes(), 29, 19), keep_pixels=True)
    assert (d["width"], d["height"]) == (29, 19)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(19, 29)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 1


def test_jpeg_color_420_subsampling_and_jfif_conversion():
    """3-component 4:2:0: chroma box-subsampled on encode, replicated on
    decode, JFIF YCbCr->RGB applied — exact for macroblock-constant
    planes."""
    import numpy as np

    from pagerank_giraph_vs_mapreduce_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    cases = [(50, 100, 150), (200, 30, 220)]
    Y = np.zeros((16, 32), np.uint8)
    Cb = np.zeros_like(Y)
    Cr = np.zeros_like(Y)
    for i, (y, cb, cr) in enumerate(cases):
        Y[:, i * 16 : (i + 1) * 16] = y
        Cb[:, i * 16 : (i + 1) * 16] = cb
        Cr[:, i * 16 : (i + 1) * 16] = cr
    d = decode_jpeg(
        encode_jpeg([Y, Cb, Cr], sampling=[(2, 2), (1, 1), (1, 1)]),
        keep_pixels=True,
    )
    assert d["channels"] == 3
    img = np.frombuffer(d["pixels"], np.uint8).reshape(16, 32, 3)

    def jfif(y, cb, cr):
        r = min(255, max(0, round(y + 1.402 * (cr - 128))))
        g = min(
            255,
            max(0, round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
        )
        b = min(255, max(0, round(y + 1.772 * (cb - 128))))
        return r, g, b

    assert tuple(img[4, 4]) == jfif(*cases[0])
    assert tuple(img[12, 27]) == jfif(*cases[1])


def test_jpeg_decoder_handles_foreign_tables_and_degrades_cleanly():
    """The decoder must read the Huffman tables from the FILE (not assume
    the encoder's), honor DRI/RSTn restarts, and return None (degrade to
    the byte stub) on anything non-baseline."""
    import struct

    import numpy as np

    from pagerank_giraph_vs_mapreduce_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    px = np.full((8, 8), 99, np.uint8)
    good = encode_jpeg_gray(px.tobytes(), 8, 8)
    sos_at = good.find(b"\xff\xda")

    # genuine DRI/RSTn stream: 4x2 blocks with a restart every 3 MCUs —
    # DC predictors reset at each marker, bitstream realigns to bytes
    from pagerank_giraph_vs_mapreduce_spark.operators.jpeg import encode_jpeg

    vals = np.arange(8, dtype=np.uint8) * 30
    multi = np.zeros((16, 32), np.uint8)
    for i, v in enumerate(vals):
        by, bx = divmod(i, 4)
        multi[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    stream = encode_jpeg([multi], restart_interval=3)
    assert struct.pack(">HHH", 0xFFDD, 4, 3) in stream  # DRI present
    assert b"\xff\xd0" in stream or b"\xff\xd1" in stream  # RSTn fired
    d = decode_jpeg(stream, keep_pixels=True)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(16, 32)
    assert np.array_equal(got, multi)

    # flipping SOF0 -> SOF2 (progressive) must yield None, not an exception
    sof_at = good.find(b"\xff\xc0")
    progressive = good[:sof_at] + b"\xff\xc2" + good[sof_at + 2 :]
    assert decode_jpeg(progressive) is None
    # truncated entropy stream -> None
    assert decode_jpeg(good[: sos_at + 6]) is None
    # not a JPEG at all -> None
    assert decode_jpeg(b"\x89PNG\r\n\x1a\n") is None


def test_extract_features_dispatches_jpeg(spark):
    """End-to-end through the Spark seam: jpeg_payload -> extract_features
    detects the magic and emits real image features; a doc whose payload
    is NOT decodable still yields a row (byte-stat degrade)."""
    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        extract_features,
        jpeg_payload,
    )

    docs = spark.createDataFrame(
        [(1, "AHAHAHAH"), (2, "x")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in extract_features(jpeg_payload(docs)).collect()
    }
    a = rows[1]
    assert a["format"] == "image/jpeg"
    assert (a["width"], a["height"], a["channels"], a["bit_depth"]) == (
        32, 16, 1, 8,
    )
    # "AHAHAHAH" = 4x65 + 4x72
    assert a["pixel_mean"] == (4 * 65 + 4 * 72) / 8
    b = rows[2]  # "x" + 7 space pads
    assert b["pixel_mean"] == (ord("x") + 7 * 32) / 8


def test_gif_roundtrip_single_multi_interlaced():
    """Lossless round-trip through the real LZW path: single frame,
    4-frame animation, and interlaced row order."""
    from pagerank_giraph_vs_mapreduce_spark.operators.gif import (
        decode_gif,
        encode_gif,
    )

    w, h = 16, 4
    px = bytes((i * 37 + 11) % 256 for i in range(w * h))

    def gray_back(frame):
        fw, fh, rgb = frame
        return bytes(rgb[3 * i] for i in range(fw * fh))

    d = decode_gif(encode_gif([px], w, h), keep_pixels=True)
    assert (d["width"], d["height"], d["channels"], d["n_frames"]) == (
        w, h, 3, 1,
    )
    assert gray_back(d["frames"][0]) == px
    assert abs(d["pixel_mean"] - sum(px) / len(px)) < 1e-9

    frames = [bytes((i + k * 17) % 256 for i in range(w * h)) for k in range(4)]
    d2 = decode_gif(encode_gif(frames, w, h), keep_pixels=True)
    assert d2["n_frames"] == 4
    assert all(gray_back(d2["frames"][k]) == frames[k] for k in range(4))
    assert d2["frame_means"] == [sum(f) / len(f) for f in frames]

    d3 = decode_gif(encode_gif([px], w, h, interlace=True), keep_pixels=True)
    assert gray_back(d3["frames"][0]) == px


def test_gif_lzw_full_algorithm():
    """The LZW machinery a real GIF exercises: code-width growth past
    9/10/11 bits, dictionary reset at 4096, the KwKwK self-reference,
    and small min_code_size streams."""
    import random

    from pagerank_giraph_vs_mapreduce_spark.operators.gif import (
        lzw_compress,
        lzw_decompress,
    )

    rng = random.Random(3)
    big = bytes(rng.choice([0, 1, 2, 255]) for _ in range(50_000))
    big += b"\x05" * 5_000  # long run → KwKwK chains
    assert lzw_decompress(lzw_compress(big, 8), 8, len(big)) == big
    small = bytes(rng.randrange(4) for _ in range(10_000))
    assert lzw_decompress(lzw_compress(small, 2), 2, len(small)) == small
    # truncation degrades to None, not an exception
    comp = lzw_compress(big, 8)
    assert lzw_decompress(comp[: len(comp) // 2], 8, len(big)) is None


def test_extract_features_dispatches_gif(spark):
    """Spark-seam dispatch on the GIF8 magic; undecodable GIF-prefixed
    bytes degrade to the byte stub."""
    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        extract_features,
        gif_payload,
    )

    docs = spark.createDataFrame([(1, "Z" * 64)], "doc_id long, text string")
    row = extract_features(gif_payload(docs)).collect()[0]
    assert row["format"] == "image/gif"
    assert (row["width"], row["height"], row["channels"]) == (16, 4, 3)
    assert row["pixel_mean"] == float(ord("Z"))


def test_band_index_tombstone_delete_protocol(spark, tmp_path):
    """Document deletes on the dedup index: tombstoned ids vanish from
    probes IMMEDIATELY (broadcast anti-join, no index write) and are
    purged PHYSICALLY by the next compaction — and the tombstoned probe
    keeps the exchange-free index scan."""
    import re

    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
        banded_keys,
        compact_band_index,
        minhash_signatures,
        probe_band_index,
        write_band_index,
    )

    base = "the quick brown fox jumps over the lazy dog by the river"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " x"), (3, "completely different words here")],
        "doc_id bigint, text string",
    )
    banded = banded_keys(
        minhash_signatures(docs, "doc_id", "text", 24, 5), 4, 6
    )
    table = "tomb_idx"
    write_band_index(banded, table, str(tmp_path / "tomb"), buckets=4)
    try:
        batch = spark.createDataFrame(
            [(10, base + " y")], "doc_id bigint, text string"
        )
        bb = banded_keys(
            minhash_signatures(batch, "doc_id", "text", 24, 5), 4, 6
        )
        full = {
            (r["id_new"], r["id_old"])
            for r in probe_band_index(spark, table, bb).collect()
        }
        assert {(10, 1), (10, 2)} <= full
        # logical delete: doc 1 tombstoned -> gone from this probe
        tomb = spark.createDataFrame([(1,)], "id bigint")
        probed = probe_band_index(spark, table, bb, tombstones=tomb)
        probed_rows = {(r["id_new"], r["id_old"]) for r in probed.collect()}
        assert probed_rows == full - {(10, 1)}
        # plan shape: still no exchange below the index FileScan
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # the anti-join rides a broadcast
        n_idx_exchanges = len(
            re.findall(r"Exchange hashpartitioning\(band", plan)
        )
        assert n_idx_exchanges <= 1, plan  # only the batch side shuffles
        # physical purge at compaction: row count drops by doc 1's bands
        n = compact_band_index(spark, table, buckets=4, tombstones=tomb)
        assert n == 2 * 4  # 2 surviving docs x 4 bands
        assert spark.table(table).filter("id = 1").count() == 0
        # post-purge probe without tombstones agrees with the logical view
        again = {
            (r["id_new"], r["id_old"])
            for r in probe_band_index(spark, table, bb).collect()
        }
        assert again == probed_rows
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_pagerank_warm_start_after_edge_deletion(spark):
    """Incremental maintenance works for SHRINKING graphs too: warm-
    starting from the old fixpoint after deleting edges reaches the
    reduced graph's fixpoint in no more supersteps than a cold start —
    the daily-update story covers removals (takedowns, link rot), not
    just crawls."""
    from pyspark.sql import functions as F

    from pagerank_giraph_vs_mapreduce_spark.graph.pagerank import pagerank

    edges = spark.range(4000).select(
        (F.col("id") % 97).alias("src"),
        ((F.col("id") * 31 + 7) % 97).alias("dst"),
    )
    full = pagerank(edges, max_iter=100, tol=1e-10, min_iter=2)
    reduced = edges.filter(F.col("id") % 10 != 0)  # drop ~10% of edges
    cold = pagerank(reduced, max_iter=100, tol=1e-10, min_iter=2)
    warm = pagerank(
        reduced, max_iter=100, tol=1e-10, min_iter=2,
        initial_ranks=full.ranks,
    )
    c = {r["id"]: r["pr"] for r in cold.ranks.collect()}
    w = {r["id"]: r["pr"] for r in warm.ranks.collect()}
    assert set(c) == set(w)
    assert all(abs(c[k] - w[k]) < 1e-7 for k in c)
    assert warm.iterations <= cold.iterations


def test_archive_parsers_degrade_on_damage(spark):
    """Ingest robustness: a truncated WARC yields its complete leading
    records (not zero, not a crash); garbage payloads yield no rows
    while well-formed siblings in the same batch still parse."""
    import gzip

    from pagerank_giraph_vs_mapreduce_spark.sources.archives import (
        parse_warc,
        parse_warc_bytes,
        tar_members,
    )

    def rec(uri: str, body: bytes) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
            + b"\r\n\r\n"
        )

    two = rec("http://a", b"hello world") + rec("http://b", b"goodbye")
    assert [r["target_uri"] for r in parse_warc_bytes(two)] == [
        "http://a", "http://b",
    ]
    # truncate inside record 2's body: record 1 survives, no exception
    cut = two[: len(rec("http://a", b"hello world")) + 40]
    assert [r["target_uri"] for r in parse_warc_bytes(cut)] == ["http://a"]
    # multi-member gzip (Common Crawl layout): both records decode
    gz = gzip.compress(rec("http://a", b"x"), mtime=0) + gzip.compress(
        rec("http://b", b"y"), mtime=0
    )
    assert len(parse_warc_bytes(gz)) == 2

    # Spark seam: one good WARC + one garbage payload in the same batch
    media = spark.createDataFrame(
        [("good.warc", two), ("junk.bin", b"\x00\x01\x02not a warc")],
        "path string, content binary",
    )
    rows = parse_warc(media).collect()
    assert {r["path"] for r in rows} == {"good.warc"}
    assert len(rows) == 2

    # tar: garbage payload yields no rows, good one still expands
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("a.txt")
        info.size = 2
        tf.addfile(info, io.BytesIO(b"hi"))
    media2 = spark.createDataFrame(
        [("good.tar", buf.getvalue()), ("bad.tar", b"not a tar at all")],
        "path string, content binary",
    )
    out = tar_members(media2).collect()
    assert [(r["path"], r["member"], r["n_bytes"]) for r in out] == [
        ("good.tar", "a.txt", 2)
    ]


def test_bpe_learn_scaled_sample_gate_bounds_training_corpus(spark):
    """The md5 gate must train on the deterministic subset only: gating
    with hexmax '0' admits no document -> empty merge table; hexmax 'g'
    admits all -> identical to ungated."""
    from pagerank_giraph_vs_mapreduce_spark.operators.text import (
        bpe_learn_scaled,
    )

    texts = ["alpha beta gamma delta"] * 4 + ["zig zag zug"] * 4
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe_learn_scaled(df, "text", merges=3, sample_hexmax="0").count() == 0
    full = bpe_learn_scaled(df, "text", merges=3, sample_hexmax=None).collect()
    allin = bpe_learn_scaled(df, "text", merges=3, sample_hexmax="g").collect()
    assert full == allin
