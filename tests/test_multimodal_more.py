"""Frame-sampling and resize multimodal plumbing vs pure-Python reference."""

from __future__ import annotations

import hashlib

from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
    ascii_payload,
    resize_payload,
    sample_frames,
)
from pagerank_giraph_vs_mapreduce_spark.sources.tables import load_table


def test_sample_frames_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = ascii_payload(docs)
    got = {
        (r["doc_id"], r["frame_idx"]): (r["frame_md5"], r["frame_n"])
        for r in sample_frames(media, frame_chars=64, every=4).collect()
    }
    want = {}
    for r in media.collect():
        p = r["payload"]
        n_frames = -(-len(p) // 64)
        for i in range(0, n_frames, 4):
            frame = p[i * 64 : (i + 1) * 64]
            want[(r["doc_id"], i)] = (
                hashlib.md5(frame.encode()).hexdigest(),
                len(frame),
            )
    assert got == want
    assert len(got) > 0


def test_resize_payload_strided(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = ascii_payload(docs)
    got = {r["doc_id"]: (r["thumb"], r["stride"]) for r in resize_payload(media, target=32).collect()}
    for r in media.collect():
        p = r["payload"]
        stride = -(-len(p) // 32) if p else 1
        thumb, s = got[r["doc_id"]]
        assert s == stride
        assert thumb == p[::stride]
        assert len(thumb) <= 32


# ---- real PNG codec (decode_png / encode_png / dispatch) ----------------


def test_decode_png_all_five_filters_handcrafted():
    """A PNG whose five scanlines use filter types 0-4, built directly
    from the spec (container assembled in-test, filtered bytes written by
    hand, expected pixels computed by hand) — independent of encode_png,
    so an encoder/decoder pair that is wrong in the same way cannot pass."""
    import struct
    import zlib

    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_png,
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = bytes(
        [0, 10, 20, 30, 40]  # None   -> 10 20 30 40
        + [1, 5, 5, 5, 5]  # Sub     ->  5 10 15 20
        + [2, 1, 2, 3, 4]  # Up      ->  6 12 18 24
        + [3, 10, 10, 10, 10]  # Average -> 13 22 30 37
        + [4, 1, 1, 1, 1]  # Paeth   -> 14 23 31 38
    )
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0)  # 4x5 gray
    png = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert got == {
        "width": 4,
        "height": 5,
        "channels": 1,
        "bit_depth": 8,
        "pixel_mean": 418 / 20,  # hand-summed reconstruction
    }


def test_png_roundtrip_rgb_and_rejects():
    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = bytes(range(2 * 3 * 3))  # 2x3 RGB, samples 0..17
    got = decode_png(encode_png(px, 2, 3, channels=3))
    assert (got["width"], got["height"], got["channels"]) == (2, 3, 3)
    assert got["pixel_mean"] == sum(px) / len(px)
    assert decode_png(b"not a png") is None
    assert decode_png(None) is None
    truncated = encode_png(px, 2, 3, channels=3)[:-8]
    assert decode_png(truncated) is not None  # IEND missing but IDAT whole
    assert decode_png(encode_png(px, 2, 3, channels=3)[:20]) is None


def test_extract_features_dispatches_png_vs_stub(spark):
    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        encode_png,
        extract_features,
    )

    png = encode_png(bytes([100] * 8), 4, 2, channels=1)
    rows = [
        (1, bytearray(png), {"format": "image/png", "n_bytes": len(png)}),
        (2, bytearray(b"plain"), {"format": "text/plain", "n_bytes": 5}),
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, "
        "meta struct<format:string, n_bytes:bigint>",
    )
    got = {r["doc_id"]: r for r in extract_features(media).collect()}
    img = got[1]
    assert img["format"] == "image/png"
    assert (img["width"], img["height"], img["channels"]) == (4, 2, 1)
    assert img["pixel_mean"] == 100.0
    assert img["byte_mean"] is None
    txt = got[2]
    assert txt["format"] == "text/plain"
    assert txt["width"] is None and txt["pixel_mean"] is None
    assert txt["byte_mean"] == sum(b"plain") / 5


def test_png_payload_roundtrip_from_documents(spark, sf_dir):
    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        extract_features,
        png_payload,
    )

    import pytest

    docs = load_table(spark, sf_dir, "documents").limit(10)
    feats = extract_features(png_payload(docs)).collect()
    text = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == 10
    for r in feats:
        px = text[r["doc_id"]].encode()[:64].ljust(64, b" ")
        assert r["format"] == "image/png"
        assert (r["width"], r["height"], r["bit_depth"]) == (16, 4, 8)
        assert r["pixel_mean"] == pytest.approx(sum(px) / 64, abs=1e-12)
