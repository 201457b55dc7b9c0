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
