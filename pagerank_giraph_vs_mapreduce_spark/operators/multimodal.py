"""Multimodal column plumbing: opaque BINARY payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic byte-level "features"; a real deployment swaps
``_decode_stub`` for PIL/torchaudio/ffmpeg per the marked seam). What IS
real and tested: the schema contract (binary + struct metadata), the
mapInPandas batch path (Arrow transfer, per-partition batching), and the
partition-friendly layout — the parts that matter for running this against
100 TB of media shards.

The testdata has no media table, so ``with_binary_payload`` derives a
binary column from documents.text (utf-8 bytes) — the plumbing is
representative: payloads are opaque bytes of varying size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("format", T.StringType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload BINARY, meta STRUCT<format,n_bytes>)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain;fake-media").alias("format"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic byte statistics standing in for a real
    media decode (image resize / audio resample / frame sample).
    Swap this function for the real codec; the Spark plumbing around it
    (schema, batching, partitioning) is the tested contract."""
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "first_byte": -1, "byte_mean": 0.0}
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0],
        "byte_mean": float(sum(payload)) / len(payload),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]).astype("int64"),
                    "first_byte": feats.map(lambda f: f["first_byte"]).astype("int32"),
                    "byte_mean": feats.map(lambda f: f["byte_mean"]),
                    "format": pdf["meta"].map(
                        lambda m: m["format"] if m is not None else None
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("frame_n", T.LongType()),
    ]
)


def ascii_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload STRING): printable-ASCII-sanitized text standing in
    for a decoded media byte stream (chars == bytes after sanitization, so
    character ops below are exactly byte ops)."""
    return docs.select(
        "doc_id", F.regexp_replace("text", "[^ -~]", "").alias("payload")
    )


def sample_frames(media: DataFrame, frame_chars: int = 64, every: int = 4) -> DataFrame:
    """Frame sampling: split each payload into fixed-size frames, keep every
    ``every``-th — the video-frame-extraction batch shape (one input row →
    many output rows) as Arrow-batched ``mapInPandas``.

    Emits md5 of each kept frame (the stand-in for "decoded frame tensor");
    a real deployment replaces the hash with the codec call — the row
    fan-out, schema and batching are the contract under test. Fan-out is
    bounded per input row, so task memory stays flat; output partitioning
    inherits the input's (no shuffle)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = -(-len(payload) // frame_chars)
                for i in range(0, n_frames, every):
                    frame = payload[i * frame_chars : (i + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
                    lens.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                    "frame_n": pd.Series(lens, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.StringType()),
        T.StructField("stride", T.LongType()),
    ]
)


def resize_payload(media: DataFrame, target: int = 32) -> DataFrame:
    """Downsample each payload to ≤``target`` chars by strided selection —
    the image-resize/audio-resample shape (one row in, one smaller row
    out), again as Arrow-batched ``mapInPandas``. Deterministic stand-in
    for a real resampler; stride = ceil(len/target)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_thumb, out_stride = [], []
            for payload in pdf["payload"]:
                if payload is None or len(payload) == 0:
                    out_thumb.append("")
                    out_stride.append(1)
                    continue
                stride = -(-len(payload) // target)
                out_thumb.append(payload[::stride])
                out_stride.append(stride)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "thumb": pd.Series(out_thumb, dtype="object"),
                    "stride": pd.Series(out_stride, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)
