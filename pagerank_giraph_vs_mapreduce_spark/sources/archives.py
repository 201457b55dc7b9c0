"""Archive/container ingestion for text corpora: tar expansion and
WARC record parsing, Arrow-batched behind ``mapInPandas``/
``applyInPandas`` — the shapes a 100 TB web-corpus pipeline actually
ingests (Common Crawl ships WARC; curated dumps ship tarballs).

``tar_members`` is a REAL tar reader (stdlib ``tarfile`` over the
payload bytes, gzip-transparent via mode "r:*") emitting one row per
regular member. ``parse_warc`` is a REAL WARC/1.0 parser: version-line
framing, header block, Content-Length-delimited body, the mandatory
CRLF CRLF record separator, and multi-member-gzip transparency (Common
Crawl compresses each record as its own gzip member; a plain
``gzip.decompress`` would stop after the first — the decompressobj loop
here walks all members). Malformed payloads yield no rows (degrade, not
fail — the multimodal dispatch contract applied to ingestion).

Fixture builders (``tar_payload``, ``warc_payload``) fabricate REAL
archives from the documents table so the parse queries keep exact SQL
oracles: member/record content derives from the text column.

At scale both parsers are narrow per-row maps over a ``binaryFile``
scan: no shuffle, output partitioning inherits the input's, and the
expanded rows (not the archive blobs) are what reaches downstream
operators.
"""

from __future__ import annotations

import hashlib
import io
import json
import tarfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TAR_MEMBER_SCHEMA = (
    "path string, member string, n_bytes bigint, member_md5 string"
)
WARC_RECORD_SCHEMA = (
    "path string, record_idx int, warc_type string, target_uri string, "
    "content_length bigint, body_md5 string"
)


def tar_members(
    media: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, member, n_bytes, member_md5) for every regular-file member
    of every tar (or tar.gz) payload. Unreadable payloads yield no rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            paths, members, sizes, md5s = [], [], [], []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                if content is None:
                    continue
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(content)), mode="r:*"
                    ) as tf:
                        for m in tf:
                            if not m.isfile():
                                continue
                            body = tf.extractfile(m).read()
                            paths.append(path)
                            members.append(m.name)
                            sizes.append(len(body))
                            md5s.append(hashlib.md5(body).hexdigest())
                except (tarfile.TarError, OSError, EOFError):
                    continue
            yield pd.DataFrame(
                {
                    "path": pd.Series(paths, dtype="object"),
                    "member": pd.Series(members, dtype="object"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "member_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return media.select(path_col, content_col).mapInPandas(
        batches, TAR_MEMBER_SCHEMA
    )


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated decompression of a MULTI-MEMBER gzip stream (the
    Common Crawl WARC layout: one gzip member per record).

    A corrupt member stops decompression but KEEPS the members already
    decompressed — leading intact records still parse, matching the tar
    path's degrade-don't-drop contract (a raising zlib.error here would
    throw away the whole file for one bad record)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
            chunk += d.flush()
        except zlib.error:
            break  # keep the members decompressed so far
        out += chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse WARC/1.0 records from raw (or multi-member-gzip) bytes."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = data[pos : hdr_end].decode("utf-8", "replace").split("\r\n")
        if not head or not head[0].startswith("WARC/"):
            break
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        if len(body) < length:
            break  # truncated
        records.append(
            {
                "warc_type": fields.get("warc-type"),
                "target_uri": fields.get("warc-target-uri"),
                "content_length": length,
                "body": body,
            }
        )
        pos = hdr_end + 4 + length
    return records


def parse_warc(
    media: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, record_idx, warc_type, target_uri, content_length,
    body_md5) for every record of every WARC payload (plain or
    record-per-gzip-member). record_idx is the record's position within
    its file."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                if content is None:
                    continue
                try:
                    recs = parse_warc_bytes(bytes(content))
                except (zlib.error, OSError):
                    continue
                for i, r in enumerate(recs):
                    rows.append(
                        (
                            path,
                            i,
                            r["warc_type"],
                            r["target_uri"],
                            r["content_length"],
                            hashlib.md5(r["body"]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_idx", "warc_type", "target_uri",
                    "content_length", "body_md5",
                ],
            ).astype(
                {
                    "path": "object",
                    "record_idx": "int32",
                    "warc_type": "object",
                    "target_uri": "object",
                    "content_length": "int64",
                    "body_md5": "object",
                }
            )

    return media.select(path_col, content_col).mapInPandas(
        batches, WARC_RECORD_SCHEMA
    )


# ------------------------------------------------------------- fixtures

N_WARC_FILES = 8


def tar_payload(docs: DataFrame) -> DataFrame:
    """(path, content BINARY): one REAL tar per document with two
    members — ``doc_<id>/text.txt`` (the utf-8 text) and
    ``doc_<id>/meta.json`` (a deterministic one-field JSON) — so the
    expansion keeps an exact SQL oracle over the documents table."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            paths, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tf:
                    for name, body in (
                        (f"doc_{doc_id}/text.txt", (text or "").encode()),
                        (
                            f"doc_{doc_id}/meta.json",
                            json.dumps({"doc_id": int(doc_id)}).encode(),
                        ),
                    ):
                        info = tarfile.TarInfo(name)
                        info.size = len(body)
                        info.mtime = 0  # deterministic archive bytes
                        tf.addfile(info, io.BytesIO(body))
                paths.append(f"corpus/doc_{doc_id}.tar")
                blobs.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "path": pd.Series(paths, dtype="object"),
                    "content": pd.Series(blobs, dtype="object"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        batches, "path string, content binary"
    )


def warc_payload(docs: DataFrame, gzip_members: bool = True) -> DataFrame:
    """(path, content BINARY): docs bucketed into ``N_WARC_FILES`` REAL
    WARC/1.0 files (one ``response`` record per doc, ordered by doc_id
    within each bucket, record-per-gzip-member when ``gzip_members`` —
    the Common Crawl layout)."""
    import gzip as _gzip

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["doc_id"].iloc[0]) % N_WARC_FILES
        out = bytearray()
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            body = (text or "").encode()
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: http://example.com/doc/{doc_id}\r\n".encode()
                + f"Content-Length: {len(body)}\r\n".encode()
                + b"\r\n"
                + body
                + b"\r\n\r\n"
            )
            if gzip_members:
                g = _gzip.compress(rec, mtime=0)
                out += g
            else:
                out += rec
        return pd.DataFrame(
            {
                "path": [f"crawl/part-{bucket:05d}.warc.gz"],
                "content": [bytes(out)],
            }
        )

    from pyspark.sql import functions as F

    return (
        docs.select("doc_id", "text", (F.col("doc_id") % N_WARC_FILES).alias("b"))
        .groupBy("b")
        .applyInPandas(
            lambda pdf: build(pdf), "path string, content binary"
        )
    )
