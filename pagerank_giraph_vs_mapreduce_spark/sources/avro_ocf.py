"""Pure-Python Avro Object Container File (OCF) source.

The runtime ships Avro's JVM jars but NOT the ``spark-avro`` DataSource
module (it is an external package), and no Python ``avro`` library — so,
following this repo's own-codec discipline (PNG/JPEG/GIF, tar, WARC), the
OCF container and the Avro binary encoding are implemented from the public
specification (https://avro.apache.org/docs/current/specification/):

- container: magic ``Obj\\x01``, metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker, then data blocks of
  ``(record_count, byte_size, payload, sync)``;
- binary encoding: zigzag-varint ints/longs, little-endian IEEE
  float/double, length-prefixed bytes/strings, field-ordered records,
  block-encoded arrays/maps, index-prefixed unions, varint enums, raw
  fixed;
- codecs: ``null`` and ``deflate`` (raw RFC-1951, per spec).

The reader is schema-driven and generic; ``parse_avro_records`` surfaces
each record as canonical JSON (sorted keys; bytes/fixed hex-encoded) so
Spark-side queries apply their own typed projection with ``from_json`` —
schema-on-read, the same seam a real ``spark-avro`` scan gives Catalyst.

Scale shape: OCF is block-structured and sync-marker-splittable in
principle; this reader is one-file-per-row behind an Arrow-batched
``mapInPandas`` (the tar/WARC ingestion shape, sources/archives.py) —
parallelism comes from many files, the layout every event-log pipeline
already has. A corrupt block degrades to the records before it
(degrade-don't-drop, the _gunzip_members contract).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"Obj\x01"

# ----------------------------------------------------------- primitives


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (u >> 1) ^ -(u & 1), pos


# ------------------------------------------------------------- encoder


def _encode_value(schema, v, out: bytearray) -> None:
    if isinstance(schema, list):  # union: index then value
        idx = _union_branch(schema, v)
        out += _zigzag_encode(idx)
        _encode_value(schema[idx], v, out)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "bytes":
        out += _zigzag_encode(len(v))
        out += bytes(v)
    elif t == "string":
        b = str(v).encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    elif t == "record":
        for f in schema["fields"]:
            _encode_value(f["type"], v[f["name"]], out)
    elif t == "array":
        if v:
            out += _zigzag_encode(len(v))
            for item in v:
                _encode_value(schema["items"], item, out)
        out += _zigzag_encode(0)
    elif t == "map":
        if v:
            out += _zigzag_encode(len(v))
            for k, mv in v.items():
                _encode_value("string", k, out)
                _encode_value(schema["values"], mv, out)
        out += _zigzag_encode(0)
    elif t == "enum":
        out += _zigzag_encode(schema["symbols"].index(v))
    elif t == "fixed":
        if len(v) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out += bytes(v)
    else:
        raise ValueError(f"unsupported avro type: {t}")


def _union_branch(schemas: list, v) -> int:
    for i, s in enumerate(schemas):
        t = s["type"] if isinstance(s, dict) else s
        if v is None and t == "null":
            return i
        if v is not None and t != "null":
            return i
    raise ValueError("no union branch for value")


def write_avro_ocf(
    records: list[dict],
    schema: dict,
    codec: str = "null",
    blocks: int = 2,
    sync_seed: str = "",
) -> bytes:
    """Spec-conformant OCF writer (fixtures + round-trip tests). The sync
    marker derives from md5(schema || sync_seed) so archive bytes are
    deterministic; records split across ``blocks`` data blocks to
    exercise multi-block reads."""
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = hashlib.md5((schema_json + sync_seed).encode()).digest()
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zigzag_encode(len(kb))
        out += kb
        out += _zigzag_encode(len(v))
        out += v
    out += _zigzag_encode(0)  # end of metadata map
    out += sync
    n = len(records)
    per = max(1, -(-n // blocks)) if n else 0
    for start in range(0, n, per) if n else []:
        chunk = records[start : start + per]
        body = bytearray()
        for r in chunk:
            _encode_value(schema, r, body)
        if codec == "deflate":
            c = zlib.compressobj(wbits=-15)
            body = c.compress(bytes(body)) + c.flush()
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(body))
        out += bytes(body)
        out += sync
    return bytes(out)


# ------------------------------------------------------------- decoder


def _decode_value(schema, data: bytes, pos: int) -> tuple[object, int]:
    if isinstance(schema, list):  # union
        idx, pos = _zigzag_decode(data, pos)
        return _decode_value(schema[idx], data, pos)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None, pos
    if t == "boolean":
        return data[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _zigzag_decode(data, pos)
    if t == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if t == "bytes":
        ln, pos = _zigzag_decode(data, pos)
        return data[pos : pos + ln], pos + ln
    if t == "string":
        ln, pos = _zigzag_decode(data, pos)
        return data[pos : pos + ln].decode("utf-8"), pos + ln
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode_value(f["type"], data, pos)
        return rec, pos
    if t == "array":
        items = []
        while True:
            cnt, pos = _zigzag_decode(data, pos)
            if cnt == 0:
                return items, pos
            if cnt < 0:  # block with byte size prefix (spec-legal)
                _, pos = _zigzag_decode(data, pos)
                cnt = -cnt
            for _ in range(cnt):
                v, pos = _decode_value(schema["items"], data, pos)
                items.append(v)
    if t == "map":
        m = {}
        while True:
            cnt, pos = _zigzag_decode(data, pos)
            if cnt == 0:
                return m, pos
            if cnt < 0:
                _, pos = _zigzag_decode(data, pos)
                cnt = -cnt
            for _ in range(cnt):
                k, pos = _decode_value("string", data, pos)
                m[k], pos = _decode_value(schema["values"], data, pos)
    if t == "enum":
        idx, pos = _zigzag_decode(data, pos)
        return schema["symbols"][idx], pos
    if t == "fixed":
        sz = schema["size"]
        return data[pos : pos + sz], pos + sz
    raise ValueError(f"unsupported avro type: {t}")


def parse_avro_bytes(data: bytes) -> tuple[dict, list[dict]]:
    """(schema, records) from OCF bytes. A corrupt/truncated block keeps
    the records decoded before it."""
    if data[:4] != MAGIC:
        raise ValueError("not an avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = _zigzag_decode(data, pos)
        if cnt == 0:
            break
        if cnt < 0:
            _, pos = _zigzag_decode(data, pos)
            cnt = -cnt
        for _ in range(cnt):
            k, pos = _decode_value("string", data, pos)
            v, pos = _decode_value("bytes", data, pos)
            meta[k] = v
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = data[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(data):
        try:
            n_rec, pos2 = _zigzag_decode(data, pos)
            n_bytes, pos2 = _zigzag_decode(data, pos2)
            body = data[pos2 : pos2 + n_bytes]
            if len(body) < n_bytes:
                break  # truncated block: keep leading records
            if codec == "deflate":
                body = zlib.decompress(body, wbits=-15)
            elif codec != "null":
                raise ValueError(f"unsupported codec: {codec}")
            bpos = 0
            block_recs = []
            for _ in range(n_rec):
                r, bpos = _decode_value(schema, body, bpos)
                block_recs.append(r)
            pos = pos2 + n_bytes
            if data[pos : pos + 16] != sync:
                break  # corrupt framing: stop, keep prior records
            pos += 16
            records.extend(block_recs)
        except (ValueError, IndexError, zlib.error, struct.error):
            break  # corrupt block: degrade to the records before it
    return schema, records


def _json_safe(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_json_safe(x) for x in v]
    return v


def parse_avro_records(
    media: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, record_idx, record_json) for every record of every OCF
    payload; record_json is canonical JSON (sorted keys, bytes/fixed as
    hex) for a Spark-side ``from_json`` typed projection."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            paths, idxs, jsons = [], [], []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                if content is None:
                    continue
                try:
                    _schema, recs = parse_avro_bytes(bytes(content))
                except ValueError:
                    continue
                for i, r in enumerate(recs):
                    paths.append(path)
                    idxs.append(i)
                    jsons.append(
                        json.dumps(
                            _json_safe(r),
                            sort_keys=True,
                            separators=(",", ":"),
                            ensure_ascii=False,
                        )
                    )
            yield pd.DataFrame(
                {
                    "path": pd.Series(paths, dtype="object"),
                    "record_idx": pd.Series(idxs, dtype="int32"),
                    "record_json": pd.Series(jsons, dtype="object"),
                }
            )

    return media.select(path_col, content_col).mapInPandas(
        batches, "path string, record_idx int, record_json string"
    )


# ------------------------------------------------------------- fixture

N_AVRO_FILES = 8

DOC_AVRO_SCHEMA = {
    "type": "record",
    "name": "DocEvent",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "n_chars", "type": "int"},
        {"name": "text_md5", "type": "string"},
        {"name": "sig", "type": {"type": "array", "items": "long"}},
    ],
}


def avro_payload(docs: DataFrame) -> DataFrame:
    """(path, content BINARY): documents bucketed into ``N_AVRO_FILES``
    REAL OCF files (doc_id-ordered within each bucket, two data blocks
    per file, deflate codec on even buckets / null on odd — both paths
    exercised). Every field derives from the documents table, keeping
    an exact SQL oracle."""
    import pyspark.sql.functions as F

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["doc_id"].iloc[0]) % N_AVRO_FILES
        recs = []
        for doc_id, lang, text in zip(pdf["doc_id"], pdf["lang"], pdf["text"]):
            t = text or ""
            recs.append(
                {
                    "doc_id": int(doc_id),
                    "lang": None if lang is None else str(lang),
                    "n_chars": len(t),
                    "text_md5": hashlib.md5(t.encode()).hexdigest(),
                    "sig": [int(doc_id) % 7, int(doc_id) % 13],
                }
            )
        blob = write_avro_ocf(
            recs,
            DOC_AVRO_SCHEMA,
            codec="deflate" if bucket % 2 == 0 else "null",
            sync_seed=str(bucket),
        )
        return pd.DataFrame(
            {
                "path": [f"events/part-{bucket:05d}.avro"],
                "content": [blob],
            }
        )

    return (
        docs.select("doc_id", "lang", "text")
        .groupBy((F.col("doc_id") % N_AVRO_FILES).alias("bucket"))
        .applyInPandas(build, "path string, content binary")
    )
