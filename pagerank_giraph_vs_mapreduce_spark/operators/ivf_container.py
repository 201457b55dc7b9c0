"""IVF container codec (DKIF), pure stdlib — the COMPRESSED-video
container face of the multimodal seam. IVF is the trivial framing format
the VP8/VP9/AV1 toolchain (libvpx, libaom, dav1d test vectors) uses to
carry raw codec bitstreams: a 32-byte file header plus a 12-byte header
per frame. Parsing it is container work — magic/geometry/timestamps/
frame framing — which the Spark pipeline owns even though the frame
PAYLOADS are compressed bitstreams that only an external C codec can
decode (SCALING.md §25); those payloads are exactly what
``operators/multimodal.py:decode_external`` routes to the codec seam.

With Y4M (raw frames) and IVF (compressed-bitstream framing) both real,
the stub domain is the codec DECOMPRESSION alone.

Layout (little-endian, public libvpx convention):
  file header (32 B): 'DKIF' | version u16 (0) | header size u16 (32) |
    fourcc 4s | width u16 | height u16 | fps_num u32 | fps_den u32 |
    n_frames u32 | unused u32
  per frame: size u32 | timestamp u64 | <size bytes of codec payload>

Reference parity note: the reference repo has no media path — this
module belongs to the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

import struct

IVF_MAGIC = b"DKIF"
IVF_HEADER_SIZE = 32
IVF_FRAME_HEADER_SIZE = 12


def encode_ivf(
    frames: list[bytes],
    width: int,
    height: int,
    fourcc: bytes = b"VP80",
    fps: tuple[int, int] = (30, 1),
    timestamps: list[int] | None = None,
) -> bytes:
    """Write a real IVF stream around opaque codec-frame payloads.
    ``timestamps`` defaults to 0, 1, 2, ... (presentation order)."""
    if len(fourcc) != 4:
        raise ValueError("fourcc must be 4 bytes")
    if timestamps is None:
        timestamps = list(range(len(frames)))
    if len(timestamps) != len(frames):
        raise ValueError("one timestamp per frame")
    out = bytearray(
        struct.pack(
            "<4sHH4sHHIIII",
            IVF_MAGIC,
            0,
            IVF_HEADER_SIZE,
            fourcc,
            width,
            height,
            fps[0],
            fps[1],
            len(frames),
            0,
        )
    )
    for ts, f in zip(timestamps, frames):
        out += struct.pack("<IQ", len(f), ts) + f
    return bytes(out)


def decode_ivf(payload: bytes, keep_frames: bool = False) -> dict | None:
    """Parse an IVF stream; returns {fourcc, width, height, fps_num,
    fps_den, n_frames, frame_sizes, timestamps, frame_byte_means
    [, frames]} or None when the payload is not an IVF this parser
    handles (the caller degrades to the byte-stat stub, the decode-seam
    contract). A truncated final frame is dropped; the leading intact
    frames are kept (the Y4M discipline — the full frame must fit,
    header AND payload). The header's frame-count field is advisory in
    the wild (many muxers leave it stale); the actual framing wins."""
    if payload is None:
        return None
    data = bytes(payload)
    if len(data) < IVF_HEADER_SIZE or not data.startswith(IVF_MAGIC):
        return None
    (magic, version, hdr_size, fourcc, w, h, fps_n, fps_d, _count, _un) = (
        struct.unpack_from("<4sHH4sHHIIII", data, 0)
    )
    if version != 0 or hdr_size < IVF_HEADER_SIZE:
        return None  # unknown layout: degrade, don't guess
    try:
        fourcc_s = fourcc.decode("ascii")
    except UnicodeDecodeError:
        return None
    pos = hdr_size
    sizes: list[int] = []
    stamps: list[int] = []
    means: list[float] = []
    frames: list[bytes] = []
    while pos + IVF_FRAME_HEADER_SIZE <= len(data):
        size, ts = struct.unpack_from("<IQ", data, pos)
        if pos + IVF_FRAME_HEADER_SIZE + size > len(data):
            break  # truncated final frame: keep the leading intact ones
        body = data[
            pos + IVF_FRAME_HEADER_SIZE : pos + IVF_FRAME_HEADER_SIZE + size
        ]
        sizes.append(size)
        stamps.append(ts)
        means.append(sum(body) / size if size else 0.0)
        if keep_frames:
            frames.append(body)
        pos += IVF_FRAME_HEADER_SIZE + size
    out = {
        "fourcc": fourcc_s,
        "width": w,
        "height": h,
        "fps_num": fps_n,
        "fps_den": fps_d,
        "n_frames": len(sizes),
        "frame_sizes": sizes,
        "timestamps": stamps,
        "frame_byte_means": means,
    }
    if keep_frames:
        out["frames"] = frames
    return out
