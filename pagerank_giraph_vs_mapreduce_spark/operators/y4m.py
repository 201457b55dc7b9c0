"""YUV4MPEG2 (.y4m) container codec — the VIDEO face of the multimodal
seam that needs no compression codec at all: Y4M is a plain-text stream
header plus raw planar frames, the interchange format video toolchains
(ffmpeg, x264, VP9/AV1 encoders) read and write. Parsing it is container
work — header tokenization, frame framing, plane geometry — which is
exactly the part a Spark pipeline owns even when the decode of
compressed codecs is delegated to a C library. With this, the multimodal
stub domain shrinks to COMPRESSED video/lossy-VP8 only: PNG, GIF
(multi-frame), baseline+progressive JPEG, VP8L WebP, WAV audio, and raw
Y4M video are all real.

Supported colorspaces: ``Cmono`` (luma only) and ``C420jpeg/C420``
(luma + quarter-size chroma planes; luma statistics are exact either
way). Interlacing tags and aspect ratios are parsed and carried, not
interpreted.

Reference parity note: the reference repo has no media path — this
module belongs to the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(
    frames: list[bytes],
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "mono",
) -> bytes:
    """Write a real .y4m stream from raw luma planes (row-major, one
    ``width*height`` bytes object per frame). ``colorspace='420jpeg'``
    appends neutral (128) chroma planes so mainstream tools accept the
    file; ``'mono'`` writes luma only."""
    for i, f in enumerate(frames):
        if len(f) != width * height:
            raise ValueError(f"frame {i}: need {width * height} luma bytes")
    if colorspace == "420jpeg" and (width % 2 or height % 2):
        raise ValueError("C420 needs even dimensions")
    head = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{colorspace}\n".encode()
    )
    out = bytearray(head)
    chroma = (
        bytes([128]) * ((width // 2) * (height // 2)) * 2
        if colorspace == "420jpeg"
        else b""
    )
    for f in frames:
        out += b"FRAME\n" + f + chroma
    return bytes(out)


def decode_y4m(payload: bytes, keep_frames: bool = False) -> dict | None:
    """Parse a .y4m stream; returns {width, height, n_frames, fps_num,
    fps_den, colorspace, frame_luma_means[, frames]} or None when the
    payload is not a Y4M this parser handles (the caller degrades to the
    byte-stat stub, the decode-seam contract)."""
    if payload is None:
        return None
    data = bytes(payload)
    if not data.startswith(Y4M_MAGIC):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"  # the spec's default when C is absent
    for tok in data[len(Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                width = int(val)
            elif tag == b"H":
                height = int(val)
            elif tag == b"F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif tag == b"C":
                colorspace = val.decode("ascii")
            # Ip/It/Ib/Im interlacing, A aspect, X comments: carried only
        except (ValueError, UnicodeDecodeError):
            return None
    if not width or not height or width < 0 or height < 0:
        return None
    luma = width * height
    if colorspace.startswith("mono"):
        frame_bytes = luma
    elif colorspace.startswith("420"):
        if width % 2 or height % 2:
            return None
        frame_bytes = luma + 2 * ((width // 2) * (height // 2))
    else:
        return None  # 422/444/alpha variants: out of scope, degrade
    pos = nl + 1
    means: list[float] = []
    frames: list[bytes] = []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            return None  # malformed frame header
        pos = fnl + 1
        if pos + frame_bytes > len(data):
            # Truncated final frame: keep the leading intact ones. The full
            # frame_bytes bound (not just luma) rejects a 420 frame whose
            # luma is complete but whose chroma planes are cut short —
            # otherwise the frame would count as intact and pos would
            # silently overrun the buffer end.
            break
        plane = data[pos : pos + luma]
        means.append(sum(plane) / luma)
        if keep_frames:
            frames.append(plane)
        pos += frame_bytes
    out = {
        "width": width,
        "height": height,
        "n_frames": len(means),
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "frame_luma_means": means,
    }
    if keep_frames:
        out["frames"] = frames
    return out
