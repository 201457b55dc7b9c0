"""Pure-Python GIF87a/89a codec (real LZW) for the multimodal seam.

``decode_gif`` is a REAL decoder: header/logical-screen parse, global
and local color tables, full variable-width LZW decompression (code
width growth to 12 bits, clear-code dictionary resets, end-of-
information, the KwKwK self-reference case), sub-block defragmentation,
interlace de-interleaving (the 4-pass row order), and multi-frame
iteration across image descriptors with extension skipping. Frames are
decoded independently against their palettes; GIF89a compositing
(disposal methods, transparency blending) is out of scope — each
frame's own indexed pixels are returned, which is exactly what a
frame-sampling training pipeline consumes. Malformed or truncated
payloads return None and the multimodal dispatch degrades to byte
stats, same contract as decode_png/decode_jpeg.

``encode_gif`` writes valid GIFs (real LZW compression — the same
dictionary algorithm in reverse) so tests and fixtures fabricate
genuinely decodable single- and multi-frame images from deterministic
pixels with no external codec. GIF is lossless over indexed pixels, so
text-derived fixtures keep exact SQL oracles with no DCT-style
constant-block trick needed.

Reference parity note: the reference repo has no media path — this
module belongs to the mandated LLM-pipeline extension surface
(multimodal columns), like jpeg.py and the PNG codec.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------------- LZW


def lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emit CLEAR, greedily extend dictionary strings,
    grow code width at 2^w, reset at 4096. LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    put(clear, width)
    s = b""
    for b in indices:
        cand = s + bytes([b])
        if cand in table:
            s = cand
            continue
        put(table[s], width)
        table[cand] = next_code
        next_code += 1
        # width grows AFTER emitting the first code that needs it
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear, width)
            table, next_code, width = fresh()
        s = bytes([b])
    if s:
        put(table[s], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decompress(data: bytes, min_code_size: int, n_pixels: int) -> bytes | None:
    """Inverse of the above, tolerant of real-encoder streams: variable
    width, clear resets, KwKwK (code == next unassigned entry)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit position
    nbytes = len(data)

    def read(width: int) -> int | None:
        nonlocal pos
        end = pos + width
        if end > nbytes * 8:
            return None
        v = 0
        got = 0
        while got < width:
            byte = data[pos >> 3]
            take = min(8 - (pos & 7), width - got)
            v |= ((byte >> (pos & 7)) & ((1 << take) - 1)) << got
            pos += take
            got += take
        return v

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = read(width)
        if code is None:
            return None  # truncated stream
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


# ------------------------------------------------------------- container

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[bytes], h: int) -> list[bytes]:
    out: list[bytes | None] = [None] * h
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[i]
            i += 1
    return out  # type: ignore[return-value]


def _blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; returns
    (payload, position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos : pos + n])
        if len(chunks[-1]) < n:
            raise ValueError("truncated sub-block")
        pos += n
    return b"".join(chunks), pos


def decode_gif(payload: bytes, keep_pixels: bool = False) -> dict | None:
    """Decode every frame. Returns {width, height, n_frames, channels,
    bit_depth, pixel_mean, frame_means[, frames]} or None. ``width``/
    ``height`` are the logical screen; pixel_mean averages the RGB
    samples of the FIRST frame (still-image semantics for
    extract_features); frame_means has one RGB mean per frame.
    ``frames`` (keep_pixels) is a list of (fw, fh, rgb_bytes)."""
    if payload is None:
        return None
    data = bytes(payload)
    if len(data) < 13 or data[:6] not in GIF_MAGICS:
        return None
    try:
        return _decode_inner(data, keep_pixels)
    except (ValueError, IndexError, struct.error):
        return None


def _decode_inner(data: bytes, keep_pixels: bool) -> dict | None:
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            return None
        pos += 3 * n
    frames = []
    frame_means = []
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            _, pos = _blocks(data, pos)
            continue
        if b != 0x2C:  # image descriptor
            return None
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fw == 0 or fh == 0:
            return None
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            ct = data[pos : pos + 3 * n]
            if len(ct) < 3 * n:
                return None
            pos += 3 * n
        if ct is None:
            return None
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            return None
        lzw, pos = _blocks(data, pos)
        idx = lzw_decompress(lzw, min_code_size, fw * fh)
        if idx is None or len(idx) < fw * fh:
            return None
        if iflags & 0x40:  # interlaced: reorder rows
            rows = [idx[y * fw : (y + 1) * fw] for y in range(fh)]
            idx = b"".join(_deinterlace(rows, fh))
        n_colors = len(ct) // 3
        if max(idx) >= n_colors:
            return None
        rgb = bytearray(fw * fh * 3)
        for i, v in enumerate(idx):
            rgb[3 * i : 3 * i + 3] = ct[3 * v : 3 * v + 3]
        frames.append((fw, fh, bytes(rgb)))
        frame_means.append(sum(rgb) / len(rgb))
    if not frames:
        return None
    out = {
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "channels": 3,
        "bit_depth": 8,
        "pixel_mean": frame_means[0],
        "frame_means": frame_means,
    }
    if keep_pixels:
        out["frames"] = frames
    return out


GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(
    frames: list[bytes],
    width: int,
    height: int,
    palette: bytes = GRAY_PALETTE,
    interlace: bool = False,
) -> bytes:
    """Write a valid GIF89a: one image descriptor per frame of
    ``width*height`` palette indices, global color table, real LZW.
    Animated when len(frames) > 1 (no GCE timing — stats pipelines
    don't consume delays)."""
    n_colors = len(palette) // 3
    # Validate up front: depth = max(2, (n_colors-1).bit_length()) always
    # satisfies 2 << (depth-1) >= n_colors, so a post-hoc check there is dead
    # code — a >256-color palette would instead silently overflow the 3-bit
    # GCT size field (0x80 | (depth-1)) and emit min_code_size > 8, which the
    # GIF spec caps at 8 (corrupt output). Reject before computing flags.
    if n_colors < 2 or n_colors > 256:
        raise ValueError(f"palette must hold 2..256 colors, got {n_colors}")
    if n_colors & (n_colors - 1):
        raise ValueError(f"palette not power-of-two sized: {n_colors} colors")
    if len(palette) % 3:
        raise ValueError("palette length must be a multiple of 3")
    depth = max(2, (n_colors - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += palette.ljust(3 * (2 << (depth - 1)), b"\x00")
    for idx in frames:
        if len(idx) != width * height:
            raise ValueError(f"need {width * height} indices, got {len(idx)}")
        if interlace:
            rows = [
                idx[y * width : (y + 1) * width] for y in range(height)
            ]
            ordered = []
            for start, step in _INTERLACE_PASSES:
                for y in range(start, height, step):
                    ordered.append(rows[y])
            idx = b"".join(ordered)
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
        )
        min_code_size = max(2, depth)
        out.append(min_code_size)
        lzw = lzw_compress(idx, min_code_size)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
