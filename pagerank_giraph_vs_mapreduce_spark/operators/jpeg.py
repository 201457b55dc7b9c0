"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

``decode_jpeg`` is a REAL baseline decoder — marker/segment parsing, DQT,
canonical Huffman tables from DHT (the tables in the FILE, not assumed
Annex K), interleaved MCU entropy decode with byte unstuffing and
DRI/RSTn restart handling, dequantization, de-zigzag, float IDCT, level
shift/clamp, chroma upsampling by sampling factor, and JFIF YCbCr→RGB.
It handles grayscale and 3-component scans at any integer sampling
(4:4:4, 4:2:2, 4:2:0, ...). Progressive (SOF2), arithmetic coding,
12-bit precision and non-interleaved multi-scan files return None — the
multimodal dispatch then degrades to the byte-stat stub, same contract
as decode_png.

``encode_jpeg`` exists so tests and the mm_jpeg_decode fixture can
fabricate REAL decodable JPEGs from deterministic pixels with no
external codec (the PNG-twin discipline, multimodal.py:66). It writes
valid baseline files: numpy FDCT, configurable quantization (default
all-ones = "quality 100"), its own canonical Huffman tables emitted in
DHT (fixed-length codes — legal, if uncompressive), byte stuffing, and
optional chroma subsampling by box average. With all-ones quant tables
and pixels constant per 8x8 block (per 16x16 macroblock for 4:2:0
chroma), the DCT round-trips bit-exactly: the only nonzero coefficient
is the DC term 8*(v-128), which quantizes and inverts with error ~1e-13
— far below the final round-to-int. That exactness is what lets the
decode query keep an exact SQL oracle over text-derived pixels.

Reference parity note: the reference repo has no media path at all —
this module belongs to the mandated LLM-pipeline extension surface
(multimodal columns), not to SURVEY §2.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables


def _zigzag_pairs() -> list[tuple[int, int]]:
    """(row, col) pairs in JPEG zigzag order, derived — not typed in."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        cells = [(s - c, c) for c in range(s + 1) if s - c < 8 and c < 8]
        # even diagonals run bottom-left -> top-right: (s,0) ... (0,s);
        # cells above is already (s,0)..(0,s) by increasing c — keep for
        # even s, reverse for odd s (top-right -> bottom-left).
        out.extend(cells if s % 2 == 0 else cells[::-1])
    return out


_ZZ = _zigzag_pairs()
# flat index into a row-major 8x8 block for zigzag position k
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)


def _dct_mat() -> np.ndarray:
    C = np.zeros((8, 8))
    for u in range(8):
        su = np.sqrt(1.0 / 8.0) if u == 0 else 0.5
        for x in range(8):
            C[u, x] = su * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return C


_C = _dct_mat()

# Encoder Huffman tables: canonical, fixed code length (valid per T.81 —
# all codes length L with the all-ones code unused). DC: 12 categories at
# 4 bits; AC: the 162 baseline symbols (EOB, ZRL, (run,size)) at 8 bits.
_ENC_DC_VALS = list(range(12))
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for bit-serial Huffman decoding."""
    lut: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return lut


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:  # pad with 1s per spec
            self.write(1, 1)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _box_subsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-average subsample by integer factors (exact for regions
    constant over each fv x fh cell)."""
    if fh == 1 and fv == 1:
        return plane.astype(np.float64)
    h, w = plane.shape
    ph, pw = -h % fv, -w % fh
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    h, w = plane.shape
    return (
        plane.astype(np.float64)
        .reshape(h // fv, fv, w // fh, fh)
        .mean(axis=(1, 3))
    )


def encode_jpeg(
    planes: list[np.ndarray],
    sampling: list[tuple[int, int]] | None = None,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder. ``planes``: 1 (grayscale) or 3 (YCbCr,
    full-resolution each — the encoder subsamples chroma per
    ``sampling``, default 4:4:4). ``quant``: 8x8 table (default all
    ones). All components share DHT table 0 (legal and simplest).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (what real encoders do for error resilience — and what lets
    tests drive the decoder's restart path with a genuine stream)."""
    n_comp = len(planes)
    if n_comp not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) planes")
    h, w = planes[0].shape
    if sampling is None:
        sampling = [(1, 1)] * n_comp
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    q = np.ones((8, 8), dtype=np.float64) if quant is None else quant.astype(np.float64)

    # per-component padded planes on the MCU grid
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = []
    for plane, (fh, fv) in zip(planes, sampling):
        sub = _box_subsample(plane, hmax // fh, vmax // fv)
        th, tw = mcuy * fv * 8, mcux * fh * 8
        sub = np.pad(
            sub,
            ((0, th - sub.shape[0]), (0, tw - sub.shape[1])),
            mode="edge",
        )
        comps.append(sub - 128.0)

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    pred = [0] * n_comp
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()  # pad to byte boundary before the marker
                bw.out += bytes(
                    [0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)]
                )
                pred = [0] * n_comp
            n_mcu += 1
            for ci, (fh, fv) in enumerate(sampling):
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        block = comps[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _C @ block @ _C.T
                        qc = np.rint(coef / q).astype(np.int64)
                        zz = qc.reshape(-1)[_ZZ_FLAT]
                        # DC
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size, bits = _mag_bits(diff)
                        c, ln = dc_codes[size]
                        bw.write(c, ln)
                        if size:
                            bw.write(bits, size)
                        # AC
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = ac_codes[0xF0]
                                bw.write(c, ln)
                                run -= 16
                            size, bits = _mag_bits(v)
                            c, ln = ac_codes[(run << 4) | size]
                            bw.write(c, ln)
                            bw.write(bits, size)
                            run = 0
                        if last_nz < 63:
                            c, ln = ac_codes[0x00]
                            bw.write(c, ln)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDB, b"\x00" + bytes(int(q.reshape(-1)[i]) for i in _ZZ_FLAT))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci, (fh, fv) in enumerate(sampling):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += _seg(0xFFC0, sof)
    out += _seg(
        0xFFC4,
        b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
    )
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Grayscale convenience wrapper over row-major 8-bit ``pixels``."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    plane = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    return encode_jpeg([plane])


# ---------------------------------------------------------------- decoder


class _EndOfScan(Exception):
    pass


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise _EndOfScan
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                self.pos += 2
                return 0xFF
            raise _EndOfScan  # a real marker terminates entropy data
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a restart boundary."""
        self.n = 0  # discard pad bits
        d = self.data
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise _EndOfScan


def _read_symbol(br: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise _EndOfScan  # invalid code


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes, keep_pixels: bool = False) -> dict | None:
    """Decode a baseline JPEG; returns {width, height, channels,
    bit_depth, pixel_mean[, pixels]} or None when the payload is not a
    baseline JPEG this decoder handles (the caller degrades to byte
    stats — same contract as decode_png)."""
    if payload is None:
        return None
    data = bytes(payload)
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    try:
        return _decode_inner(data, keep_pixels)
    except (_EndOfScan, ValueError, KeyError, IndexError, struct.error):
        return None


def _decode_inner(data: bytes, keep_pixels: bool) -> dict | None:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, fh, fv, tq)])
    restart_interval = 0
    scan = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        # Spec-legal 0xFF fill bytes may pad between segments (B.1.1.2):
        # skip repeats so the byte after the last 0xFF is the marker code.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # Standalone (length-less) markers: TEM, RSTn, stray SOI.
            pos += 2
            continue
        if pos + 4 > len(data):
            return None
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    return None  # 16-bit tables: not baseline-8
                flat = np.zeros(64, dtype=np.float64)
                flat[_ZZ_FLAT] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                )
                qt[tq] = flat.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _decode_lut(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/progressive/lossless/arithmetic
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if frame is None or ns != len(frame[2]):
                return None  # only single interleaved scans
            tables = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                tables[cid] = (tt >> 4, tt & 15)
            scan = (tables, pos)
            break
        # APPn / COM / others: skipped via seglen
    if frame is None or scan is None:
        return None
    h, w, comps = frame
    if h == 0 or w == 0:
        return None
    tables, entropy_pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _, fh, fv, _tq in comps:
        if fh == 0 or fv == 0 or hmax % fh or vmax % fv:
            return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * fv * 8, mcux * fh * 8), dtype=np.float64)
        for _, fh, fv, _tq in comps
    ]
    br = _BitReader(data, entropy_pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, (cid, fh, fv, tq) in enumerate(comps):
                if tq not in qt:
                    return None
                dc_lut = huff.get((0, tables[cid][0]))
                ac_lut = huff.get((1, tables[cid][1]))
                if dc_lut is None or ac_lut is None:
                    return None
                for by in range(fv):
                    for bx in range(fh):
                        zz = np.zeros(64, dtype=np.float64)
                        s = _read_symbol(br, dc_lut)
                        pred[ci] += _extend(br.read_bits(s), s)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_lut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZZ_FLAT] = zz
                        block = _C.T @ (coef.reshape(8, 8) * qt[tq]) @ _C
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # reconstruct: level shift, clamp, upsample, color convert
    out_planes = []
    for (cid, fh, fv, _tq), plane in zip(comps, planes):
        px = np.clip(np.rint(plane + 128.0), 0, 255)
        px = np.repeat(np.repeat(px, vmax // fv, axis=0), hmax // fh, axis=1)
        out_planes.append(px[:h, :w])
    if len(out_planes) == 1:
        img = out_planes[0][:, :, None]
    else:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        img = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255)
    out = {
        "width": w,
        "height": h,
        "channels": img.shape[2],
        "bit_depth": 8,
        "pixel_mean": float(img.mean()),
    }
    if keep_pixels:
        out["pixels"] = img.astype(np.uint8).tobytes()
    return out
