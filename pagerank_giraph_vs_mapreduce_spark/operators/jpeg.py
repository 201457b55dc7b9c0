"""Pure-Python/numpy JPEG codec (ITU-T T.81): baseline, extended
sequential, and PROGRESSIVE Huffman DCT.

``decode_jpeg`` is a REAL decoder — marker/segment parsing, DQT,
canonical Huffman tables from DHT (the tables in the FILE, not assumed
Annex K), entropy decode with byte unstuffing and DRI/RSTn restart
handling, dequantization, de-zigzag, float IDCT, level shift/clamp,
chroma upsampling by sampling factor, and JFIF YCbCr→RGB. It handles
grayscale and 3-component images at any integer sampling (4:4:4, 4:2:2,
4:2:0, ...), SOF0/SOF1 sequential scans (interleaved or one-component-
per-scan), and SOF2 progressive scan scripts: interleaved/non-interleaved
DC first+refine, per-component AC spectral-selection bands with EOB-run
coding, and successive-approximation AC refinement (the correction-bit
algorithm of T.81 §G.1.2.3, the same control flow libjpeg documents).
All scans accumulate into per-component coefficient buffers; pixels are
reconstructed once at EOI. Arithmetic coding, 12-bit precision,
lossless, and hierarchical files return None — the multimodal dispatch
then degrades to the byte-stat stub, same contract as decode_png.

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
    q = np.ones((8, 8), dtype=np.float64) if quant is None else quant.astype(np.float64)
    coefs, mcux, mcuy, _hmax, _vmax = _quantized_blocks(planes, sampling, q)

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
                        zz = coefs[ci][my * fv + by, mx * fh + bx]
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


# Progressive AC scans additionally need the EOBn symbols (r<<4, r=1..14)
# for end-of-band runs spanning up to 2^14+ blocks (T.81 G.1.2.2).
_ENC_ACP_VALS = _ENC_AC_VALS + [r << 4 for r in range(1, 15)]
_ENC_ACP_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_ACP_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _quantized_blocks(
    planes: list[np.ndarray],
    sampling: list[tuple[int, int]],
    q: np.ndarray,
) -> tuple[list[np.ndarray], int, int, int, int]:
    """FDCT + quantize every 8x8 block of every (subsampled, padded)
    component; returns per-component (rows, cols, 64) zigzag-order int
    arrays on the interleaved MCU grid, plus the grid geometry."""
    h, w = planes[0].shape
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    out = []
    for plane, (fh, fv) in zip(planes, sampling):
        sub = _box_subsample(plane, hmax // fh, vmax // fv)
        th, tw = mcuy * fv * 8, mcux * fh * 8
        sub = np.pad(
            sub, ((0, th - sub.shape[0]), (0, tw - sub.shape[1])), mode="edge"
        )
        sub = sub - 128.0
        rows, cols = mcuy * fv, mcux * fh
        blocks = sub.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ui,mnij,jv->mnuv", _C, blocks, _C.T)
        qc = np.rint(coef / q).astype(np.int64).reshape(rows, cols, 64)
        out.append(qc[..., _ZZ_FLAT])
    return out, mcux, mcuy, hmax, vmax


def encode_jpeg_progressive(
    planes: list[np.ndarray],
    sampling: list[tuple[int, int]] | None = None,
    quant: np.ndarray | None = None,
    script: list[tuple[list[int], int, int, int, int]] | None = None,
) -> bytes:
    """Progressive (SOF2) JPEG encoder over the same coefficient math as
    ``encode_jpeg`` — it exists so tests and fixtures can fabricate REAL
    progressive files (spectral selection + successive approximation +
    EOB-run coding) with no external codec. The default scan ``script``
    exercises every decoder path: an interleaved DC-first scan at Al=1,
    per-component AC bands 1-5 and 6-63 at Al=1, an interleaved DC
    refinement, and per-component AC refinement scans at Al=0 (the
    correction-bit emitter follows T.81 G.1.2.3 exactly — buffered
    correction bits ride with the next EOBn/ZRL/newly-nonzero symbol).
    Script entries are (component_indices, Ss, Se, Ah, Al); AC entries
    must be single-component per the spec."""
    n_comp = len(planes)
    if n_comp not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) planes")
    h, w = planes[0].shape
    if sampling is None:
        sampling = [(1, 1)] * n_comp
    q = np.ones((8, 8), dtype=np.float64) if quant is None else quant.astype(np.float64)
    coefs, mcux, mcuy, hmax, vmax = _quantized_blocks(planes, sampling, q)
    if script is None:
        script = [(list(range(n_comp)), 0, 0, 0, 1)]
        for ci in range(n_comp):
            script += [([ci], 1, 5, 0, 1), ([ci], 6, 63, 0, 1)]
        script.append((list(range(n_comp)), 0, 0, 1, 0))
        for ci in range(n_comp):
            script.append(([ci], 1, 63, 1, 0))

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_ACP_BITS, _ENC_ACP_VALS)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, b"\x00" + bytes(int(q.reshape(-1)[i]) for i in _ZZ_FLAT))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci, (fh, fv) in enumerate(sampling):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += _seg(0xFFC2, sof)
    out += _seg(
        0xFFC4,
        b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + b"\x10" + bytes(_ENC_ACP_BITS) + bytes(_ENC_ACP_VALS),
    )

    def block_iter(cis: list[int]):
        """Blocks in scan order: interleaved MCU order for multi-
        component scans, the component's unpadded raster otherwise."""
        if len(cis) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in cis:
                        fh, fv = sampling[ci]
                        for by in range(fv):
                            for bx in range(fh):
                                yield ci, coefs[ci][my * fv + by, mx * fh + bx]
        else:
            ci = cis[0]
            fh, fv = sampling[ci]
            cw = -(-(w * fh) // hmax)
            ch = -(-(h * fv) // vmax)
            bcols = -(-cw // 8)
            brows = -(-ch // 8)
            for by in range(brows):
                for bx in range(bcols):
                    yield ci, coefs[ci][by, bx]

    for cis, ss, se, ah, al in script:
        if ss > 0 and len(cis) != 1:
            raise ValueError("AC scans are single-component")
        bw = _BitWriter()
        if ss == 0 and ah == 0:  # DC first
            pred = [0] * n_comp
            for ci, blk in block_iter(cis):
                v = int(blk[0]) >> al
                size, bits = _mag_bits(v - pred[ci])
                pred[ci] = v
                c, ln = dc_codes[size]
                bw.write(c, ln)
                if size:
                    bw.write(bits, size)
        elif ss == 0:  # DC refine
            for _ci, blk in block_iter(cis):
                bw.write((int(blk[0]) >> al) & 1, 1)
        elif ah == 0:  # AC first: band values at Al, EOB-run coded
            eobrun = 0

            def flush_eob() -> None:
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    c, ln = ac_codes[r << 4]
                    bw.write(c, ln)
                    if r:
                        bw.write(eobrun - (1 << r), r)
                    eobrun = 0

            for _ci, blk in block_iter(cis):
                band = [int(v) for v in blk[ss : se + 1]]
                m = [
                    (1 if v > 0 else -1) * (abs(v) >> al) if v else 0
                    for v in band
                ]
                nz = [i for i, v in enumerate(m) if v]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(nz[-1] + 1):
                    v = m[i]
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
                if nz[-1] < se - ss:
                    eobrun += 1
            flush_eob()
        else:  # AC refine: T.81 G.1.2.3 correction-bit emitter
            eobrun = 0
            pending: list[int] = []

            def flush_ref() -> None:
                nonlocal eobrun, pending
                if eobrun:
                    r = eobrun.bit_length() - 1
                    c, ln = ac_codes[r << 4]
                    bw.write(c, ln)
                    if r:
                        bw.write(eobrun - (1 << r), r)
                    for b in pending:
                        bw.write(b, 1)
                    eobrun = 0
                    pending = []

            for _ci, blk in block_iter(cis):
                band = [int(v) for v in blk[ss : se + 1]]
                ab = [abs(v) >> al for v in band]
                eob_pos = max(
                    (i for i, t in enumerate(ab) if t == 1), default=-1
                )
                run = 0
                br_bits: list[int] = []
                for i, t in enumerate(ab):
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob_pos:
                        flush_ref()
                        c, ln = ac_codes[0xF0]
                        bw.write(c, ln)
                        run -= 16
                        for b in br_bits:
                            bw.write(b, 1)
                        br_bits = []
                    if t > 1:  # history coefficient: one correction bit
                        br_bits.append(t & 1)
                        continue
                    flush_ref()  # newly-nonzero: (run, 1) + sign
                    c, ln = ac_codes[(run << 4) | 1]
                    bw.write(c, ln)
                    bw.write(1 if band[i] > 0 else 0, 1)
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                    run = 0
                if run > 0 or br_bits:
                    eobrun += 1
                    pending.extend(br_bits)
                    if eobrun == 0x7FFF:
                        flush_ref()
            flush_ref()
        bw.flush()
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


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
    """Decode a sequential (SOF0/SOF1) or progressive (SOF2) JPEG;
    returns {width, height, channels, bit_depth, pixel_mean[, pixels]}
    or None when the payload is not a JPEG this decoder handles (the
    caller degrades to byte stats — same contract as decode_png)."""
    if payload is None:
        return None
    data = bytes(payload)
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    try:
        return _decode_inner(data, keep_pixels)
    except (_EndOfScan, ValueError, KeyError, IndexError, struct.error):
        return None


class _ScanState:
    """Per-scan entropy state: DC predictors and the progressive-AC
    end-of-band run counter (both reset at RSTn boundaries)."""

    def __init__(self, n_comp: int) -> None:
        self.pred = [0] * n_comp
        self.eobrun = 0

    def reset(self) -> None:
        self.pred = [0] * len(self.pred)
        self.eobrun = 0


def _blk_seq(br, blk, st, ci, dc_lut, ac_lut) -> None:
    """Sequential block: DC diff + full 1..63 AC band (T.81 F.2.2)."""
    s = _read_symbol(br, dc_lut)
    st.pred[ci] += _extend(br.read_bits(s), s)
    blk[0] = st.pred[ci]
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
            raise _EndOfScan
        blk[k] = _extend(br.read_bits(s), s)
        k += 1


def _blk_dc_first(br, blk, st, ci, dc_lut, al) -> None:
    s = _read_symbol(br, dc_lut)
    st.pred[ci] += _extend(br.read_bits(s), s)
    blk[0] = st.pred[ci] << al


def _blk_dc_refine(br, blk, al) -> None:
    if br.read_bit():
        blk[0] = int(blk[0]) | (1 << al)


def _blk_ac_first(br, blk, st, ac_lut, ss, se, al) -> None:
    """Progressive AC, first pass of a spectral band (T.81 G.1.2.2):
    like sequential AC but values arrive shifted left by Al and EOB
    generalizes to EOBn runs spanning up to 2^14 blocks."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _read_symbol(br, ac_lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            st.eobrun = (1 << r) - 1
            if r:
                st.eobrun += br.read_bits(r)
            return
        k += r
        if k > se:
            raise _EndOfScan
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _blk_ac_refine(br, blk, st, ac_lut, ss, se, al) -> None:
    """Progressive AC successive-approximation refinement (T.81
    G.1.2.3): every already-nonzero coefficient in the band owns one
    correction bit, interleaved with the run/size symbols that place
    newly-nonzero +-1<<Al values; EOBn runs still carry the correction
    bits of the blocks they span."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if st.eobrun == 0:
        while k <= se:
            rs = _read_symbol(br, ac_lut)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise _EndOfScan  # refinement sends only +-1
                val = p1 if br.read_bit() else m1
            else:
                if r != 15:
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += br.read_bits(r)
                    break
                # r == 15: a run of 16 zero-history coefficients
            # Advance over r zero-history positions; every nonzero-history
            # coefficient passed on the way consumes a correction bit.
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if st.eobrun > 0:
        while k <= se:  # rest of the band: correction bits only
            c = int(blk[k])
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        st.eobrun -= 1


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    progressive: bool,
    huff,
    restart_interval: int,
    scan_comps,  # [(ci, td, ta)] in scan order
    ss: int,
    se: int,
    ah: int,
    al: int,
    coefs,
) -> int:
    """Decode one SOS entropy segment into the coefficient buffers;
    returns the position of the next marker after the scan."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    st = _ScanState(len(comps))

    def do_block(ci: int, td: int, ta: int, blk) -> None:
        if not progressive:
            _blk_seq(br, blk, st, ci, huff[(0, td)], huff[(1, ta)])
        elif ss == 0:
            if ah == 0:
                _blk_dc_first(br, blk, st, ci, huff[(0, td)], al)
            else:
                _blk_dc_refine(br, blk, al)
        elif ah == 0:
            _blk_ac_first(br, blk, st, huff[(1, ta)], ss, se, al)
        else:
            _blk_ac_refine(br, blk, st, huff[(1, ta)], ss, se, al)

    if len(scan_comps) > 1:
        # Interleaved: MCUs over the padded grid (T.81 A.2.3).
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    br.restart()
                    st.reset()
                n_mcu += 1
                for ci, td, ta in scan_comps:
                    _, fh, fv, _tq = comps[ci]
                    for by in range(fv):
                        for bx in range(fh):
                            do_block(
                                ci, td, ta, coefs[ci][my * fv + by, mx * fh + bx]
                            )
    else:
        # Non-interleaved: the component's own block raster, UNpadded
        # dims (T.81 A.2.2) — one block per MCU for restart purposes.
        ci, td, ta = scan_comps[0]
        _, fh, fv, _tq = comps[ci]
        cw = -(-(w * fh) // hmax)
        ch = -(-(h * fv) // vmax)
        bcols = -(-cw // 8)
        brows = -(-ch // 8)
        idx = 0
        for by in range(brows):
            for bx in range(bcols):
                if restart_interval and idx and idx % restart_interval == 0:
                    br.restart()
                    st.reset()
                idx += 1
                do_block(ci, td, ta, coefs[ci][by, bx])

    # Skip to the next marker (pad bits, then optionally RSTn leftovers).
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(data)


def _decode_inner(data: bytes, keep_pixels: bool) -> dict | None:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, fh, fv, tq)])
    progressive = False
    restart_interval = 0
    coefs: list[np.ndarray] | None = None
    got_scan = False
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc not in (1, 3):
                return None
            progressive = marker == 0xC2
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
            if h == 0 or w == 0:
                return None
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _, fh, fv, _tq in comps:
                if fh == 0 or fv == 0 or hmax % fh or vmax % fv:
                    return None
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = [
                np.zeros((mcuy * fv, mcux * fh, 64), dtype=np.int32)
                for _, fh, fv, _tq in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless/arithmetic/differential/hierarchical
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None or coefs is None:
                return None
            ns = body[0]
            cid_to_ci = {c[0]: i for i, c in enumerate(frame[2])}
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                if cid not in cid_to_ci:
                    return None
                scan_comps.append((cid_to_ci[cid], tt >> 4, tt & 15))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if progressive:
                if ss == 0 and se != 0:
                    return None  # DC scans carry only coefficient 0
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    return None  # AC scans are single-component
            pos = _decode_scan(
                data,
                pos,
                frame,
                progressive,
                huff,
                restart_interval,
                scan_comps,
                ss,
                se,
                ah,
                al,
                coefs,
            )
            got_scan = True
        # APPn / COM / DNL / others: skipped via seglen
    if frame is None or coefs is None or not got_scan:
        return None
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # Reconstruct every component from its coefficient buffer in one
    # vectorized de-zigzag + dequant + IDCT (einsum over all blocks).
    out_planes = []
    for (cid, fh, fv, tq), carr in zip(comps, coefs):
        if tq not in qt:
            return None
        rows, cols = carr.shape[:2]
        nat = np.zeros((rows, cols, 64), dtype=np.float64)
        nat[..., _ZZ_FLAT] = carr
        blocks = nat.reshape(rows, cols, 8, 8) * qt[tq]
        spatial = np.einsum("iu,mnuv,vj->minj", _C.T, blocks, _C)
        plane = spatial.reshape(rows * 8, cols * 8)
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
