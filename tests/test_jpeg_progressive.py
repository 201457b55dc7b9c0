"""Progressive-JPEG (SOF2) codec: decode parity against baseline.

Both encoders share one coefficient computation (_quantized_blocks), so
a baseline file and a progressive file of the same planes carry IDENTICAL
quantized coefficients — any pixel difference between their decodes is a
bug in the progressive scan machinery (DC first/refine, AC spectral
bands, EOB runs, AC successive-approximation correction bits), never in
the shared DCT math. No Spark needed: the codec is plane-level.
"""

from __future__ import annotations

import numpy as np

from pagerank_giraph_vs_mapreduce_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _parity(planes, sampling=None, quant=None, script=None):
    base = decode_jpeg(
        encode_jpeg(planes, sampling=sampling, quant=quant), keep_pixels=True
    )
    prog = decode_jpeg(
        encode_jpeg_progressive(
            planes, sampling=sampling, quant=quant, script=script
        ),
        keep_pixels=True,
    )
    assert base is not None and prog is not None
    assert (base["width"], base["height"], base["channels"]) == (
        prog["width"],
        prog["height"],
        prog["channels"],
    )
    assert base["pixels"] == prog["pixels"]
    return prog


def test_textured_gray_default_script():
    rng = np.random.RandomState(11)
    tex = rng.randint(0, 256, (29, 37)).astype(np.uint8)  # non-x8 dims
    _parity([tex])


def test_textured_color_420_with_quant():
    rng = np.random.RandomState(12)
    qt = np.clip(np.arange(1, 65).reshape(8, 8) // 2, 1, 32).astype(np.float64)
    planes = [rng.randint(0, 256, (33, 45)).astype(np.uint8) for _ in range(3)]
    out = _parity(planes, sampling=[(2, 2), (1, 1), (1, 1)], quant=qt)
    assert out["channels"] == 3


def test_deep_successive_approximation_chain():
    # Al=2 first scans, refined 2->1->0: every refinement scan must land
    # correction bits on exactly the coefficients of its history set.
    rng = np.random.RandomState(13)
    tex = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    script = [
        ([0], 0, 0, 0, 2),
        ([0], 1, 63, 0, 2),
        ([0], 0, 0, 2, 1),
        ([0], 1, 63, 2, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    _parity([tex], script=script)


def test_spectral_bands_and_long_eobruns():
    # Mostly block-constant image: AC bands are empty in almost every
    # block, so the encoder emits multi-block EOBn runs that the decoder
    # must count across blocks (in both the first and refinement pass).
    rng = np.random.RandomState(14)
    img = np.repeat(
        np.repeat(rng.randint(0, 256, (8, 12)), 8, axis=0), 8, axis=1
    ).astype(np.uint8)
    img[10:12, 20:22] = 255  # one textured block breaks the run mid-way
    _parity([img])
    script = [
        ([0], 0, 0, 0, 1),
        ([0], 1, 5, 0, 1),
        ([0], 6, 20, 0, 1),
        ([0], 21, 63, 0, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 5, 1, 0),
        ([0], 6, 20, 1, 0),
        ([0], 21, 63, 1, 0),
    ]
    _parity([img], script=script)


def test_constant_blocks_decode_exactly():
    # Block-constant pixels + all-ones quant: DC-only coefficients
    # round-trip bit-exactly, progressive or not (the mm fixture contract).
    rng = np.random.RandomState(15)
    blocks = rng.randint(0, 256, (3, 4)).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    prog = decode_jpeg(encode_jpeg_progressive([img]), keep_pixels=True)
    assert prog["pixels"] == img.tobytes()


def test_sequential_decode_unchanged():
    # The coefficient-buffer refactor must not disturb the baseline path.
    rng = np.random.RandomState(16)
    tex = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg([tex]), keep_pixels=True)
    px = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(24, 24)
    assert int(np.abs(px.astype(int) - tex.astype(int)).max()) <= 1
    # restart markers still handled
    d2 = decode_jpeg(encode_jpeg([tex], restart_interval=2), keep_pixels=True)
    assert d2 is not None and d2["pixels"] == d["pixels"]


def test_truncated_progressive_returns_none():
    rng = np.random.RandomState(17)
    tex = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    b = encode_jpeg_progressive([tex])
    assert decode_jpeg(b[: len(b) // 3]) is None


# ---------------------------------------------------------------- fuzzing

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _legal_script(draw, n_comp: int):
    """A random LEGAL progressive scan script: DC first (interleaved) at
    some Al, DC refinements stepping Al down to 0 one bit at a time,
    and per-component AC band chains whose successive-approximation
    levels also step down bit by bit with contiguous spectral bands."""
    dc_al = draw(st.integers(0, 2))
    script = [(list(range(n_comp)), 0, 0, 0, dc_al)]
    for al in range(dc_al - 1, -1, -1):
        script.append((list(range(n_comp)), 0, 0, al + 1, al))
    for ci in range(n_comp):
        # random contiguous band split of 1..63
        cut = draw(st.integers(1, 62))
        ac_al = draw(st.integers(0, 2))
        bands = [(1, cut), (cut + 1, 63)]
        for ss, se in bands:
            script.append(([ci], ss, se, 0, ac_al))
        for al in range(ac_al - 1, -1, -1):
            for ss, se in bands:
                script.append(([ci], ss, se, al + 1, al))
    return script


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_progressive_parity_fuzz(data):
    """Random pixels, random dims, random legal scan script, random
    sampling/quant: progressive decode == baseline decode, always (both
    files carry identical quantized coefficients by construction)."""
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    n_comp = data.draw(st.sampled_from([1, 3]))
    h = data.draw(st.integers(1, 34))
    w = data.draw(st.integers(1, 34))
    planes = [rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(n_comp)]
    sampling = None
    if n_comp == 3 and data.draw(st.booleans()):
        sampling = [(2, 2), (1, 1), (1, 1)]
    quant = None
    if data.draw(st.booleans()):
        quant = np.clip(
            np.arange(1, 65).reshape(8, 8) // data.draw(st.sampled_from([1, 2, 4])),
            1,
            64,
        ).astype(np.float64)
    script = data.draw(_legal_script(n_comp))
    base = decode_jpeg(
        encode_jpeg(planes, sampling=sampling, quant=quant), keep_pixels=True
    )
    prog = decode_jpeg(
        encode_jpeg_progressive(
            planes, sampling=sampling, quant=quant, script=script
        ),
        keep_pixels=True,
    )
    assert base is not None and prog is not None
    assert base["pixels"] == prog["pixels"], (h, w, n_comp, script)
