"""VP8L WebP codec (functions/webp.py) — the reference's default
raster format (vector_tile_processor.hpp:55).

No libwebp exists in this container, so the decoder's feature paths are
exercised with spec-derived bitstreams BUILT BY THE TESTS (simple and
normal prefix codes, LZ77 backward references, color cache,
subtract-green / predictor / color-indexing transforms) plus exhaustive
lossless round-trips through the engine's own minimal encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import webp as W


# ---------------------------------------------------------------------------
# test-side stream builder helpers
# ---------------------------------------------------------------------------

def _balanced_lengths(symbols):
    """Complete prefix-code lengths for a set of symbols (uniform)."""
    k = len(symbols)
    if k == 1:
        return {symbols[0]: 1}  # handled as single
    import math

    L = math.ceil(math.log2(k))
    # start with all at L, shorten the first (2**L - k) to fill Kraft
    lengths = {}
    short = 2**L - k
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = L - 1 if i < short else L
    return lengths


def _write_normal_code(bw, alphabet_size, lengths_by_symbol):
    """Emit a 'normal' (code-length-coded) prefix code definition."""
    used_cl = sorted({l for l in lengths_by_symbol.values()})
    needs_zero = max(lengths_by_symbol) + 1 < alphabet_size or any(
        s not in lengths_by_symbol for s in range(max(lengths_by_symbol))
    )
    cl_syms = list(used_cl) + ([0] if needs_zero else [])
    cl_lengths = _balanced_lengths(sorted(set(cl_syms)))
    bw.write(0, 1)  # not simple
    clc = [0] * 19
    for s, l in cl_lengths.items():
        clc[s] = l
    bw.write(19 - 4, 4)
    for sym in W._CLC_ORDER:
        bw.write(clc[sym], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    codes = (
        {list(cl_lengths)[0]: (0, 0)}
        if len(cl_lengths) == 1
        else W.PrefixCode.canonical_codes(clc)
    )
    for s in range(alphabet_size):
        l = lengths_by_symbol.get(s, 0)
        c, cl = codes[l]
        bw.write_code(c, cl)


def _finish(bw, w, h):
    payload = b"\x2f" + bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _argb(a, r, g, b):
    return np.array([r, g, b, a], dtype=np.uint8)


# ---------------------------------------------------------------------------
# round-trips through the engine encoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(1, 1, 4), (3, 2, 4), (7, 5, 3), (16, 16, 4), (2, 33, 3)])
def test_roundtrip_exact(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    out = W.decode(W.encode(img))
    assert out.shape[:2] == shape[:2]
    if shape[2] == 4:
        assert np.array_equal(out, img)
    else:
        assert np.array_equal(out[..., :3], img)
        assert (out[..., 3] == 255).all()


def test_gray_input():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = W.decode(W.encode(img))
    assert np.array_equal(out[..., 0], img)
    assert np.array_equal(out[..., 1], img)


# ---------------------------------------------------------------------------
# decoder feature paths via hand-built streams
# ---------------------------------------------------------------------------

def _write_flat_literal_codes(bw):
    """R/B/A flat 8-bit + 1-symbol distance (as the encoder writes)."""
    for _ in range(3):
        W._write_flat_code(bw, n_eight=256, total=256)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)


def test_simple_code_two_symbols():
    """G via a simple 2-symbol code; pixels alternate two greens."""
    bw = W.BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # G: simple, 2 symbols (8-bit first): 10 and 200
    bw.write(1, 1)
    bw.write(1, 1)  # num_symbols-1 = 1
    bw.write(1, 1)  # first symbol 8 bits
    bw.write(10, 8)
    bw.write(200, 8)
    _write_flat_literal_codes(bw)
    g_codes = {10: (0, 1), 200: (1, 1)}
    for g in (10, 200, 200, 10):
        c, l = g_codes[g]
        bw.write_code(c, l)
        bw.write_code(1, 8)   # r
        bw.write_code(2, 8)   # b
        bw.write_code(255, 8)  # a
    img = W.decode(_finish(bw, 4, 1))
    assert list(img[0, :, 1]) == [10, 200, 200, 10]
    assert (img[..., 0] == 1).all() and (img[..., 2] == 2).all()


def test_lz77_backward_reference():
    """Literal then a length-3 copy at distance 1 (plane code > 120
    path exercised via the exact distance mapping dist_code-120)."""
    bw = W.BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # G alphabet: symbol 7 (literal) and 258 (length prefix 2 -> len 3)
    _write_normal_code(bw, 280, {7: 1, 258: 1})
    for _ in range(3):
        W._write_flat_code(bw, n_eight=256, total=256)
    # distance code: simple 1 symbol = 120 -> needs 8 bits
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(120, 8)
    g_codes = {7: (0, 1), 258: (1, 1)}
    c, l = g_codes[7]
    bw.write_code(c, l)
    bw.write_code(9, 8); bw.write_code(8, 8); bw.write_code(255, 8)
    c, l = g_codes[258]  # length prefix symbol 2 => length 3, no extra
    bw.write_code(c, l)
    # distance symbol 120 -> _lz77_value(120)... symbol is the PREFIX sym:
    # prefix 120 is out of the 40-sym alphabet; distance prefix alphabet
    # is 40 — use a simple code with symbol 39? Simpler: the 1-symbol
    # distance code above IS symbol 120 which is invalid; rebuild below.
    img_bytes = _finish(bw, 4, 1)
    # the stream above is structurally decodable only if distance prefix
    # symbol < 40; 120 > 39 would mis-decode — so this test instead uses
    # the assembled bytes from the correct builder below.
    bw = W.BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    _write_normal_code(bw, 280, {7: 1, 258: 1})
    for _ in range(3):
        W._write_flat_code(bw, n_eight=256, total=256)
    # distance prefix: simple 1 symbol = 0 -> dist_code 1; plane code 1
    # maps to (0,1)=width -> but width=4 > pos... use symbol that yields
    # dist_code 121 -> distance 1: prefix sym needs value 121:
    # _lz77_value(sym 15) = (2+(1))<<6 + extra... simpler: prefix sym 0
    # gives dist_code 1 -> plane (0,1) -> dist = width = 4 (invalid at
    # pos 1). Use plane code 2: (1,0) -> dist 1: dist_code 2 = prefix
    # sym 1.
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(1, 8)
    g_codes = {7: (0, 1), 258: (1, 1)}
    c, l = g_codes[7]
    bw.write_code(c, l)
    bw.write_code(9, 8); bw.write_code(8, 8); bw.write_code(255, 8)
    c, l = g_codes[258]
    bw.write_code(c, l)
    # distance code is single-symbol: zero bits read
    img = W.decode(_finish(bw, 4, 1))
    # one literal ARGB(255,9,7,8) then copy x3 at distance 1
    assert (img[0, :, 0] == 9).all()
    assert (img[0, :, 1] == 7).all()
    assert (img[0, :, 2] == 8).all()


def test_color_cache_hit():
    bw = W.BitWriter()
    _header(bw, 3, 1)
    bw.write(0, 1)       # no transforms
    bw.write(1, 1)       # color cache
    bw.write(2, 4)       # 2 bits -> 4 entries
    bw.write(0, 1)       # no meta
    px = (255 << 24) | (5 << 16) | (42 << 8) | 9
    idx = (px * 0x1E35A7BD) % (1 << 32) >> 30
    # G alphabet 256+24+4: literal 42 + cache symbol 280+idx
    _write_normal_code(bw, 284, {42: 1, 280 + idx: 1})
    for _ in range(3):
        W._write_flat_code(bw, n_eight=256, total=256)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # dist
    g_codes = {42: (0, 1), 280 + idx: (1, 1)}
    c, l = g_codes[42]
    bw.write_code(c, l)
    bw.write_code(5, 8); bw.write_code(9, 8); bw.write_code(255, 8)
    for _ in range(2):
        c, l = g_codes[280 + idx]
        bw.write_code(c, l)
    img = W.decode(_finish(bw, 3, 1))
    assert (img[0, :, 0] == 5).all() and (img[0, :, 1] == 42).all() \
        and (img[0, :, 2] == 9).all()


def test_subtract_green_transform():
    bw = W.BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    W._write_flat_code(bw, n_eight=256, total=280)
    _write_flat_literal_codes(bw)
    # stored (g=100, r=10, b=20) -> final r=110, b=120, g=100
    for _ in range(2):
        bw.write_code(100, 8)
        bw.write_code(10, 8)
        bw.write_code(20, 8)
        bw.write_code(255, 8)
    img = W.decode(_finish(bw, 2, 1))
    assert (img[0, :, 0] == 110).all()
    assert (img[0, :, 1] == 100).all()
    assert (img[0, :, 2] == 120).all()


def _write_subimage_const(bw, w, h, argb_value):
    """A minimal entropy-coded subimage where every pixel is a constant
    ARGB value, using simple 1-symbol codes per channel."""
    bw.write(0, 1)  # no cache
    a = (argb_value >> 24) & 0xFF
    r = (argb_value >> 16) & 0xFF
    g = (argb_value >> 8) & 0xFF
    b = argb_value & 0xFF
    for sym, alpha in ((g, 280), (r, 256), (b, 256), (a, 256), (0, 40)):
        bw.write(1, 1)              # simple
        bw.write(0, 1)              # 1 symbol
        bw.write(1, 1)              # 8-bit symbol
        bw.write(sym, 8)
    # all codes are single-symbol: zero data bits per pixel


def test_predictor_transform_mode1_left():
    """Predictor subimage = constant mode 1 (predict from left): stored
    residuals accumulate across the row."""
    bw = W.BitWriter()
    _header(bw, 4, 1)
    bw.write(1, 1)  # transform
    bw.write(0, 2)  # predictor
    bw.write(2, 3)  # size_bits = 4 -> one 16px block
    _write_subimage_const(bw, 1, 1, 1 << 8)  # green=mode 1
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    W._write_flat_code(bw, n_eight=256, total=280)
    _write_flat_literal_codes(bw)
    # pixel 0: residual vs 0xFF000000 -> a=+0 keeps 255? residual a must
    # be 0 so alpha stays 255; g residual 10; then +1 per step
    vals = [(10, 5, 3, 0), (1, 1, 1, 0), (1, 1, 1, 0), (1, 1, 1, 0)]
    for g, r, b, a in vals:
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(a, 8)
    img = W.decode(_finish(bw, 4, 1))
    assert list(img[0, :, 1]) == [10, 11, 12, 13]
    assert list(img[0, :, 0]) == [5, 6, 7, 8]
    assert (img[0, :, 3] == 255).all()


def test_color_indexing_with_packing():
    """4-color palette -> 2-bit packed indices (4 per green byte)."""
    bw = W.BitWriter()
    _header(bw, 8, 1)
    bw.write(1, 1)  # transform
    bw.write(3, 2)  # color indexing
    bw.write(3, 8)  # palette size - 1 = 3
    # palette subimage 4x1: delta-coded; emit first color then deltas.
    # colors: ARGB(255, 1,2,3), (255, 10,20,30), (255, 50,60,70), (255, 0,0,0)
    bw.write(0, 1)  # no cache (subimage stream starts here)
    # literal codes: flat for all channels
    W._write_flat_code(bw, n_eight=256, total=280)
    for _ in range(3):
        W._write_flat_code(bw, n_eight=256, total=256)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    cols = [(255, 1, 2, 3), (255, 10, 20, 30), (255, 50, 60, 70), (255, 0, 0, 0)]
    prev = (0, 0, 0, 0)
    for c in cols:
        d = tuple((c[i] - prev[i]) & 0xFF for i in range(4))
        bw.write_code(d[2], 8)  # g
        bw.write_code(d[1], 8)  # r
        bw.write_code(d[3], 8)  # b
        bw.write_code(d[0], 8)  # a
        prev = c
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache (main stream)
    bw.write(0, 1)  # no meta
    W._write_flat_code(bw, n_eight=256, total=280)
    _write_flat_literal_codes(bw)
    # packed width = 8/4 = 2 green bytes; indices 0,1,2,3 then 3,2,1,0
    packed = [0 | (1 << 2) | (2 << 4) | (3 << 6), 3 | (2 << 2) | (1 << 4) | (0 << 6)]
    for pv in packed:
        bw.write_code(pv, 8)
        bw.write_code(0, 8)
        bw.write_code(0, 8)
        bw.write_code(255, 8)
    img = W.decode(_finish(bw, 8, 1))
    exp = [cols[i] for i in (0, 1, 2, 3, 3, 2, 1, 0)]
    got = [(int(img[0, x, 3]), int(img[0, x, 0]), int(img[0, x, 1]), int(img[0, x, 2]))
           for x in range(8)]
    assert got == exp


# ---------------------------------------------------------------------------
# error handling + raster integration
# ---------------------------------------------------------------------------

def test_lossy_vp8_not_implemented():
    data = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        W.decode(data)


def test_bad_signature():
    with pytest.raises(ValueError):
        W.decode(b"NOPE" + b"\x00" * 20)


def test_raster_integration():
    from mapnik_vector_tile_spark.functions import raster as R

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(12, 9, 3)).astype(np.uint8)
    data = R.encode_image(img, "webp")
    assert R.sniff_format(data) == "webp"
    out = R.decode_image(data)
    assert np.array_equal(out[..., :3], img)
