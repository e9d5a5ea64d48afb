"""WebP lossless (VP8L) codec — the reference's DEFAULT raster format
(src/vector_tile_processor.hpp:55 image_format_("webp"); re-encode
dispatch src/vector_tile_raster_clipper.ipp:23-523).

Decoder: the full VP8L feature set from the public "WebP Lossless
Bitstream Specification" — RIFF container, all four transforms
(predictor/color/subtract-green/color-indexing incl. pixel packing),
meta prefix groups, color cache, LZ77 backward references with the 2D
distance plane codes, simple and normal (code-length-coded) prefix
codes. Lossy VP8 chunks are out of scope (NotImplementedError) — the
tiling pipeline re-encodes rasters losslessly.

Encoder: a minimal VALID writer (no transforms, no cache, no meta, one
prefix group, flat 8-bit literal codes + 1-symbol distance code) —
byte-inefficient (~32bpp) but spec-conformant; it exists so 'webp' is a
first-class fmt in the raster pipeline, not for compression.

No libwebp exists in this environment, so conformance is pinned by
spec-derived bit-level goldens plus exhaustive lossless round-trip
properties (tests/test_webp.py); the decoder and encoder are written
independently from the spec text.

Bit conventions (spec §"RIFF header"/"prefix codes"): the stream is
consumed LSB-first within each byte; fixed-width fields arrive
LSB-first; prefix CODES arrive MSB-first (deflate-style).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        """n-bit fixed-width value, LSB-first."""
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("VP8L: bitstream exhausted")
            b = (self.data[self.pos] >> self.bit) & 1
            v |= b << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_bit(self) -> int:
        return self.read(1)


class BitWriter:
    __slots__ = ("out", "cur", "bit")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        """n-bit fixed-width value, LSB-first."""
        for i in range(n):
            if (v >> i) & 1:
                self.cur |= 1 << self.bit
            self.bit += 1
            if self.bit == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.bit = 0

    def write_code(self, code: int, length: int) -> None:
        """Prefix code bits, MSB-first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out) + (bytes([self.cur]) if self.bit else b"")
        return out

    def bit_length(self) -> int:
        return len(self.out) * 8 + self.bit


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

class PrefixCode:
    """Canonical prefix code: decode walks MSB-first through a dict of
    (length, code) -> symbol; 0-bit single-symbol codes supported."""

    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths):
        lengths = list(lengths)
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        self.single = None
        self.table = {}
        self.max_len = 0
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        # canonical assignment (shorter codes first, then symbol order)
        nz.sort()
        code = 0
        prev_len = nz[0][0]
        codes = {}
        for l, s in nz:
            code <<= (l - prev_len)
            codes[s] = (code, l)
            code += 1
            prev_len = l
        if code != (1 << prev_len):
            raise ValueError("VP8L: prefix code not complete")
        for s, (c, l) in codes.items():
            self.table[(l, c)] = s
            self.max_len = max(self.max_len, l)

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            hit = self.table.get((l, code))
            if hit is not None:
                return hit
        raise ValueError("VP8L: invalid prefix code bits")

    @staticmethod
    def canonical_codes(lengths):
        """symbol -> (code, length) for an encoder."""
        nz = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
        out = {}
        code = 0
        prev = nz[0][0]
        for l, s in nz:
            code <<= (l - prev)
            out[s] = (code, l)
            code += 1
            prev = l
        return out


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
            pc = PrefixCode.__new__(PrefixCode)
            pc.single = sym0
            pc.table = {}
            pc.max_len = 0
            return pc
        return PrefixCode(lengths)
    # normal: code-length-coded lengths
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = PrefixCode(clc_lengths)  # 1-symbol codes read 0 bits
    max_symbol = alphabet_size
    if br.read_bit():  # use length / max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L: max_symbol out of range")
    lengths = [0] * alphabet_size
    prev_nz = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_nz = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_nz
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 7 + br.read(7)
    return PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------

def _lz77_value(br: BitReader, prefix_sym: int) -> int:
    if prefix_sym < 4:
        return prefix_sym + 1
    extra = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra
    return offset + br.read(extra) + 1


# distance plane codes: codes 1..120 map to (dx, dy) neighborhood
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_to_distance(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dx + dy * width
    return max(d, 1)


# ---------------------------------------------------------------------------
# core entropy-coded image decode
# ---------------------------------------------------------------------------

def _is_flat8(pc: "PrefixCode") -> bool:
    """True iff the code is the flat canonical 8-bit code where every
    byte value 0..255 has code == symbol (our encoder's literal code)."""
    if pc.single is not None or pc.max_len != 8 or len(pc.table) != 256:
        return False
    t = pc.table
    return all(t.get((8, c)) == c for c in range(256))


def _decode_flat_literals(br, groups, meta, cache, npix):
    """Vectorized fast path for literal-only streams with flat 8-bit
    g/r/b/a codes (the shape our encoder writes): every pixel is a
    fixed 32 bits, so the remaining payload deinterleaves with numpy
    instead of 4*npix prefix-code walks. Returns None when the stream
    shape doesn't qualify (foreign encoders fall through to the general
    loop)."""
    if meta is not None or cache is not None or len(groups) != 1:
        return None
    gcode, rcode, bcode, acode, _d = groups[0]
    if not (_is_flat8(gcode) and _is_flat8(rcode) and _is_flat8(bcode)
            and _is_flat8(acode)):
        return None
    start = br.pos * 8 + br.bit
    need = npix * 32
    data = np.frombuffer(br.data, dtype=np.uint8)
    if start + need > data.size * 8:
        raise ValueError("VP8L: bitstream exhausted")
    bits = np.unpackbits(data, bitorder="little")[start : start + need]
    # each code is read MSB-first: stream bit k is bit (7-k) of the byte
    vals = np.packbits(bits, bitorder="big").astype(np.uint32).reshape(-1, 4)
    end = start + need
    br.pos, br.bit = end >> 3, end & 7
    # bytes arrive g, r, b, a -> ARGB word
    return (vals[:, 3] << 24) | (vals[:, 1] << 16) | (vals[:, 0] << 8) | vals[:, 2]

def _decode_image_stream(br: BitReader, w: int, h: int, is_level0: bool):
    """-> (argb uint32 (h*w,), optional transforms list).
    Transforms list entries: (type, data...) in read order."""
    transforms = []
    xsize = w
    if is_level0:
        while br.read_bit():
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("VP8L: duplicate transform")
            if ttype == 2:  # subtract green
                transforms.append((2,))
            elif ttype in (0, 1):  # predictor / color
                size_bits = br.read(3) + 2
                bs = 1 << size_bits
                tw = (xsize + bs - 1) >> size_bits
                th = (h + bs - 1) >> size_bits
                sub, _ = _decode_image_stream(br, tw, th, False)
                transforms.append((ttype, size_bits, sub.reshape(th, tw)))
            elif ttype == 3:  # color indexing
                pal_size = br.read(8) + 1
                pal, _ = _decode_image_stream(br, pal_size, 1, False)
                # palette is delta-coded componentwise
                pal = pal.astype(np.uint32)
                for i in range(1, pal_size):
                    a0 = (pal[i - 1] >> 24) & 0xFF
                    r0 = (pal[i - 1] >> 16) & 0xFF
                    g0 = (pal[i - 1] >> 8) & 0xFF
                    b0 = pal[i - 1] & 0xFF
                    a1 = (pal[i] >> 24) & 0xFF
                    r1 = (pal[i] >> 16) & 0xFF
                    g1 = (pal[i] >> 8) & 0xFF
                    b1 = pal[i] & 0xFF
                    pal[i] = (
                        (((a0 + a1) & 0xFF) << 24) | (((r0 + r1) & 0xFF) << 16)
                        | (((g0 + g1) & 0xFF) << 8) | ((b0 + b1) & 0xFF)
                    )
                if pal_size <= 2:
                    pack_bits = 3
                elif pal_size <= 4:
                    pack_bits = 2
                elif pal_size <= 16:
                    pack_bits = 1
                else:
                    pack_bits = 0
                transforms.append((3, pal, pack_bits, xsize))
                if pack_bits:
                    xsize = (xsize + (1 << pack_bits) - 1) >> pack_bits
            else:
                raise ValueError("VP8L: bad transform type")

    # color cache
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix groups
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        mimg, _ = _decode_image_stream(br, mw, mh, False)
        meta = (((mimg >> 8) & 0xFFFF)).astype(np.int64).reshape(mh, mw)
        n_groups = int(meta.max()) + 1

    g_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _g in range(n_groups):
        gcode = _read_prefix_code(br, g_alpha)
        rcode = _read_prefix_code(br, 256)
        bcode = _read_prefix_code(br, 256)
        acode = _read_prefix_code(br, 256)
        dcode = _read_prefix_code(br, 40)
        groups.append((gcode, rcode, bcode, acode, dcode))

    npix = xsize * h
    fast = _decode_flat_literals(br, groups, meta, cache, npix)
    if fast is not None:
        return fast, transforms
    out = np.zeros(npix, dtype=np.uint32)
    pos = 0
    while pos < npix:
        if meta is not None:
            x = pos % xsize
            y = pos // xsize
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            gcode, rcode, bcode, acode, dcode = groups[gi]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.decode(br)
        if s < 256:  # literal
            g = s
            r = rcode.decode(br)
            b = bcode.decode(br)
            a = acode.decode(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            if cache is not None:
                cache[(px * 0x1E35A7BD) % (1 << 32) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _lz77_value(br, s - 256)
            dsym = dcode.decode(br)
            dist_code = _lz77_value(br, dsym)
            dist = _plane_to_distance(dist_code, xsize)
            if dist > pos or pos + length > npix:
                raise ValueError("VP8L: bad backward reference")
            for k in range(length):  # byte-wise: overlapping copies repeat
                px = int(out[pos + k - dist])
                out[pos + k] = px
                if cache is not None:
                    cache[(px * 0x1E35A7BD) % (1 << 32) >> (32 - cache_bits)] = px
            pos += length
        else:  # color cache hit
            if cache is None:
                raise ValueError("VP8L: cache hit without cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out, transforms


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------

def _apply_inverse_transforms(argb: np.ndarray, w: int, h: int, transforms):
    """transforms in READ order; applied in reverse."""
    for t in reversed(transforms):
        if t[0] == 3:  # color indexing (first inverse applied = last read)
            _, pal, pack_bits, orig_w = t
            if pack_bits:
                packed_w = (orig_w + (1 << pack_bits) - 1) >> pack_bits
                img = argb.reshape(h, packed_w)
                idx_per = 1 << pack_bits
                bits = 8 >> pack_bits
                green = (img >> 8) & 0xFF
                cols = []
                for k in range(idx_per):
                    cols.append((green >> (k * bits)) & ((1 << bits) - 1))
                idx = np.stack(cols, axis=2).reshape(h, packed_w * idx_per)[:, :orig_w]
            else:
                idx = (argb.reshape(h, -1) >> 8) & 0xFF
            idx = np.minimum(idx, len(pal) - 1)
            argb = pal[idx.reshape(-1)].astype(np.uint32)
        elif t[0] == 2:  # subtract green
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        elif t[0] == 1:  # color transform
            _, size_bits, sub = t
            argb = _inverse_color_transform(argb, w, h, size_bits, sub)
        elif t[0] == 0:  # predictor
            _, size_bits, sub = t
            argb = _inverse_predictor(argb, w, h, size_bits, sub)
    return argb


def _comp(px, shift):
    return (px >> shift) & 0xFF


def _inverse_color_transform(argb, w, h, size_bits, sub):
    img = argb.reshape(h, w)
    out = img.copy()
    for y in range(h):
        row = sub[y >> size_bits]
        for x in range(w):
            cte = int(row[x >> size_bits])
            # element layout (libwebp VP8LMultipliers): green_to_red =
            # bits 0-7, green_to_blue = bits 8-15, red_to_blue = bits 16-23
            g2r = _to_i8(_comp(cte, 0))
            g2b = _to_i8(_comp(cte, 8))
            r2b = _to_i8(_comp(cte, 16))
            px = int(out[y, x])
            a = _comp(px, 24)
            r = _comp(px, 16)
            g = _comp(px, 8)
            b = _comp(px, 0)
            r = (r + ((g2r * _to_i8(g)) >> 5)) & 0xFF
            b = (b + ((g2b * _to_i8(g)) >> 5)) & 0xFF
            b = (b + ((r2b * _to_i8(r)) >> 5)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out.reshape(-1)


def _to_i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _avg2(a, b):
    return (a + b) >> 1


def _clamp_add_subtract_full(a, b, c):
    v = a + b - c
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_add_subtract_half(a, b):
    v = a + ((a - b) >> 1)
    return 0 if v < 0 else (255 if v > 255 else v)


def _inverse_predictor(argb, w, h, size_bits, sub):
    img = argb.reshape(h, w).astype(np.uint32)
    out = np.zeros_like(img)

    def px_bytes(v):
        return ((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)

    for y in range(h):
        srow = sub[y >> size_bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                mode = (int(srow[x >> size_bits]) >> 8) & 0xFF
                L = px_bytes(int(out[y, x - 1]))
                T = px_bytes(int(out[y - 1, x]))
                TL = px_bytes(int(out[y - 1, x - 1]))
                if x + 1 < w:
                    tr_px = int(out[y - 1, x + 1])
                else:
                    # scan-order adjacency: argb[(y-1)*w + w] IS the first
                    # pixel of the current row (already decoded)
                    tr_px = int(out[y, 0])
                TR = px_bytes(tr_px)
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = int(out[y, x - 1])
                elif mode == 2:
                    pred = int(out[y - 1, x])
                elif mode == 3:
                    pred = tr_px
                elif mode == 4:
                    pred = int(out[y - 1, x - 1])
                elif mode == 5:
                    c = tuple(_avg2(_avg2(L[i], TR[i]), T[i]) for i in range(4))
                    pred = (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
                elif mode == 6:
                    c = tuple(_avg2(L[i], TL[i]) for i in range(4))
                    pred = (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
                elif mode == 7:
                    c = tuple(_avg2(L[i], T[i]) for i in range(4))
                    pred = (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
                elif mode == 8:
                    c = tuple(_avg2(TL[i], T[i]) for i in range(4))
                    pred = (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
                elif mode == 9:
                    c = tuple(_avg2(T[i], TR[i]) for i in range(4))
                    pred = (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
                elif mode == 10:
                    c = tuple(
                        _avg2(_avg2(L[i], TL[i]), _avg2(T[i], TR[i]))
                        for i in range(4)
                    )
                    pred = (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
                elif mode == 11:  # Select
                    pl = sum(abs(T[i] - TL[i]) for i in range(4))
                    pt = sum(abs(L[i] - TL[i]) for i in range(4))
                    pred = int(out[y, x - 1]) if pl < pt else int(out[y - 1, x])
                elif mode == 12:
                    c = tuple(
                        _clamp_add_subtract_full(L[i], T[i], TL[i]) for i in range(4)
                    )
                    pred = (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
                elif mode == 13:
                    c = tuple(
                        _clamp_add_subtract_half(_avg2(L[i], T[i]), TL[i])
                        for i in range(4)
                    )
                    pred = (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]
                else:
                    raise ValueError(f"VP8L: bad predictor mode {mode}")
            cur = int(img[y, x])
            pb = px_bytes(cur)
            pp = px_bytes(pred)
            res = tuple((pb[i] + pp[i]) & 0xFF for i in range(4))
            out[y, x] = (res[0] << 24) | (res[1] << 16) | (res[2] << 8) | res[3]
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def decode(data: bytes) -> np.ndarray:
    """WebP bytes -> RGBA uint8 (h, w, 4). VP8L chunks only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            payload = body
            break
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 decode is out of scope (re-encode path is lossless)"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP: no VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb, transforms = _decode_image_stream(br, w, h, True)
    argb = _apply_inverse_transforms(argb, w, h, transforms)
    argb = argb.reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., 0] = (argb >> 16) & 0xFF
    rgba[..., 1] = (argb >> 8) & 0xFF
    rgba[..., 2] = argb & 0xFF
    rgba[..., 3] = (argb >> 24) & 0xFF
    return rgba


def encode(img: np.ndarray) -> bytes:
    """RGBA/RGB uint8 (h, w, 3|4) -> WebP VP8L bytes (minimal valid
    stream: no transforms, one prefix group, flat literal codes)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        a = np.full((h, w), 255, dtype=np.uint8)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
    else:
        r, g, b, a = img[..., 0], img[..., 1], img[..., 2], img[..., 3]
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if img.shape[2] == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    # G code (alphabet 280): flat 8-bit over 0..255, zero elsewhere —
    # code-length code uses two 1-bit symbols {0, 8}
    _write_flat_code(bw, n_eight=256, total=280)
    for _ in range(3):  # R, B, A: flat 8-bit complete codes
        _write_flat_code(bw, n_eight=256, total=256)
    # distance code: simple, 1 symbol (0), never used
    bw.write(1, 1)   # simple
    bw.write(0, 1)   # num_symbols - 1 = 0
    bw.write(0, 1)   # first symbol in 1 bit
    bw.write(0, 1)   # symbol 0
    # literals: flat canonical 8-bit code == symbol value, MSB-first.
    # Vectorized: each literal is a fixed 8-bit code appended MSB-first
    # into the LSB-first stream, so the whole payload is (header bits in
    # stream order) + (big-endian bit expansion of the interleaved
    # g,r,b,a bytes), repacked LSB-first.
    lit = np.empty((h * w, 4), dtype=np.uint8)
    lit[:, 0] = g.reshape(-1)
    lit[:, 1] = r.reshape(-1)
    lit[:, 2] = b.reshape(-1)
    lit[:, 3] = a.reshape(-1)
    head_len = bw.bit_length()
    head_bits = np.unpackbits(
        np.frombuffer(bw.bytes(), dtype=np.uint8), bitorder="little"
    )[:head_len]
    lit_bits = np.unpackbits(lit.reshape(-1), bitorder="big")
    stream = np.packbits(
        np.concatenate([head_bits, lit_bits]), bitorder="little"
    ).tobytes()
    payload = b"\x2f" + stream
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _write_flat_code(bw: BitWriter, n_eight: int, total: int) -> None:
    """Normal prefix code: `n_eight` leading symbols of length 8 (a
    complete flat code), rest zero. Code-length code = {0:len1, 8:len1}."""
    bw.write(0, 1)        # not simple
    # num_code_lengths = 19 -> write 15 (4 bits), then 19 3-bit lengths
    bw.write(19 - 4, 4)
    clc = [0] * 19
    clc[0] = 1
    clc[8] = 1
    for sym in _CLC_ORDER:
        bw.write(clc[sym], 3)
    bw.write(0, 1)        # no max_symbol
    codes = PrefixCode.canonical_codes(clc)
    c8, l8 = codes[8]
    c0, l0 = codes[0]
    for _ in range(n_eight):
        bw.write_code(c8, l8)
    for _ in range(total - n_eight):
        bw.write_code(c0, l0)
