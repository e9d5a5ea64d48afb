"""Raster kernels — the engine's analogue of the reference's raster
clipper (src/vector_tile_raster_clipper.ipp:23-523) and overzoom crop
(src/vector_tile_featureset_pbf.ipp:210-258).

The container has no image libraries (no PIL), so:

* PNG is implemented for real: a minimal, deterministic RGB8 codec in
  numpy + stdlib zlib (encode filter 0; decode handles filters 0-4).
* JPEG is implemented for real too (round 2): functions.jpeg is a
  baseline sequential JFIF codec in numpy — decode handles any 8-bit
  baseline stream (1/3 components, sampling factors up to 2, restart
  intervals; validated against the JVM ImageIO decoder on
  libjpeg-produced photos), encode emits 4:4:4 with quality-scaled
  Annex-K quantization (PSNR ~45 dB at quality 90 on the fixture
  gradients; JVM ImageIO reads the output at the same fidelity).
* The r1 deterministic stub container (SOI + b"MVTS" magic) remains
  decodable for payloads cached by earlier rounds.

All functions are batch-shaped (called from mapInPandas/applyInPandas
over Arrow batches); per-image work is numpy-vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "png_encode",
    "png_decode",
    "jpeg_stub_encode",
    "jpeg_stub_decode",
    "jpeg_encode",
    "jpeg_decode",
    "encode_image",
    "decode_image",
    "sniff_format",
    "bilinear_resize",
    "png_encode_rgba",
    "png_decode_raw",
    "premultiply",
    "demultiply",
    "resize_any",
    "GRAY_DTYPES",
    "overzoom_crop_window",
    "psnr",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_STUB_SIG = b"\xff\xd8MVTS"  # SOI marker + our stub tag


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """RGB8 (h, w, 3) uint8 -> PNG bytes (filter 0, non-interlaced)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colour type 2 (RGB)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports 8-bit RGB/RGBA/gray,
    filters 0-4, non-interlaced (everything this engine emits, plus the
    common cases for externally-produced tiles)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = bit_depth = colour = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, colour, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or interlace != 0:
                raise NotImplementedError("only 8-bit non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[colour]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * channels
    raw = raw.reshape(h, 1 + stride)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for r in range(h):
        ft = filters[r]
        line = raw[r, 1:].copy()
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[r] = line
        elif ft == 1:  # Sub
            for i in range(stride):
                left = out[r, i - bpp] if i >= bpp else 0
                out[r, i] = (int(line[i]) + int(left)) & 0xFF
        elif ft == 2:  # Up
            out[r] = (line.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        elif ft == 3:  # Average
            for i in range(stride):
                left = int(out[r, i - bpp]) if i >= bpp else 0
                out[r, i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(out[r, i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[r, i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
    img = out.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    elif channels == 2:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    elif channels == 4:
        img = img[:, :, :3]
    return img


def jpeg_stub_encode(img: np.ndarray) -> bytes:
    """Deterministic lossy fake-JPEG (STUB — see module docstring).

    Quantizes to 6 bits/channel (max error 2/255 per sample, PSNR ~46 dB)
    and stores the quantized plane as PNG behind a JPEG-SOI+MVTS magic.
    """
    img = np.asarray(img, dtype=np.uint8)
    q = (img >> 2) << 2
    q = q + 2  # mid-rise reconstruction point, keeps error symmetric
    q = np.clip(q, 0, 255).astype(np.uint8)
    return _JPEG_STUB_SIG + png_encode(q)


def jpeg_stub_decode(data: bytes) -> np.ndarray:
    if data.startswith(_JPEG_STUB_SIG):
        return png_decode(data[len(_JPEG_STUB_SIG) :])
    raise ValueError("not a stub-JPEG payload")


def jpeg_decode(data: bytes) -> np.ndarray:
    """Any JPEG payload: the r1 stub container or real baseline JFIF."""
    if data.startswith(_JPEG_STUB_SIG):
        return png_decode(data[len(_JPEG_STUB_SIG) :])
    if data[:2] == b"\xff\xd8":
        from mapnik_vector_tile_spark.functions import jpeg as J

        return J.decode(data)
    raise ValueError("not a JPEG payload")


def jpeg_encode(img: np.ndarray, quality: int = 95) -> bytes:
    """Real baseline JFIF (functions.jpeg). Default quality 95 keeps the
    BASELINE per-row invariant (>=40 dB) through the double-lossy
    decode -> resize -> re-encode path on noise-like fixture content."""
    from mapnik_vector_tile_spark.functions import jpeg as J

    return J.encode(img, quality=quality)


def sniff_format(data: bytes) -> str:
    if data.startswith(_PNG_SIG):
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"  # the reference's DEFAULT (processor.hpp:55)
    raise ValueError("unknown image format")


def decode_image(data: bytes) -> np.ndarray:
    fmt = sniff_format(data)
    if fmt == "png":
        return png_decode(data)
    if fmt == "webp":
        from mapnik_vector_tile_spark.functions import webp as _webp

        rgba = _webp.decode(data)
        if (rgba[..., 3] == 255).all():  # fully opaque -> RGB, like png_decode
            return np.ascontiguousarray(rgba[..., :3])
        return rgba
    return jpeg_decode(data)


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "jpeg":
        return jpeg_encode(img)
    if fmt == "webp":
        from mapnik_vector_tile_spark.functions import webp as _webp

        return _webp.encode(img)
    raise ValueError(f"unknown format {fmt!r}")


def png_encode_rgba(img: np.ndarray, level: int = 6) -> bytes:
    """RGBA8 (h, w, 4) uint8 -> PNG bytes (colour type 6)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 4:
        raise ValueError("png_encode_rgba expects (h, w, 4) uint8")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = np.empty((h, 1 + w * 4), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 4)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode_raw(data: bytes) -> np.ndarray:
    """PNG bytes -> native channel layout (h, w, c): gray 1, gray+alpha
    2, RGB 3, RGBA 4 — png_decode's RGB collapse is the compatibility
    wrapper; raster pipelines that need alpha use this."""
    rgb = png_decode(data)  # runs the shared filter machinery
    # png_decode collapses channels; re-derive the raw layout instead
    pos = len(_PNG_SIG)
    colour = None
    idat = bytearray()
    w = h = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, _bd, colour, _c, _f, _i = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[colour]
    if channels == 3:
        return rgb
    if channels == 4:
        # alpha survives only through a raw second unfiltering pass
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
        out = _unfilter(raw, h, w, channels)
        return out.reshape(h, w, channels)
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    out = _unfilter(raw, h, w, channels)
    return out.reshape(h, w, channels)


def _unfilter(raw: np.ndarray, h: int, w: int, channels: int) -> np.ndarray:
    stride = w * channels
    raw = raw.reshape(h, 1 + stride)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for r in range(h):
        ft = filters[r]
        line = raw[r, 1:].copy()
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[r] = line
        elif ft == 1:
            for i in range(stride):
                left = out[r, i - bpp] if i >= bpp else 0
                out[r, i] = (int(line[i]) + int(left)) & 0xFF
        elif ft == 2:
            out[r] = (line.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        elif ft == 3:
            for i in range(stride):
                left = int(out[r, i - bpp]) if i >= bpp else 0
                out[r, i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = int(out[r, i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[r, i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
    return out


def premultiply(rgba: np.ndarray) -> np.ndarray:
    """RGBA8 -> premultiplied float64 (the reference premultiplies
    before AGG scaling, src/vector_tile_raster_clipper.ipp:42-60)."""
    rgba = np.asarray(rgba, dtype=np.float64)
    out = rgba.copy()
    a = rgba[..., 3:4] / 255.0
    out[..., :3] *= a
    return out


def demultiply(prem: np.ndarray) -> np.ndarray:
    """Premultiplied float64 -> RGBA8 (divide-by-alpha, zero-safe)."""
    out = np.asarray(prem, dtype=np.float64).copy()
    a = out[..., 3:4] / 255.0
    nz = a > 1e-9
    out[..., :3] = np.where(nz, out[..., :3] / np.maximum(a, 1e-9), 0.0)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# dtype coverage matching the reference's image types
# (gray8/gray8s/gray16/gray16s/gray32/gray32s/gray32f/gray64/gray64s/
#  gray64f + rgba8, vector_tile_raster_clipper.ipp:23-523)
GRAY_DTYPES = (
    np.uint8, np.int8, np.uint16, np.int16, np.uint32, np.int32,
    np.float32, np.uint64, np.int64, np.float64,
)


# --- scaling-method matrix (K10): mapnik's scaling_method_e dispatch
# (src/vector_tile_processor.hpp:45,168-175 defaults SCALING_BILINEAR;
# src/vector_tile_raster_clipper.ipp:35 threads it into scale_image_agg).
# 'near' is AGG nearest-neighbour sampling; 'bicubic' is AGG's
# image_filter_bicubic (the cubic B-spline weight, radius 2); 'lanczos'
# is the windowed-sinc filter (radius 2). Filter weights are normalized
# per output tap row, like agg::image_filter_lut::normalize().

def _w_bicubic(x: np.ndarray) -> np.ndarray:
    # agg_image_filters.h image_filter_bicubic::calc_weight
    def p3(t):
        return np.where(t > 0.0, t * t * t, 0.0)

    return (1.0 / 6.0) * (
        p3(x + 2.0) - 4.0 * p3(x + 1.0) + 6.0 * p3(x) - 4.0 * p3(x - 1.0)
    )


def _w_lanczos(x: np.ndarray, radius: float = 2.0) -> np.ndarray:
    ax = np.abs(x)
    out = np.sinc(ax) * np.sinc(ax / radius)
    return np.where(ax < radius, out, 0.0)


_FILTERS = {"bicubic": (_w_bicubic, 2), "lanczos": (_w_lanczos, 2)}


def _sample_axis_f64(img: np.ndarray, pos: np.ndarray, axis: int, method: str) -> np.ndarray:
    """Separable 1-D filtered sampling along `axis` at ARBITRARY
    fractional source positions (float64): gather taps, weight, sum —
    one vectorized pass, edge-clamped like AGG. Shared by uniform
    resize and the georeferenced warp."""
    n = img.shape[axis]
    weight_fn, radius = _FILTERS[method]
    base = np.floor(pos).astype(np.int64)
    taps = np.arange(-radius + 1, radius + 1)
    idx = base[:, None] + taps[None, :]
    w = weight_fn(pos[:, None] - idx)
    w /= w.sum(axis=1, keepdims=True)
    idx = np.clip(idx, 0, n - 1)
    moved = np.moveaxis(img, axis, 0)
    gathered = moved[idx]  # (out_n, taps, ...)
    wshape = (len(pos), len(taps)) + (1,) * (gathered.ndim - 2)
    res = (gathered * w.reshape(wshape)).sum(axis=1)
    return np.moveaxis(res, 0, axis)


def _resample_axis_f64(img: np.ndarray, out_n: int, axis: int, method: str) -> np.ndarray:
    n = img.shape[axis]
    if out_n == n:
        return img
    pos = (np.arange(out_n) + 0.5) * (n / out_n) - 0.5
    return _sample_axis_f64(img, pos, axis, method)


def _near_index(out_n: int, n: int) -> np.ndarray:
    # AGG nearest-neighbour: sample the source pixel under each output
    # pixel center
    return np.clip(
        np.floor((np.arange(out_n) + 0.5) * (n / out_n)).astype(np.int64), 0, n - 1
    )


def _resample_f64(img: np.ndarray, out_h: int, out_w: int, method: str) -> np.ndarray:
    h, w = img.shape[:2]
    if (out_h, out_w) == (h, w):
        return img.copy()
    if method == "bilinear":
        return _bilinear_f64(img, out_h, out_w)
    if method == "near":
        return img[_near_index(out_h, h)][:, _near_index(out_w, w)].copy()
    if method not in _FILTERS:
        raise ValueError(
            f"unsupported scaling method {method!r} "
            "(near/bilinear/bicubic/lanczos)"
        )
    return _resample_axis_f64(
        _resample_axis_f64(img, out_h, 0, method), out_w, 1, method
    )


def resize_any(
    img: np.ndarray, out_h: int, out_w: int, method: str = "bilinear"
) -> np.ndarray:
    """Scale across the reference's pixel-type matrix with any
    scaling_method: RGBA8 goes through premultiply -> scale ->
    demultiply; RGB8/gray8 scale directly with uint8 clamping; wider
    gray types (int/float up to 64 bits) scale in float64 and cast back
    without 0..255 clamping."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 4 and img.dtype == np.uint8:
        prem = premultiply(img)
        scaled = _resample_f64(prem, out_h, out_w, method)
        return demultiply(scaled)
    if img.ndim == 3 and img.dtype == np.uint8:
        if method == "bilinear":
            return bilinear_resize(img, out_h, out_w)
        out = _resample_f64(img.astype(np.float64), out_h, out_w, method)
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    scaled = _resample_f64(img.astype(np.float64), out_h, out_w, method)
    if np.issubdtype(img.dtype, np.integer):
        info = np.iinfo(img.dtype)
        return np.clip(np.rint(scaled), info.min, info.max).astype(img.dtype)
    return scaled.astype(img.dtype)


def _bilinear_f64(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    if (out_h, out_w) == (h, w):
        return img.copy()
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    extra = (1,) * (img.ndim - 2)
    wy = np.clip(ys - y0, 0.0, 1.0).reshape(-1, 1, *extra)
    wx = np.clip(xs - x0, 0.0, 1.0).reshape(1, -1, *extra)
    p00 = img[y0][:, x0]
    p01 = img[y0][:, x1]
    p10 = img[y1][:, x0]
    p11 = img[y1][:, x1]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear scale — semantics of the reference's AGG bilinear path
    (src/vector_tile_raster_clipper.ipp:42-60: scale_image_agg with
    image_scaling_bilinear). Pixel-center sampling, edge clamp."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    if (out_h, out_w) == (h, w):
        return img.copy()  # passthrough fast path (raster_clipper.ipp:37-41)
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p00 = img[y0][:, x0].astype(np.float64)
    p01 = img[y0][:, x1].astype(np.float64)
    p10 = img[y1][:, x0].astype(np.float64)
    p11 = img[y1][:, x1].astype(np.float64)
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def overzoom_crop_window(
    img_w: int,
    img_h: int,
    src_box: tuple[float, float, float, float],
    query_box: tuple[float, float, float, float],
) -> tuple[int, int, int, int]:
    """Minimal pixel window covering the query/source intersection,
    clamped to the image — src/vector_tile_featureset_pbf.ipp:210-258.
    Returns (x0, y0, x1, y1) pixel bounds (x1/y1 exclusive)."""
    sminx, sminy, smaxx, smaxy = src_box
    qminx, qminy, qmaxx, qmaxy = query_box
    iminx, iminy = max(sminx, qminx), max(sminy, qminy)
    imaxx, imaxy = min(smaxx, qmaxx), min(smaxy, qmaxy)
    if iminx >= imaxx or iminy >= imaxy:
        return (0, 0, 0, 0)
    sx = img_w / (smaxx - sminx)
    sy = img_h / (smaxy - sminy)
    eps = 1e-9  # snap FP noise so exact tile seams don't bleed a pixel
    x0 = int(np.floor((iminx - sminx) * sx + eps))
    x1 = int(np.ceil((imaxx - sminx) * sx - eps))
    # image rows run top-down: row 0 = maxy edge
    y0 = int(np.floor((smaxy - imaxy) * sy + eps))
    y1 = int(np.ceil((smaxy - iminy) * sy - eps))
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(img_w, x1), min(img_h, y1)
    return (x0, y0, x1, y1)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
