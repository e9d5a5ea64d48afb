"""GeoTIFF raster source — the reference's gdal datasource analog.

The reference's raster path reads georeferenced rasters through
mapnik's gdal plugin and warps them into per-tile raster features
(test/raster_tile.cpp:31-158 builds z1 tiles from
test/data/natural_earth.tif; src/vector_tile_raster_clipper.ipp does
the scale/clip). This module is a pure-numpy/stdlib reader for the
common GeoTIFF shape those fixtures use — baseline TIFF (II/MM),
strip or tile layout, uncompressed / Deflate / PackBits, horizontal
predictor, 8-bit samples — plus the ModelPixelScale/ModelTiepoint
affine and the ProjectedCSType EPSG geokey.

warp_to_tile() is the raster clipper's core: bilinear resample of the
source raster onto a web-mercator tile's pixel grid. It is separable
(target x depends only on column, y only on row), so the whole warp is
two 1-D coordinate arrays and four gathers — no per-pixel Python.

Distribution: one task per file via Spark's binaryFile source
(read_geotiff_spark), the same per-file parallelism the shapefile and
GeoJSON sources use; a 100 TB run shards over files, and per-file
decode stays in one Arrow batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from mapnik_vector_tile_spark import tilemath

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_values(data: bytes, bo: str, typ: int, cnt: int, raw: bytes):
    size = _TYPE_SIZES[typ] * cnt
    if size > 4:
        (off,) = struct.unpack(bo + "I", raw)
        buf = data[off : off + size]
    else:
        buf = raw[:size]
    if typ == 2:  # ASCII
        return buf.rstrip(b"\x00").decode("latin-1")
    if typ in (5, 10):  # RATIONAL
        fmt = "I" if typ == 5 else "i"
        vals = struct.unpack(bo + fmt * (2 * cnt), buf)
        return [vals[2 * i] / max(vals[2 * i + 1], 1) for i in range(cnt)]
    fmt = _TYPE_FMT[typ]
    return list(struct.unpack(bo + fmt * cnt, buf))


def parse_ifd(data: bytes) -> dict[int, list]:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (off,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[off : off + 2])
    tags: dict[int, list] = {}
    for i in range(n):
        e = data[off + 2 + i * 12 : off + 2 + (i + 1) * 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        if typ in _TYPE_SIZES:
            tags[tag] = _read_values(data, bo, typ, cnt, e[8:12])
    return tags


def _unpackbits(raw: bytes) -> bytes:
    """PackBits (compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        n = raw[i]
        i += 1
        if n < 128:
            out += raw[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += raw[i : i + 1] * (257 - n)
            i += 1
    return bytes(out)


def read_geotiff(data: bytes):
    """TIFF bytes -> (img uint8 (h, w, spp), transform, epsg | None).

    transform = (origin_x, origin_y, scale_x, scale_y): pixel (col, row)
    upper-left corner maps to (origin_x + col*scale_x,
    origin_y - row*scale_y) — north-up, no rotation (the
    ModelPixelScale/ModelTiepoint form; gdalwarp's output shape).
    """
    tags = parse_ifd(data)
    w = int(tags[256][0])
    h = int(tags[257][0])
    spp = int(tags.get(277, [1])[0])
    bits = tags.get(258, [8])
    if any(int(b) != 8 for b in bits):
        raise NotImplementedError("only 8-bit GeoTIFF samples supported")
    comp = int(tags.get(259, [1])[0])
    if int(tags.get(284, [1])[0]) != 1:
        raise NotImplementedError("planar configuration 2 not supported")

    def decomp(raw: bytes) -> bytes:
        if comp == 1:
            return raw
        if comp in (8, 32946):  # Deflate
            return zlib.decompress(raw)
        if comp == 32773:
            return _unpackbits(raw)
        raise NotImplementedError(f"TIFF compression {comp} not supported")

    img = np.zeros((h, w, spp), dtype=np.uint8)
    if 273 in tags:  # strips
        offs, cnts = tags[273], tags[279]
        rps = int(tags.get(278, [h])[0])
        for si, (o, c) in enumerate(zip(offs, cnts)):
            rows = decomp(data[int(o) : int(o) + int(c)])
            r0 = si * rps
            nr = min(rps, h - r0)
            arr = np.frombuffer(rows, dtype=np.uint8, count=nr * w * spp)
            img[r0 : r0 + nr] = arr.reshape(nr, w, spp)
    elif 324 in tags:  # tiles
        tw, th = int(tags[322][0]), int(tags[323][0])
        offs, cnts = tags[324], tags[325]
        ntx = (w + tw - 1) // tw
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            tx, ty = ti % ntx, ti // ntx
            raw = decomp(data[int(o) : int(o) + int(c)])
            arr = np.frombuffer(raw, dtype=np.uint8, count=th * tw * spp).reshape(th, tw, spp)
            y0, x0 = ty * th, tx * tw
            img[y0 : min(y0 + th, h), x0 : min(x0 + tw, w)] = arr[
                : min(th, h - y0), : min(tw, w - x0)
            ]
    else:
        raise ValueError("TIFF has neither strip nor tile offsets")

    if int(tags.get(317, [1])[0]) == 2:  # horizontal predictor
        img = np.cumsum(img.astype(np.uint32), axis=1).astype(np.uint8)

    transform = None
    if 33550 in tags and 33922 in tags:
        sx, sy = float(tags[33550][0]), float(tags[33550][1])
        tp = tags[33922]
        # tiepoint (i, j, k) -> (X, Y, Z): origin of pixel (i, j)
        ox = float(tp[3]) - float(tp[0]) * sx
        oy = float(tp[4]) + float(tp[1]) * sy
        transform = (ox, oy, sx, sy)

    epsg = None
    if 34735 in tags:
        gk = tags[34735]
        for i in range(4, len(gk), 4):  # skip directory header
            key, loc, cnt, val = gk[i : i + 4]
            if key in (3072, 2048) and loc == 0:  # Projected / Geographic CS
                epsg = int(val)
                if key == 3072:
                    break
    return img, transform, epsg


def warp_to_tile(
    img: np.ndarray,
    transform: tuple[float, float, float, float],
    z: int,
    x: int,
    y: int,
    out_size: int = 512,
    method: str = "bilinear",
) -> np.ndarray:
    """Filtered resample of a mercator-georeferenced raster onto the
    (z, x, y) tile's out_size x out_size pixel grid (the raster
    clipper's scale/clip, vector_tile_raster_clipper.ipp:23-69, with
    mapnik's scaling_method_e surface: near / bilinear (default) /
    bicubic / lanczos). Edge-clamped; fully separable, so cost is
    O(out_size^2 * bands) numpy."""
    ox, oy, sx, sy = transform
    minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(x, y, z)
    h, w = img.shape[:2]
    # target pixel centers in mercator -> fractional source pixel coords
    tx = minx + (np.arange(out_size) + 0.5) * (maxx - minx) / out_size
    ty = maxy - (np.arange(out_size) + 0.5) * (maxy - miny) / out_size
    u = (tx - ox) / sx - 0.5
    v = (oy - ty) / sy - 0.5
    if method == "near":
        ui = np.clip(np.floor(u + 0.5).astype(np.int64), 0, w - 1)
        vi = np.clip(np.floor(v + 0.5).astype(np.int64), 0, h - 1)
        return img[np.ix_(vi, ui)].copy()
    if method != "bilinear":
        from mapnik_vector_tile_spark.functions.raster import _sample_axis_f64

        out = _sample_axis_f64(img.astype(np.float64), v, 0, method)
        out = _sample_axis_f64(out, u, 1, method)
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    u0 = np.clip(np.floor(u).astype(np.int64), 0, w - 1)
    v0 = np.clip(np.floor(v).astype(np.int64), 0, h - 1)
    u1 = np.minimum(u0 + 1, w - 1)
    v1 = np.minimum(v0 + 1, h - 1)
    fu = np.clip(u - np.floor(u), 0.0, 1.0)
    fv = np.clip(v - np.floor(v), 0.0, 1.0)
    p = img.astype(np.float64)
    top = p[np.ix_(v0, u0)] * (1 - fu)[None, :, None] + p[np.ix_(v0, u1)] * fu[None, :, None]
    bot = p[np.ix_(v1, u0)] * (1 - fu)[None, :, None] + p[np.ix_(v1, u1)] * fu[None, :, None]
    out = top * (1 - fv)[:, None, None] + bot * fv[:, None, None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


GEOTIFF_SCHEMA = (
    "path string, w int, h int, bands int, origin_x double, origin_y double, "
    "scale_x double, scale_y double, epsg int, px binary"
)


def read_geotiff_spark(spark, path_glob: str):
    """Distributed GeoTIFF scan: one decode task per file (binaryFile
    source), raw interleaved uint8 pixels in `px`. Mirrors the
    shapefile/GeoJSON source pattern (sources/shapefile.py)."""
    import pandas as pd

    def kernel(iterator):
        for pdf in iterator:
            rows = []
            for _, r in pdf.iterrows():
                img, transform, epsg = read_geotiff(bytes(r["content"]))
                ox, oy, sx, sy = transform if transform else (0.0, 0.0, 1.0, 1.0)
                rows.append(
                    (
                        r["path"], img.shape[1], img.shape[0], img.shape[2],
                        ox, oy, sx, sy, epsg if epsg is not None else -1,
                        img.tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "w", "h", "bands", "origin_x", "origin_y",
                    "scale_x", "scale_y", "epsg", "px",
                ],
            )

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(kernel, schema=GEOTIFF_SCHEMA)
