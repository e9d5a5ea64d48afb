"""ESRI Shapefile source (S8 — the reference's mapnik shape datasource).

Pure-numpy/stdlib parser of the public shapefile spec (ESRI whitepaper,
July 1998): .shp geometry records (Point 1, PolyLine 3, Polygon 5,
MultiPoint 8 + their Z/M variants read as 2-D) and the .dbf attribute
table (dBASE III header, C/N/F/L/D field types). Distributed shape:
one task per file via Spark's binaryFile source; records of a file
parse as numpy slices.

Polygon rings follow the spec: clockwise = exterior, counter-clockwise
= hole; rings regroup into polygons by containment order exactly like
mapnik's shape reader feeds boost polygons.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SHP_MAGIC = 9994


def _ring_is_cw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    xp = np.concatenate([x[-1:], x[:-1]])
    yp = np.concatenate([y[-1:], y[:-1]])
    return float(np.sum((x - xp) * (y + yp))) > 0.0  # shoelace, y-up


def _fmt(v: float) -> str:
    return repr(float(v))


def _seq(pts: np.ndarray) -> str:
    return ",".join(f"{_fmt(p[0])} {_fmt(p[1])}" for p in pts)


def _parts_of(rec: bytes, offset: int):
    n_parts, n_points = struct.unpack_from("<ii", rec, offset)
    parts = np.frombuffer(rec, dtype="<i4", count=n_parts, offset=offset + 8)
    pts = np.frombuffer(
        rec, dtype="<f8", count=n_points * 2, offset=offset + 8 + 4 * n_parts
    ).reshape(-1, 2)
    bounds = np.concatenate([parts, [n_points]])
    return [pts[bounds[i] : bounds[i + 1]] for i in range(n_parts)]


def shp_record_to_wkt(shape_type: int, rec: bytes) -> str | None:
    """One .shp record body -> WKT (None for null shapes)."""
    base = shape_type % 10  # Z (+10) and M (+20) variants: read XY only
    if shape_type == 0:
        return None
    if base == 1:  # Point
        x, y = struct.unpack_from("<dd", rec, 4)
        return f"POINT({_fmt(x)} {_fmt(y)})"
    if base == 8:  # MultiPoint
        (n,) = struct.unpack_from("<i", rec, 36)
        pts = np.frombuffer(rec, dtype="<f8", count=n * 2, offset=40).reshape(-1, 2)
        return f"MULTIPOINT({_seq(pts)})"
    if base == 3:  # PolyLine
        lines = _parts_of(rec, 36)
        if len(lines) == 1:
            return f"LINESTRING({_seq(lines[0])})"
        return "MULTILINESTRING(" + ",".join(f"({_seq(l)})" for l in lines) + ")"
    if base == 5:  # Polygon: CW exteriors, CCW holes (spec ordering)
        rings = _parts_of(rec, 36)
        polys: list[list[np.ndarray]] = []
        for r in rings:
            if len(r) < 4:
                continue
            if _ring_is_cw(r) or not polys:
                polys.append([r])
            else:
                polys[-1].append(r)
        if not polys:
            return None
        if len(polys) == 1:
            return "POLYGON(" + ",".join(f"({_seq(r)})" for r in polys[0]) + ")"
        return (
            "MULTIPOLYGON("
            + ",".join("(" + ",".join(f"({_seq(r)})" for r in p) + ")" for p in polys)
            + ")"
        )
    raise ValueError(f"unsupported shape type {shape_type}")


def parse_shp(data: bytes) -> list[tuple[int, str | None]]:
    """.shp bytes -> [(record_number, wkt)]."""
    if struct.unpack_from(">i", data, 0)[0] != _SHP_MAGIC:
        raise ValueError("not a shapefile (.shp)")
    (file_len_words,) = struct.unpack_from(">i", data, 24)
    end = file_len_words * 2
    pos = 100
    out = []
    while pos + 8 <= end:
        rec_no, content_words = struct.unpack_from(">ii", data, pos)
        body = data[pos + 8 : pos + 8 + content_words * 2]
        (shape_type,) = struct.unpack_from("<i", body, 0)
        out.append((rec_no, shp_record_to_wkt(shape_type, body)))
        pos += 8 + content_words * 2
    return out


def parse_dbf(data: bytes) -> pd.DataFrame:
    """.dbf bytes -> attribute frame (C text, N/F numeric, L bool, D date
    as text) — the dBASE III subset shapefiles use."""
    n_recs, header_len, rec_len = struct.unpack_from("<iHH", data, 4)
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    rows = []
    base = header_len
    for r in range(n_recs):
        rec = data[base + r * rec_len : base + (r + 1) * rec_len]
        if not rec or rec[0] == 0x2A:  # deleted
            continue
        vals = []
        off = 1
        for name, ftype, flen in fields:
            raw = rec[off : off + flen].decode("ascii", "replace").strip()
            off += flen
            if ftype in ("N", "F"):
                if raw == "":
                    vals.append(None)
                elif "." in raw or ftype == "F":
                    vals.append(float(raw))
                else:
                    vals.append(int(raw))
            elif ftype == "L":
                vals.append(raw.upper() in ("T", "Y"))
            else:
                vals.append(raw)
        rows.append(vals)
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


def read_shapefile(spark: SparkSession, shp_path_glob: str) -> DataFrame:
    """-> DataFrame(record int, geom_wkt string, source_file string,
    <dbf attribute columns as strings>). One task per .shp file via the
    binaryFile source; the sibling .dbf (same stem) joins positionally
    like mapnik's shape datasource."""
    files = spark.read.format("binaryFile").load(shp_path_glob).select("path", "content")

    def kernel(iterator):
        import os

        for pdf in iterator:
            for path, content in zip(pdf["path"], pdf["content"]):
                recs = parse_shp(bytes(content))
                frame = pd.DataFrame(recs, columns=["record", "geom_wkt"])
                frame["source_file"] = path
                dbf_path = os.path.splitext(path.replace("file:", ""))[0] + ".dbf"
                attrs = None
                if os.path.exists(dbf_path):
                    with open(dbf_path, "rb") as fh:
                        attrs = parse_dbf(fh.read())
                if attrs is not None and len(attrs) == len(frame):
                    frame["attributes"] = [
                        row.to_json() for _, row in attrs.iterrows()
                    ]
                else:
                    frame["attributes"] = None
                yield frame[["record", "geom_wkt", "source_file", "attributes"]]

    return files.mapInPandas(
        kernel,
        schema="record int, geom_wkt string, source_file string, attributes string",
    )
