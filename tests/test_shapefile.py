"""Shapefile source (S8): spec-packed fixtures -> WKT rows + dbf attrs."""

from __future__ import annotations

import struct

import numpy as np

from mapnik_vector_tile_spark.functions import geometry as G
from mapnik_vector_tile_spark.sources import shapefile as SHP


def _shp_bytes(records: list[bytes]) -> bytes:
    body = b""
    for i, rec in enumerate(records):
        body += struct.pack(">ii", i + 1, len(rec) // 2) + rec
    total_words = (100 + len(body)) // 2
    header = struct.pack(">i5xi", 9994, 0)[:8]  # magic + unused
    header = struct.pack(">iiiiii", 9994, 0, 0, 0, 0, 0)
    header += struct.pack(">i", total_words)
    header += struct.pack("<ii", 1000, 1)  # version, shape type
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)  # bbox
    assert len(header) == 100
    return header + body


def _point(x, y):
    return struct.pack("<i2d", 1, x, y)


def _polyline(lines):
    pts = np.vstack(lines)
    parts = np.cumsum([0] + [len(l) for l in lines[:-1]]).astype("<i4")
    return (
        struct.pack("<i4d", 3, 0, 0, 0, 0)
        + struct.pack("<ii", len(lines), len(pts))
        + parts.tobytes()
        + pts.astype("<f8").tobytes()
    )


def _polygon(rings):
    pts = np.vstack(rings)
    parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
    return (
        struct.pack("<i4d", 5, 0, 0, 0, 0)
        + struct.pack("<ii", len(rings), len(pts))
        + parts.tobytes()
        + pts.astype("<f8").tobytes()
    )


def _dbf_bytes(rows: list[tuple[str, int]]) -> bytes:
    fields = [("NAME", "C", 10), ("RANK", "N", 8)]
    rec_len = 1 + sum(f[2] for f in fields)
    header_len = 32 + 32 * len(fields) + 1
    out = struct.pack("<B3BiHH20x", 3, 26, 8, 16, len(rows), header_len, rec_len)
    for name, ftype, flen in fields:
        out += name.encode().ljust(11, b"\x00") + ftype.encode()
        out += b"\x00" * 4 + bytes([flen]) + b"\x00" * 15
    out += b"\x0d"
    for name, rank in rows:
        out += b" " + name.ljust(10).encode() + str(rank).rjust(8).encode()
    out += b"\x1a"
    return out


def test_shp_records_parse():
    cw_square = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], float)  # CW (y-up)
    ccw_hole = np.array([[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], float)       # CCW
    records = [
        _point(1.5, 2.5),
        _polyline([np.array([[0, 0], [5, 5]], float), np.array([[6, 6], [9, 9]], float)]),
        _polygon([cw_square, ccw_hole]),
    ]
    parsed = SHP.parse_shp(_shp_bytes(records))
    kinds = [G.from_wkt(w)[0] for _n, w in parsed]
    assert kinds == ["point", "multilinestring", "polygon"]
    poly = G.from_wkt(parsed[2][1])[1]
    assert len(poly) == 2  # exterior + hole


def test_dbf_parse():
    df = SHP.parse_dbf(_dbf_bytes([("alpha", 3), ("beta", 12)]))
    assert list(df.columns) == ["NAME", "RANK"]
    assert df.iloc[0]["NAME"] == "alpha" and df.iloc[1]["RANK"] == 12


def test_read_shapefile_spark(spark, tmp_path):
    records = [_point(1.0, 2.0), _point(3.0, 4.0)]
    (tmp_path / "pts.shp").write_bytes(_shp_bytes(records))
    (tmp_path / "pts.dbf").write_bytes(_dbf_bytes([("a", 1), ("b", 2)]))
    df = SHP.read_shapefile(spark, str(tmp_path / "pts.shp")).toPandas()
    assert len(df) == 2
    assert sorted(df["geom_wkt"]) == ["POINT(1.0 2.0)", "POINT(3.0 4.0)"]
    import json

    attrs = [json.loads(a) for a in df.sort_values("record")["attributes"]]
    assert attrs[0]["NAME"] == "a" and attrs[1]["RANK"] == 2


def test_invalid_latitude_shapefile_clamps_not_throws(spark):
    """Port of 'vector tile transform -- should not throw on coords
    outside merc range' (test/vector_tile.cpp): the reference's
    poly-lat-invalid-4269.shp carries latitudes beyond +/-90; the
    pipeline must CLAMP into mercator range and still paint one polygon
    feature with its FID property — never throw."""
    import os

    import pytest

    path = "/root/reference/test/data/poly-lat-invalid-4269.shp"
    if not os.path.exists(path):
        pytest.skip("reference checkout not mounted")
    from pyspark.sql import functions as F

    from mapnik_vector_tile_spark import tilemath
    from mapnik_vector_tile_spark.operators import decode, geom_tiles
    from mapnik_vector_tile_spark.sources import shapefile as SHP

    import json

    df = SHP.read_shapefile(spark, path).toPandas()
    assert len(df) == 1
    fid = str(json.loads(df.iloc[0]["attributes"])["FID"])
    wkt = df.iloc[0]["geom_wkt"]
    # lon/lat degrees -> clamped mercator via the engine's own transform
    from mapnik_vector_tile_spark.functions import geometry as G
    import numpy as np

    kind, rings = G.from_wkt(wkt)
    assert kind == "polygon"
    lat_min = min(float(r[:, 1].min()) for r in rings)
    assert lat_min < -90.0  # the fixture really is out of range (-92)
    merc_rings = []
    for r in rings:
        mx, my = tilemath.mercator_np(
            np.clip(r[:, 0], -179.999999, 179.999999),
            np.clip(r[:, 1], -89.0, 89.0),
        )
        merc_rings.append(np.column_stack([mx, my]))
    merc_wkt = G.to_wkt(("polygon", merc_rings))
    rows = spark.createDataFrame(
        [(fid, merc_wkt)], "FID string, geom_wkt string"
    )
    tiles = geom_tiles.build_geom_tiles(rows, ["FID"], z=0, id_col="FID")
    tp = tiles.toPandas()
    assert len(tp) == 1 and bool(tp.iloc[0]["painted"])
    dec = decode.decode_tiles(tiles).toPandas()
    assert len(dec) == 1
    assert dec.iloc[0]["geom_type"] == 3
    assert dec.iloc[0]["props"]["FID"] == fid
