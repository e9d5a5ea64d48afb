"""Projection goldens — exact values from the reference's
test/vector_tile_projection.cpp:56-108 (z0, z3, z32)."""

from __future__ import annotations

import numpy as np
import pytest

from mapnik_vector_tile_spark import tilemath


GOLDENS = [
    # (x, y, z, minx, miny, maxx, maxy) from test/vector_tile_projection.cpp
    (0, 0, 0, -20037508.342789244, -20037508.342789244, 20037508.342789244, 20037508.342789244),
    (3, 3, 3, -5009377.085697311, 0.0, 0.0, 5009377.085697311),
    (
        2145960701,
        1428172928,
        32,
        -14210.1492817168,
        6711666.7204630710,
        -14210.1399510249,
        6711666.7297937674,
    ),
]


@pytest.mark.parametrize("x,y,z,minx,miny,maxx,maxy", GOLDENS)
def test_tile_mercator_bbox_np(x, y, z, minx, miny, maxx, maxy):
    got = tilemath.tile_mercator_bbox_np(x, y, z)
    np.testing.assert_allclose(got, (minx, miny, maxx, maxy), rtol=0, atol=1e-6)


def test_bbox_sql_matches_np(spark):
    rows = [(x, y, z) for (x, y, z, *_rest) in GOLDENS if z <= 16]
    df = spark.createDataFrame(rows, "x long, y long, z int")
    b = tilemath.tile_bbox_sql("z", "x", "y")
    got = df.selectExpr(
        "x", "y", "z",
        f"{b['minx']} as minx", f"{b['miny']} as miny",
        f"{b['maxx']} as maxx", f"{b['maxy']} as maxy",
    ).collect()
    for row in got:
        exp = tilemath.tile_mercator_bbox_np(row.x, row.y, row.z)
        np.testing.assert_allclose((row.minx, row.miny, row.maxx, row.maxy), exp, atol=1e-9)


def test_lonlat_to_tile_roundtrip_bbox():
    """A point assigned to tile (z,x,y) must lie inside that tile's
    mercator bbox — the consistency the reference gets by construction."""
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-84.9, 84.9, 500)
    for z in (0, 3, 13, 14):
        xt, yt = tilemath.lonlat_to_tile_np(lon, lat, z)
        minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(xt, yt, z)
        mx, my = tilemath.mercator_np(lon, lat)
        eps = 1e-6
        assert (mx >= minx - eps).all() and (mx <= maxx + eps).all()
        assert (my >= miny - eps).all() and (my <= maxy + eps).all()


def test_cols_match_np(spark):
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-85, 85, 200)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    from pyspark.sql import functions as F

    for z in (3, 13):
        xc, yc = tilemath.lonlat_to_tile_cols(F.col("lon"), F.col("lat"), z)
        got = df.select(xc.alias("x"), yc.alias("y")).toPandas()
        xe, ye = tilemath.lonlat_to_tile_np(lon, lat, z)
        np.testing.assert_array_equal(got["x"].to_numpy(), xe)
        np.testing.assert_array_equal(got["y"].to_numpy(), ye)


def test_phash_location_rule(spark):
    phashes = np.array([2**63 - 12345, -(2**62) + 999, 42, -1, 0], dtype=np.int64)
    df = spark.createDataFrame([(int(p),) for p in phashes], "phash long")
    lon_c, lat_c = tilemath.phash_lonlat_cols(df.phash)
    got = df.select(lon_c.alias("lon"), lat_c.alias("lat")).toPandas()
    lon_e, lat_e = tilemath.phash_lonlat_np(phashes)
    np.testing.assert_allclose(got["lon"], lon_e, atol=0)
    np.testing.assert_allclose(got["lat"], lat_e, atol=0)

    hlon_c, hlat_c = tilemath.hotspot_lonlat_cols(df.phash)
    got_h = df.select(hlon_c.alias("lon"), hlat_c.alias("lat")).toPandas()
    hlon_e, hlat_e = tilemath.hotspot_lonlat_np(phashes)
    np.testing.assert_allclose(got_h["lon"], hlon_e, atol=1e-12)
    np.testing.assert_allclose(got_h["lat"], hlat_e, atol=1e-12)


def test_projection_goldens_reference():
    """Ports test/vector_tile_projection.cpp: tile_mercator_bbox literal
    goldens at z0, z3 and the z32 extreme (x=2145960701)."""
    b = tilemath.tile_mercator_bbox_np(0, 0, 0)
    for got, exp in zip(b, (-20037508.342789, -20037508.342789,
                            20037508.342789, 20037508.342789)):
        assert abs(float(got) - exp) < 1e-6

    b = tilemath.tile_mercator_bbox_np(3, 3, 3)
    for got, exp in zip(b, (-5009377.085697311, 0.0, 0.0, 5009377.085697311)):
        assert abs(float(got) - exp) < 1e-8

    b = tilemath.tile_mercator_bbox_np(2145960701, 1428172928, 32)
    for got, exp in zip(b, (-14210.1492817168364127, 6711666.7204630710184574,
                            -14210.1399510249066225, 6711666.7297937674447894)):
        assert abs(float(got) - exp) < 1e-7
