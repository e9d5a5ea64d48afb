"""Real-world geometry corpus through the full tiling pipeline.

Ports the invariant layer of the reference's visual suite
(test/geometry_visual_test.cpp:1-294): every fixture geometry is
processed into tiles, decoded back, and checked for validity /
containment / closure / simplification invariants across a parameter
sample (simplify_distance, buffer) like clip_geometry()'s matrix.
The golden GeoJSON outputs the reference compares against live in an
un-vendored submodule (test/geometry-test-data is empty here), so
spec-level invariants replace golden-file equality.

Fixtures are the REAL-WORLD shapes vendored in the reference's
test/data: the Singapore SVY21 coastline shapefile, the NZ coastline
polylines (NZMG — its bespoke complex-polynomial projection is out of
proj-engine scope, so coordinates are transplanted rigidly into a
mercator window; shapes are untouched), the 182-ring reef multipolygon
poly.geojson, linestrings_and_point.geojson, and the out-of-range
latitude polygon poly-lat-invalid-4269 (coordinate-validity guard)."""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapnik_vector_tile_spark import tilemath
from mapnik_vector_tile_spark.functions import geometry as G, proj
from mapnik_vector_tile_spark.operators import decode, geom_tiles, validity
from mapnik_vector_tile_spark.sources import shapefile as SHP

DATA = "/root/reference/test/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not mounted"
)

# SVY21 (singapore.prj): WGS84 spheroid transverse mercator
_SVY21 = {
    "proj": "tmerc",
    "lat_0": 1.366666666666667,
    "lon_0": 103.8333333333333,
    "k": 1.0,
    "x_0": 28001.642,
    "y_0": 38744.572,
}


def _shp_parts(name: str):
    """[(record_number, shape_type, [part_pts ...])] for a .shp file."""
    data = open(f"{DATA}/{name}.shp", "rb").read()
    pos, out = 100, []
    while pos + 8 <= len(data):
        num, clen = struct.unpack_from(">ii", data, pos)
        rec = data[pos + 8 : pos + 8 + clen * 2]
        st = struct.unpack_from("<i", rec, 0)[0]
        if st % 10 in (3, 5):
            out.append((num, st, SHP._parts_of(rec, 36)))
        pos += 8 + clen * 2
    return out


def _merc_wkt_ring(lon: np.ndarray, lat: np.ndarray) -> str:
    mx, my = tilemath.mercator_np(lon, lat)
    body = ",".join(f"{x!r} {y!r}" for x, y in zip(mx, my))
    return f"POLYGON(({body}))"


def _merc_wkt_line(lon: np.ndarray, lat: np.ndarray) -> str:
    mx, my = tilemath.mercator_np(lon, lat)
    body = ",".join(f"{x!r} {y!r}" for x, y in zip(mx, my))
    return f"LINESTRING({body})"


def _zoom_for(wkt: str, min_z: int = 0, max_z: int = 18) -> int:
    """z where the geometry spans ~1.5 tiles (exercises clipping
    without atomizing the shape)."""
    kind, val = G.from_wkt(wkt)
    if kind == "polygon":
        arr = np.vstack(val)
    elif kind == "linestring":
        arr = np.asarray(val)
    elif kind in ("point", "multipoint"):
        return 6
    else:
        arr = np.vstack([np.vstack(p) if isinstance(p, list) else p for p in val])
    ext = max(arr[:, 0].ptp(), arr[:, 1].ptp(), 1.0)
    equator = 2.0 * tilemath.HALF_OF_EQUATOR
    z = int(np.floor(np.log2(equator / ext * 1.5)))
    return int(np.clip(z, min_z, max_z))


def _load_corpus():
    """[(gid, wkt)] — >=50 real-world geometries in mercator meters."""
    rows: list[tuple[str, str]] = []

    # 1. reef multipolygon: every ring is a real-world polygon outline
    reef = json.load(open(f"{DATA}/poly.geojson"))
    assert reef["type"] == "MultiPolygon"
    for pi, poly in enumerate(reef["coordinates"]):
        for ri, ring in enumerate(poly):
            arr = np.asarray(ring, dtype=np.float64)
            if len(arr) < 4:
                continue
            rows.append((f"reef_{pi}_{ri}", _merc_wkt_ring(arr[:, 0], arr[:, 1])))

    # 2. singapore coastline (SVY21 -> lonlat via the proj engine)
    for num, st, parts in _shp_parts("singapore"):
        for pi, pts in enumerate(parts):
            lon, lat = proj.inverse(_SVY21, pts[:, 0], pts[:, 1])
            rows.append((f"sgp_{num}_{pi}", _merc_wkt_ring(lon, lat)))

    # 3. NZ coastline polylines: rigid transplant of NZMG meters into a
    # mercator window centered on (0,0) — shape preserved exactly
    nz = _shp_parts("NZ_Coastline_NZMG")
    allpts = np.vstack([p for _, _, parts in nz for p in parts])
    cx, cy = allpts[:, 0].mean(), allpts[:, 1].mean()
    for num, st, parts in nz:
        for pi, pts in enumerate(parts):
            body = ",".join(f"{x - cx!r} {y - cy!r}" for x, y in pts)
            rows.append((f"nz_{num}_{pi}", f"LINESTRING({body})"))

    # 4. linestrings_and_point.geojson features
    lp = json.load(open(f"{DATA}/linestrings_and_point.geojson"))
    for fi, feat in enumerate(lp["features"]):
        geom = feat["geometry"]
        arr = np.asarray(geom["coordinates"], dtype=np.float64)
        if geom["type"] == "LineString":
            rows.append((f"lsp_{fi}", _merc_wkt_line(arr[:, 0], arr[:, 1])))
        elif geom["type"] == "Point":
            mx, my = tilemath.mercator_np(arr[:1], arr[1:2] * 0 + arr[1])
            rows.append((f"lsp_{fi}", f"POINT({float(mx[0])!r} {float(my[0])!r})"))
    return rows


@pytest.fixture(scope="module")
def corpus():
    rows = _load_corpus()
    assert len(rows) >= 50, len(rows)
    return rows


def _build_and_decode(spark, rows, **kwargs):
    """Group the corpus by per-geometry zoom; one pipeline run per zoom.
    Returns (tiles_pdf, decoded_pdf) concatenated across zooms."""
    import pandas as pd

    by_z: dict[int, list[tuple[str, str]]] = {}
    for gid, wkt in rows:
        by_z.setdefault(_zoom_for(wkt), []).append((gid, wkt))
    tile_frames, dec_frames = [], []
    for z, grp in sorted(by_z.items()):
        df = spark.createDataFrame(grp, "gid string, geom_wkt string")
        tiles = geom_tiles.build_geom_tiles(
            df, prop_cols=["gid"], z=z, id_col="gid", **kwargs
        ).cache()
        tile_frames.append(tiles.toPandas())
        dec_frames.append(decode.decode_tiles(tiles).toPandas())
        findings, _stats = validity.validate_tiles(tiles.where(F.col("painted")))
        bad = findings.collect()
        assert not bad, (z, bad[:5])
    return pd.concat(tile_frames), pd.concat(dec_frames)


def _ring_arrays(row) -> list[np.ndarray]:
    kind, val = G.from_wkt(row["geom_wkt"])
    if kind == "polygon":
        return [np.asarray(r) for r in val]
    if kind == "multipolygon":
        return [np.asarray(r) for p in val for r in p]
    if kind == "linestring":
        return [np.asarray(val)]
    if kind == "multilinestring":
        return [np.asarray(p) for p in val]
    return [np.asarray([val])]


def test_visual_corpus_roundtrip(spark, corpus):
    tiles, decoded = _build_and_decode(spark, corpus)
    # conservation: every real-world geometry paints at least one tile
    painted_gids = {r["props"]["gid"] for _, r in decoded.iterrows()}
    missing = {gid for gid, _ in corpus} - painted_gids
    assert not missing, sorted(missing)[:10]
    assert len(corpus) >= 50

    for _, row in decoded.iterrows():
        minx, miny, maxx, maxy = tilemath.tile_mercator_bbox_np(
            row["x"], row["y"], row["z"]
        )
        ts = (maxx - minx) / 4096.0  # one quantization step of slack
        for arr in _ring_arrays(row):
            # containment: decoded coordinates stay inside the tile
            assert arr[:, 0].min() >= minx - ts and arr[:, 0].max() <= maxx + ts
            assert arr[:, 1].min() >= miny - ts and arr[:, 1].max() <= maxy + ts
            # closure + U3: no consecutive duplicate vertices survive
            if row["geom_type"] == 3:
                assert np.allclose(arr[0], arr[-1]), row["props"]["gid"]
                core = arr[:-1]
            else:
                core = arr
            if len(core) > 1:
                dup = (np.diff(core, axis=0) == 0).all(axis=1)
                assert not dup.any(), row["props"]["gid"]


def test_visual_corpus_simplify_monotone(spark, corpus):
    """clip_geometry()'s simplify_distance axis: simplified outputs
    shrink (never grow) and every invariant still holds."""
    sample = [r for r in corpus if r[0].startswith(("sgp", "nz"))]
    sample += [r for r in corpus if r[0].startswith("reef")][:8]
    _, plain = _build_and_decode(spark, sample)
    _, simplified = _build_and_decode(spark, sample, simplify_distance=8.0)

    def nverts(pdf):
        return sum(len(a) for _, r in pdf.iterrows() for a in _ring_arrays(r))

    assert nverts(simplified) <= nverts(plain)
    assert {r["props"]["gid"] for _, r in simplified.iterrows()} == {
        r["props"]["gid"] for _, r in plain.iterrows()
    }


def test_visual_corpus_buffered(spark, corpus):
    """clip_geometry()'s buffer axis: a buffered build never paints
    fewer tiles and keeps validity findings empty."""
    sample = [r for r in corpus if r[0].startswith("sgp")]
    sample += [r for r in corpus if r[0].startswith("reef")][:6]
    t0, _ = _build_and_decode(spark, sample)
    t64, _ = _build_and_decode(spark, sample, buffer_px=64)
    assert t64["painted"].sum() >= t0["painted"].sum()


def test_lat_invalid_polygon_guarded(spark):
    """poly-lat-invalid-4269.shp: |lat| up to 92 deg. The P10
    coordinate-validity guard must clamp/drop without failing the job."""
    rows = []
    for num, st, parts in _shp_parts("poly-lat-invalid-4269"):
        for pi, pts in enumerate(parts):
            lat = np.clip(pts[:, 1], -89.9999, 89.9999)  # ingest clamp
            rows.append((f"inv_{num}_{pi}", _merc_wkt_ring(pts[:, 0], lat)))
    assert rows
    df = spark.createDataFrame(rows, "gid string, geom_wkt string")
    tiles = geom_tiles.build_geom_tiles(df, prop_cols=["gid"], z=2, id_col="gid")
    pdf = tiles.toPandas()
    assert pdf["painted"].any()
    findings, _ = validity.validate_tiles(
        spark.createDataFrame(pdf[pdf["painted"]])
    )
    assert findings.count() == 0


def test_visual_corpus_strictly_simple(spark, corpus):
    """clip_geometry()'s strictly_simple axis over real-world shapes:
    the reference's default routes every polygon through the union
    engine; painted cells, per-gid coverage, and validity findings must
    match the fast path."""
    sample = [r for r in corpus if r[0].startswith(("sgp", "reef"))][:40]
    t_plain, d_plain = _build_and_decode(spark, sample)
    t_strict, d_strict = _build_and_decode(
        spark, sample, strictly_simple=True, fill_type="positive"
    )
    cells = lambda t: {(r["z"], r["x"], r["y"]) for _, r in t.iterrows() if r["painted"]}  # noqa: E731
    assert cells(t_strict) == cells(t_plain)
    gids = lambda d: {r["props"]["gid"] for _, r in d.iterrows()}  # noqa: E731
    assert gids(d_strict) == gids(d_plain)


def test_invalid_interior_ring_polygon(spark):
    """invalid-interior-ring.json (vendored real-world invalid input):
    exterior + one valid hole + one interior ring carrying a 1.8e19-
    degree longitude. The P10 coordinate-validity guard must drop the
    garbage vertices without failing the job; the exterior and the
    valid hole survive build->decode->validity with zero findings on
    BOTH the fast path and the strictly_simple union path."""
    d = json.load(open(f"{DATA}/invalid-interior-ring.json"))
    rings = []
    for ring in d["coordinates"]:
        a = np.asarray(ring, dtype=np.float64)
        lat = np.clip(a[:, 1], -85.0511, 85.0511)
        mx, my = tilemath.mercator_np(a[:, 0], lat)
        rings.append(
            "(" + ",".join(f"{float(x)!r} {float(y)!r}" for x, y in zip(mx, my)) + ")"
        )
    wkt = "POLYGON(" + ",".join(rings) + ")"
    df = spark.createDataFrame([("iir_0", wkt)], "gid string, geom_wkt string")
    for kw in ({}, {"strictly_simple": True, "fill_type": "positive"}):
        tiles = geom_tiles.build_geom_tiles(
            df, prop_cols=["gid"], z=2, id_col="gid", **kw
        )
        pdf = tiles.toPandas()
        assert pdf["painted"].any(), kw
        findings, _ = validity.validate_tiles(spark.createDataFrame(pdf[pdf["painted"]]))
        assert findings.count() == 0, kw
        dec = decode.decode_tiles(tiles).toPandas()
        assert set(dec["geom_type"]) == {3}, kw
        # the valid hole must survive in at least one tile
        assert max(r["geom_wkt"].count("(") - 1 for _, r in dec.iterrows()) >= 2, kw


def test_reef_full_polygon_with_181_holes(spark):
    """poly.geojson as ONE feature: a single real-world polygon with
    181 interior rings (max ring 3,251 points) through build -> decode
    -> validity at its natural zoom, fast and strict paths. Exercises
    hole containment and many-ring clipping in one feature — the
    per-ring corpus entries never cover ring interaction."""
    d = json.load(open(f"{DATA}/poly.geojson"))

    def ring_wkt(a):
        a = np.asarray(a, dtype=np.float64)
        mx, my = tilemath.mercator_np(a[:, 0], a[:, 1])
        return "(" + ",".join(f"{float(x)!r} {float(y)!r}" for x, y in zip(mx, my)) + ")"

    poly = d["coordinates"][0]
    assert len(poly) == 182
    wkt = "POLYGON(" + ",".join(ring_wkt(r) for r in poly) + ")"
    df = spark.createDataFrame([("reef_full", wkt)], "gid string, geom_wkt string")
    for kw in ({}, {"strictly_simple": True, "fill_type": "positive"}):
        tiles = geom_tiles.build_geom_tiles(
            df, prop_cols=["gid"], z=8, id_col="gid", **kw
        )
        pdf = tiles.toPandas()
        assert int(pdf["painted"].sum()) == 4, kw
        findings, _ = validity.validate_tiles(spark.createDataFrame(pdf[pdf["painted"]]))
        assert findings.count() == 0, kw
        dec = decode.decode_tiles(tiles).toPandas()
        assert set(dec["geom_type"]) == {3} and len(dec) == 4, kw
        # dozens of holes must survive clipping into each tile
        assert max(r["geom_wkt"].count("(") - 1 for _, r in dec.iterrows()) >= 50, kw
