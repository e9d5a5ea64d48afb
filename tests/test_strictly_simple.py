"""strictly_simple mode — the reference processor's DEFAULT
(src/vector_tile_processor.hpp:61 strictly_simple_(true)): every
polygon routes through the boolean fill resolver (the Wagyu role), not
just the ones the self-intersection check flags. Region output must be
identical to the fast path for simple inputs; the resolver's
canonicalized ring structure is what changes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapnik_vector_tile_spark import tilemath
from mapnik_vector_tile_spark.functions import geometry as G
from mapnik_vector_tile_spark.operators import decode, geom_tiles

BOX = (-128, -128, 4224, 4224)


def _area(rings) -> float:
    a = 0.0
    for r in rings:
        rr = np.vstack([r, r[:1]]).astype(float)
        a += 0.5 * np.sum(rr[:-1, 0] * rr[1:, 1] - rr[:-1, 1] * rr[1:, 0])
    return a


def _rings_of(g):
    if g[0] == "polygon":
        return g[1]
    if g[0] == "multipolygon":
        return [r for p in g[1] for r in p]
    return []


@pytest.mark.parametrize(
    "rings",
    [
        # simple square
        [[(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)]],
        # square with hole
        [[(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)],
         [(20, 20), (20, 40), (40, 40), (40, 20), (20, 20)]],
    ],
)
def test_strict_region_equals_fast_path(rings):
    geom = ("polygon", [np.asarray(r, dtype=np.int64) for r in rings])
    plain = G.clip_geom(geom, BOX)
    strict = G.clip_geom(geom, BOX, strictly_simple=True)
    assert plain[0] != "empty" and strict[0] != "empty"
    assert _area(_rings_of(plain)) == pytest.approx(_area(_rings_of(strict)))


def test_strict_region_equals_fast_path_multipolygon():
    geom = ("multipolygon", [
        [np.array([(0, 0), (50, 0), (50, 50), (0, 50), (0, 0)], dtype=np.int64)],
        [np.array([(200, 200), (260, 200), (260, 260), (200, 260), (200, 200)],
                  dtype=np.int64)],
    ])
    plain = G.clip_geom(geom, BOX)
    strict = G.clip_geom(geom, BOX, strictly_simple=True)
    assert _area(_rings_of(plain)) == pytest.approx(_area(_rings_of(strict)))
    assert abs(_area(_rings_of(strict))) == pytest.approx(50 * 50 + 60 * 60)


def test_strict_resolves_hole_crossing_exterior_like_flagged_path():
    """A hole crossing its exterior: the crossing detector already
    routes this to the resolver, so strict and plain agree exactly —
    strict's difference is only WHICH inputs take the resolver."""
    geom = ("polygon", [
        np.array([(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)], dtype=np.int64),
        np.array([(50, 50), (150, 50), (150, 150), (50, 150), (50, 50)], dtype=np.int64),
    ])
    plain = G.clip_geom(geom, BOX, fill_type="non_zero")
    strict = G.clip_geom(geom, BOX, fill_type="non_zero", strictly_simple=True)
    assert _area(_rings_of(plain)) == pytest.approx(_area(_rings_of(strict)))


def test_build_geom_tiles_strictly_simple(spark):
    """End-to-end: strict tiles paint the same cells and decode to the
    same per-tile feature counts as the default path (both ragged-lane
    force_resolve and the eject lane)."""
    h = tilemath.HALF_OF_EQUATOR
    q = h / 4.0
    rows = [
        ("pg1", f"POLYGON(({q*0.1} {q*0.1},{q*0.9} {q*0.1},{q*0.9} {q*0.9},{q*0.1} {q*0.9},{q*0.1} {q*0.1}))"),
        ("pg2", f"POLYGON(({-q*1.5} {-q*0.5},{-q*0.5} {-q*0.5},{-q*0.5} {q*0.5},{-q*1.5} {q*0.5},{-q*1.5} {-q*0.5}),"
                f"({-q*1.2} {-q*0.2},{-q*1.2} {q*0.2},{-q*0.8} {q*0.2},{-q*0.8} {-q*0.2},{-q*1.2} {-q*0.2}))"),
        ("ln", f"LINESTRING(-{2.5*q} 1000,{2.5*q} 1000)"),
    ]
    geoms = spark.createDataFrame(rows, "gid string, geom_wkt string")
    plain = geom_tiles.build_geom_tiles(geoms, ["gid"], z=3, id_col="gid")
    strict = geom_tiles.build_geom_tiles(
        geoms, ["gid"], z=3, id_col="gid", strictly_simple=True
    )
    p = {(r["x"], r["y"]): r["n_features"] for r in plain.collect() if r["painted"]}
    s = {(r["x"], r["y"]): r["n_features"] for r in strict.collect() if r["painted"]}
    assert p == s and len(p) > 0
    # decoded polygon areas agree per (tile, gid)
    dp = decode.decode_tiles(plain.where(F.col("painted"))).toPandas()
    ds = decode.decode_tiles(strict.where(F.col("painted"))).toPandas()

    def area_map(pdf):
        out = {}
        for _, r in pdf.iterrows():
            if r["geom_type"] != 3:
                continue
            kind, val = G.from_wkt(r["geom_wkt"])
            rings = val if kind == "polygon" else [x for pp in val for x in pp]
            out[(r["x"], r["y"], r["props"]["gid"])] = abs(
                _area([np.asarray(x) for x in rings])
            )
        return out

    ap, as_ = area_map(dp), area_map(ds)
    assert set(ap) == set(as_)
    for k in ap:
        assert ap[k] == pytest.approx(as_[k], rel=1e-9), k


def test_multi_polygon_union_end_to_end(spark):
    """processor.set_multi_polygon_union: overlapping multipolygon parts
    union into one region (area = union, not sum)."""
    h = tilemath.HALF_OF_EQUATOR
    q = h / 4.0
    s = q * 0.4
    x0, y0 = q * 0.1, q * 0.1
    # two squares overlapping by half
    a = f"(({x0} {y0},{x0+s} {y0},{x0+s} {y0+s},{x0} {y0+s},{x0} {y0}))"
    b = f"(({x0+s/2} {y0},{x0+s*1.5} {y0},{x0+s*1.5} {y0+s},{x0+s/2} {y0+s},{x0+s/2} {y0}))"
    geoms = spark.createDataFrame(
        [("mp", f"MULTIPOLYGON({a},{b})")], "gid string, geom_wkt string"
    )

    def decoded_area(tiles):
        pdf = decode.decode_tiles(tiles.where(F.col("painted"))).toPandas()
        tot = 0.0
        for _, r in pdf.iterrows():
            kind, val = G.from_wkt(r["geom_wkt"])
            rings = val if kind == "polygon" else [x for p in val for x in p]
            # exterior + holes carry opposite signs; sum signed areas
            tot += sum(_area([np.asarray(x)]) for x in rings)
        return abs(tot)

    # positive fill, like the reference's union defaults (even_odd would
    # XOR the overlap away — fill-rule semantics, pinned separately)
    plain = geom_tiles.build_geom_tiles(
        geoms, ["gid"], z=3, id_col="gid", fill_type="positive"
    )
    mpu = geom_tiles.build_geom_tiles(
        geoms, ["gid"], z=3, id_col="gid", fill_type="positive",
        multi_polygon_union=True,
    )
    a_plain, a_mpu = decoded_area(plain), decoded_area(mpu)
    # px-space areas: quantization jitter stays well under 1%
    assert a_plain == pytest.approx(2 * s * s, rel=0.01)      # overlap double-counted
    assert a_mpu == pytest.approx(1.5 * s * s, rel=0.01)      # true union


def test_process_all_rings_end_to_end(spark):
    """processor.set_process_all_rings: a degenerate FIRST ring normally
    kills the polygon; with the flag, later rings are still processed."""
    h = tilemath.HALF_OF_EQUATOR
    q = h / 4.0
    s = q * 0.4
    x0, y0 = q * 0.1, q * 0.1
    degen = f"({x0} {y0},{x0} {y0},{x0} {y0})"              # 3 identical pts
    valid = f"({x0} {y0},{x0+s} {y0},{x0+s} {y0+s},{x0} {y0+s},{x0} {y0})"
    geoms = spark.createDataFrame(
        [("pg", f"POLYGON({degen},{valid})")], "gid string, geom_wkt string"
    )
    plain = geom_tiles.build_geom_tiles(geoms, ["gid"], z=3, id_col="gid")
    par = geom_tiles.build_geom_tiles(
        geoms, ["gid"], z=3, id_col="gid", process_all_rings=True
    )
    assert plain.where(F.col("painted")).count() == 0
    assert par.where(F.col("painted")).count() >= 1
