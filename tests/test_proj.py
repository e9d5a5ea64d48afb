"""Projection engine (functions.proj) — P3, the reference's
vector_tile_strategy_proj role (src/vector_tile_strategy.hpp:69-104;
reprojection corpus test/unit/processor/reprojection_error.cpp)."""

from __future__ import annotations

import numpy as np
import pytest

from mapnik_vector_tile_spark import tilemath
from mapnik_vector_tile_spark.functions import proj as P


def test_utm_matches_published_value():
    """San Francisco in UTM 10N: published easting/northing ~ (551130,
    4180997) — the Krüger series must land within metres."""
    utm10 = P.parse_proj4("+proj=utm +zone=10 +datum=WGS84")
    x, y = P.forward(utm10, -122.4194, 37.7749)
    assert abs(float(x) - 551130.0) < 50.0
    assert abs(float(y) - 4180997.0) < 50.0


def test_utm_central_meridian_equator():
    utm = P.parse_proj4("+proj=utm +zone=10")
    x, y = P.forward(utm, -123.0, 0.0)
    assert abs(float(x) - 500000.0) < 1e-6 and abs(float(y)) < 1e-6
    # southern hemisphere false northing
    utm_s = P.parse_proj4("+proj=utm +zone=10 +south")
    _, ys = P.forward(utm_s, -123.0, -0.0001)
    assert 9_999_000 < float(ys) < 10_000_000


@pytest.mark.parametrize("crs_s", [
    "+proj=utm +zone=33", "+init=epsg:3857", "+init=epsg:3395",
    "+proj=tmerc +lon_0=9 +k=1 +x_0=3500000",
])
def test_roundtrip_exactness(crs_s):
    crs = P.parse_proj4(crs_s)
    rng = np.random.RandomState(11)
    lon = rng.uniform(6.0, 12.0, 200)
    lat = rng.uniform(-80.0, 80.0, 200)
    x, y = P.forward(crs, lon, lat)
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_web_mercator_bit_equal_to_tilemath():
    lon = np.linspace(-179.0, 179.0, 101)
    lat = np.linspace(-84.0, 84.0, 101)
    mx, my = tilemath.mercator_np(lon, lat)
    px, py = P.forward(P.parse_proj4("+init=epsg:3857"), lon, lat)
    assert np.array_equal(mx, px) and np.array_equal(my, py)


def test_utm_scale_factor_at_central_meridian():
    """The defining k0 = 0.9996 at the central meridian."""
    utm = P.parse_proj4("+proj=utm +zone=31")
    lat = 45.0
    d = 1e-4  # degrees of latitude
    x0, y0 = P.forward(utm, 3.0, lat)
    x1, y1 = P.forward(utm, 3.0, lat + d)
    # meridian arc distance for d degrees of latitude at 45N (WGS84)
    phi = np.radians(lat)
    m = (
        P.WGS84_A * (1 - P.WGS84_E2)
        / (1 - P.WGS84_E2 * np.sin(phi) ** 2) ** 1.5
        * np.radians(d)
    )
    k = float(y1 - y0) / float(m)
    assert abs(k - 0.9996) < 1e-5


def test_reproject_geoms_operator(spark):
    from mapnik_vector_tile_spark.functions import geometry as G
    from mapnik_vector_tile_spark.operators import geom_tiles as GT

    rows = [
        ("a", "POINT(-122.4194 37.7749)"),
        ("b", "LINESTRING(-122 37,-121 38)"),
        ("c", "POLYGON((-122 37,-121 37,-121 38,-122 37))"),
    ]
    df = spark.createDataFrame(rows, "gid string, geom_wkt string")
    out = GT.reproject_geoms(df, "+init=epsg:4326", "+init=epsg:3857").toPandas()
    pt = G.from_wkt(out[out["gid"] == "a"].iloc[0]["geom_wkt"])[1]
    mx, my = tilemath.mercator_np(-122.4194, 37.7749)
    # WKT text keeps ~mm precision in mercator metres
    assert abs(pt[0] - float(mx)) < 1e-2 and abs(pt[1] - float(my)) < 1e-2
    # UTM source -> mercator end-to-end
    utm = P.parse_proj4("+proj=utm +zone=10")
    ux, uy = P.forward(utm, -122.4194, 37.7749)
    df2 = spark.createDataFrame(
        [("u", f"POINT({float(ux)} {float(uy)})")], "gid string, geom_wkt string"
    )
    out2 = GT.reproject_geoms(df2, "+proj=utm +zone=10", "+init=epsg:3857").toPandas()
    pt2 = G.from_wkt(out2.iloc[0]["geom_wkt"])[1]
    assert abs(pt2[0] - float(mx)) < 1e-2 and abs(pt2[1] - float(my)) < 1e-2


def test_bare_merc_defaults_ellipsoidal():
    """ADVICE r2: proj4 '+proj=merc' with no ellipsoid hints means the
    WGS84 ELLIPSOID (EPSG:3395-like), not spherical web mercator."""
    assert P.parse_proj4("+proj=merc")["spherical"] is False
    assert P.parse_proj4("+proj=merc +ellps=WGS84")["spherical"] is False
    # explicit spherical forms stay spherical
    assert P.parse_proj4("+proj=merc +a=6378137 +b=6378137")["spherical"] is True
    assert P.parse_proj4(
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0.0 +lon_0=0.0 +x_0=0.0 "
        "+y_0=0.0 +k=1.0 +units=m +nadgrids=@null +wktext +no_defs +over"
    )["spherical"] is True
    assert P.parse_proj4("+init=epsg:3857")["spherical"] is True
    # the ~20km check: at lat 45 the spherical/ellipsoidal northing gap is big
    import numpy as np
    _, ys = P._merc_fwd(np.array([0.0]), np.array([45.0]), spherical=True)
    _, ye = P._merc_fwd(np.array([0.0]), np.array([45.0]), spherical=False)
    assert abs(ys[0] - ye[0]) > 15000


def test_reproject_gpack_mode_matches_wkt_mode(spark):
    """emit='gpack' (pipeline form — no WKT ever formatted) must build
    byte-identical tiles to the emit='wkt' path."""
    import numpy as np

    from mapnik_vector_tile_spark.operators import geom_tiles as GT

    rng = np.random.default_rng(9)
    rows = []
    for i in range(60):
        # UTM zone 10 coords around the reference point
        x0 = 540000.0 + float(rng.uniform(-5e4, 5e4))
        y0 = 4180000.0 + float(rng.uniform(-5e4, 5e4))
        s = float(rng.uniform(100, 5000))
        if i % 2:
            w = f"LINESTRING({x0} {y0},{x0 + s} {y0 + s},{x0 + 2 * s} {y0})"
        else:
            w = (f"POLYGON(({x0} {y0},{x0 + s} {y0},{x0 + s} {y0 + s},"
                 f"{x0} {y0 + s},{x0} {y0}))")
        rows.append((f"g{i:03d}", w))
    df = spark.createDataFrame(rows, "gid string, geom_wkt string")
    via_wkt = GT.build_geom_tiles(
        GT.reproject_geoms(df, "+proj=utm +zone=10", emit="wkt"),
        ["gid"], z=8, id_col="gid",
    ).toPandas().sort_values(["x", "y"]).reset_index(drop=True)
    via_gpk = GT.build_geom_tiles(
        GT.reproject_geoms(df, "+proj=utm +zone=10", emit="gpack"),
        ["gid"], z=8, id_col="gid",
    ).toPandas().sort_values(["x", "y"]).reset_index(drop=True)
    assert len(via_wkt) == len(via_gpk) > 0
    for a, b in zip(via_wkt.itertuples(), via_gpk.itertuples()):
        assert (a.z, a.x, a.y) == (b.z, b.x, b.y)
        assert a.n_features == b.n_features
        assert bytes(a.tile) == bytes(b.tile)


def test_reproject_accepts_gpack_input(spark):
    """A _gpk-bearing DataFrame reprojects without any WKT column."""
    import numpy as np

    from mapnik_vector_tile_spark.functions import geometry as G
    from mapnik_vector_tile_spark.operators import geom_tiles as GT

    pts = [("a", -122.4194, 37.7749), ("b", -121.0, 38.0)]
    rows = [(g, bytearray(G.gpack(("point", np.array([x, y]))))) for g, x, y in pts]
    df = spark.createDataFrame(rows, "gid string, _gpk binary")
    out = GT.reproject_geoms(
        df, "+init=epsg:4326", emit="gpack"
    ).toPandas().sort_values("gid")
    for (gid, lon, lat), (_, r) in zip(pts, out.iterrows()):
        mx, my = tilemath.mercator_np(lon, lat)
        k, v = G.gunpack(bytes(r["_gpk"]))
        assert k == "point"
        assert abs(v[0] - float(mx)) < 1e-6 and abs(v[1] - float(my)) < 1e-6
        assert abs(r["env_minx"] - float(mx)) < 1e-6


def test_reproject_gpack_input_with_envelope_columns(spark):
    """Input already carrying env_* columns (decode_tiles_gpack output or
    a prior gpack reprojection) must not double-declare them in the
    result schema (r4 advisor repro: RESULT_COLUMN_SCHEMA_MISMATCH)."""
    import numpy as np

    from mapnik_vector_tile_spark.functions import geometry as G
    from mapnik_vector_tile_spark.operators import geom_tiles as GT

    pts = [("a", -122.4194, 37.7749), ("b", -121.0, 38.0)]
    rows = [
        (g, bytearray(G.gpack(("point", np.array([x, y])))), x, y, x, y)
        for g, x, y in pts
    ]
    df = spark.createDataFrame(
        rows,
        "gid string, _gpk binary, env_minx double, env_miny double, "
        "env_maxx double, env_maxy double",
    )
    out = GT.reproject_geoms(df, "+init=epsg:4326", emit="gpack")
    # each env_* declared exactly once, recomputed in mercator
    assert sorted(out.columns) == sorted(
        ["gid", "_gpk", "env_minx", "env_miny", "env_maxx", "env_maxy"]
    )
    pdf = out.toPandas().sort_values("gid")
    for (gid, lon, lat), (_, r) in zip(pts, pdf.iterrows()):
        mx, my = tilemath.mercator_np(lon, lat)
        assert abs(r["env_minx"] - float(mx)) < 1e-6
        assert abs(r["env_miny"] - float(my)) < 1e-6
    # double-reprojection chain: gpack output feeds reproject again
    back = GT.reproject_geoms(
        out, "+init=epsg:3857", "+init=epsg:4326", emit="gpack"
    ).toPandas().sort_values("gid")
    for (gid, lon, lat), (_, r) in zip(pts, back.iterrows()):
        assert abs(r["env_minx"] - lon) < 1e-9
        assert abs(r["env_miny"] - lat) < 1e-9


def test_build_geom_tiles_rejects_stray_tile_key_columns(spark):
    """A passthrough column named z/x/y/tile not listed in prop_cols
    must raise instead of being silently clobbered (r4 advisor)."""
    import pytest

    from mapnik_vector_tile_spark.operators import geom_tiles as GT

    df = spark.createDataFrame(
        [("g0", "POINT(0 0)", 7)], "gid string, geom_wkt string, z int"
    )
    with pytest.raises(ValueError, match="collide with the tile-key"):
        GT.build_geom_tiles(df, ["gid"], z=3)


# ---------------------------------------------------------------------------
# lcc + polar stereographic + datum shifts (round 4 — strategy.hpp:69-104
# accepts any proj4 CRS; these are the national-grid families after UTM)
# ---------------------------------------------------------------------------

def test_lcc_snyder_worked_example():
    """Snyder (USGS PP 1395) p.296: Clarke 1866, lat_1=33 lat_2=45
    lat_0=23 lon_0=-96, point (35N, 75W) -> x=1894410.9 y=1564649.5."""
    lcc = P.parse_proj4("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +ellps=clrk66")
    x, y = P.forward(lcc, -75.0, 35.0)
    assert abs(float(x) - 1894410.9) < 0.5
    assert abs(float(y) - 1564649.5) < 0.5
    lon, lat = P.inverse(lcc, x, y)
    assert abs(float(lon) + 75.0) < 1e-9 and abs(float(lat) - 35.0) < 1e-9


def test_lcc_scale_unity_at_standard_parallels():
    import numpy as np

    lcc = P.parse_proj4(
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
        "+x_0=700000 +y_0=6600000 +ellps=GRS80"  # Lambert-93 (EPSG:2154)
    )
    # origin maps to the false origin
    x, y = P.forward(lcc, 3.0, 46.5)
    assert abs(float(x) - 700000.0) < 1e-6 and abs(float(y) - 6600000.0) < 1e-6
    # meridional scale factor is exactly 1 on both standard parallels
    for lat0 in (49.0, 44.0):
        d = 1e-5
        x0, y0 = P.forward(lcc, 3.0, lat0)
        x1, y1 = P.forward(lcc, 3.0, lat0 + d)
        phi = np.radians(lat0)
        m = (lcc["a"] * (1 - lcc["e2"])
             / (1 - lcc["e2"] * np.sin(phi) ** 2) ** 1.5 * np.radians(d))
        assert abs(float(y1 - y0) / float(m) - 1.0) < 1e-6


def test_stere_snyder_worked_example():
    """Snyder p.314-315: International ellipsoid, south polar aspect,
    lat_ts=-71 lon_0=-100, point (75S, 150E) -> x=-1540033.6 y=-560526.4."""
    st = P.parse_proj4("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=-100 +ellps=intl")
    x, y = P.forward(st, 150.0, -75.0)
    assert abs(float(x) + 1540033.6) < 0.5
    assert abs(float(y) + 560526.4) < 0.5
    lon, lat = P.inverse(st, x, y)
    assert abs(float(lon) - 150.0) < 1e-9 and abs(float(lat) + 75.0) < 1e-9


def test_stere_north_polar_roundtrip_and_pole():
    import numpy as np

    # NSIDC Sea Ice Polar Stereographic North (EPSG:3413 parameters)
    st = P.parse_proj4(
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +ellps=WGS84"
    )
    x, y = P.forward(st, 0.0, 90.0)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6  # pole -> origin
    lons = np.array([-135.0, -45.0, 0.0, 60.0, 179.0])
    lats = np.array([60.0, 70.0, 75.0, 82.0, 89.0])
    X, Y = P.forward(st, lons, lats)
    lon2, lat2 = P.inverse(st, X, Y)
    assert np.allclose(lon2, lons, atol=1e-9)
    assert np.allclose(lat2, lats, atol=1e-9)
    # scale is exactly 1 on the lat_ts parallel (finite difference along
    # the meridian through lon_0)
    d = 1e-5
    x0, y0 = P.forward(st, -45.0, 70.0)
    x1, y1 = P.forward(st, -45.0, 70.0 + d)
    phi = np.radians(70.0)
    m = (st["a"] * (1 - st["e2"])
         / (1 - st["e2"] * np.sin(phi) ** 2) ** 1.5 * np.radians(d))
    assert abs(np.hypot(float(x1 - x0), float(y1 - y0)) / float(m) - 1.0) < 1e-6


def test_towgs84_datum_shift():
    import numpy as np

    # identity shift is a no-op
    a = P.parse_proj4("+proj=longlat +ellps=WGS84 +towgs84=0,0,0")
    b = P.parse_proj4("+proj=longlat +ellps=WGS84")
    lon, lat = P.transform(a, b, np.array([12.5]), np.array([47.25]))
    assert abs(float(lon[0]) - 12.5) < 1e-12 and abs(float(lat[0]) - 47.25) < 1e-12
    # at (0,0) a +dx shift is purely radial (height): lon/lat unchanged
    src = P.parse_proj4("+proj=longlat +ellps=WGS84 +towgs84=100,0,0")
    lon0, lat0 = P.transform(src, b, np.array([0.0]), np.array([0.0]))
    assert abs(float(lon0[0])) < 1e-9 and abs(float(lat0[0])) < 1e-9
    # a +dy shift at (0,0) is tangential east: dlon = atan(dy/a)
    src = P.parse_proj4("+proj=longlat +ellps=WGS84 +towgs84=0,100,0")
    lon0, lat0 = P.transform(src, b, np.array([0.0]), np.array([0.0]))
    expect = float(np.degrees(np.arctan2(100.0, P.WGS84_A)))
    assert abs(float(lon0[0]) - expect) < 1e-9 and abs(float(lat0[0])) < 1e-9
    # ED50 (intl) -> WGS84 with the standard 3-param set moves points by
    # an arcsecond-scale amount in the right direction (west/south in
    # central Europe), and the inverse direction round-trips
    ed50 = P.parse_proj4("+proj=longlat +ellps=intl +towgs84=-87,-98,-121")
    lon1, lat1 = P.transform(ed50, b, np.array([10.0]), np.array([50.0]))
    assert 0.0005 < 10.0 - float(lon1[0]) < 0.0025   # ~ -4 arcsec
    assert 0.0005 < 50.0 - float(lat1[0]) < 0.0025
    # 2D round-trip: the ellipsoidal height the shift induces is dropped
    # between legs, so closure is ~mm, not exact
    lon2, lat2 = P.transform(b, ed50, lon1, lat1)
    assert abs(float(lon2[0]) - 10.0) < 1e-7 and abs(float(lat2[0]) - 50.0) < 1e-7


def test_seven_param_helmert_rotation_scale():
    import numpy as np

    # position-vector convention: +rz rotates X toward Y; +s scales ppm.
    # 1 arcsec = 4.848e-6 rad (realistic datum rotations are this scale;
    # the linearized inverse closes to O(theta^2) ~ 0.15 mm here)
    arcsec = 1.0
    theta = arcsec * np.pi / 648000.0
    X, Y, Z = P._helmert(P.WGS84_A, 0.0, 0.0, (0, 0, 0, 0, 0, arcsec, 0))
    assert abs(Y - P.WGS84_A * theta) < 1e-6
    X2, Y2, Z2 = P._helmert(X, Y, Z, (0, 0, 0, 0, 0, arcsec, 0), inverse=True)
    assert abs(X2 - P.WGS84_A) < 1e-3 and abs(Y2) < 1e-3
    X3, _, _ = P._helmert(1000.0, 0.0, 0.0, (0, 0, 0, 0, 0, 0, 10.0))
    assert abs(X3 - 1000.0 * (1 + 10e-6)) < 1e-12


def test_tmerc_parameterized_ellipsoids():
    """tmerc/UTM on national ellipsoids (r4): the Krüger series is now
    computed per (a, e2). Checks: sphere-limit closed form (n=0 makes
    the series collapse to the exact spherical transverse mercator),
    OSGB36-parameter (airy) round-trip + declared k0 on the central
    meridian, bessel round-trip."""
    # 1. sphere limit: closed-form spherical TM
    R = 6370000.0
    sph = P.parse_proj4(f"+proj=tmerc +lon_0=0 +k=1 +a={R} +b={R}")
    lon = np.array([3.0, -6.0, 1.5])
    lat = np.array([45.0, 52.0, -33.0])
    x, y = P.forward(sph, lon, lat)
    lam, phi = np.radians(lon), np.radians(lat)
    b = np.cos(phi) * np.sin(lam)
    x_exact = R * np.arctanh(b)
    y_exact = R * np.arctan2(np.tan(phi), np.cos(lam))
    assert np.allclose(x, x_exact, atol=1e-6)
    assert np.allclose(y, y_exact, atol=1e-6)
    # 2. OSGB36 National Grid parameters (EPSG:27700, airy)
    osgb = P.parse_proj4(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +ellps=airy"
    )
    assert abs(osgb["a"] - 6377563.396) < 1e-6
    # true origin maps to the false origin
    x0, y0 = P.forward(osgb, -2.0, 49.0)
    assert abs(float(x0) - 400000.0) < 1e-6
    assert abs(float(y0) + 100000.0) < 1e-6
    # scale on the central meridian equals the declared k0
    d = 1e-5
    xa, ya = P.forward(osgb, -2.0, 52.0)
    xb, yb = P.forward(osgb, -2.0, 52.0 + d)
    phi0 = np.radians(52.0)
    m = (osgb["a"] * (1 - osgb["e2"])
         / (1 - osgb["e2"] * np.sin(phi0) ** 2) ** 1.5 * np.radians(d))
    assert abs(float(yb - ya) / float(m) - 0.9996012717) < 1e-8
    # round-trips across Britain
    rng = np.random.RandomState(3)
    lon = rng.uniform(-7.0, 2.0, 100)
    lat = rng.uniform(50.0, 59.0, 100)
    X, Y = P.forward(osgb, lon, lat)
    lon2, lat2 = P.inverse(osgb, X, Y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # 3. bessel (Gauss-Krüger style) round-trip
    gk = P.parse_proj4("+proj=tmerc +lon_0=9 +k=1 +x_0=3500000 +ellps=bessel")
    X, Y = P.forward(gk, np.array([9.5]), np.array([48.5]))
    lon2, lat2 = P.inverse(gk, X, Y)
    assert abs(float(lon2[0]) - 9.5) < 1e-9 and abs(float(lat2[0]) - 48.5) < 1e-9


def test_osgb_datum_shift_magnitude():
    """EPSG:27700's official +towgs84 7-param set moves a Britain point
    by the well-known ~100-120 m ground distance vs raw WGS84."""
    osgb_ll = P.parse_proj4(
        "+proj=longlat +ellps=airy "
        "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489"
    )
    wgs = P.parse_proj4("+proj=longlat +ellps=WGS84")
    lon, lat = P.transform(osgb_ll, wgs, np.array([-2.0]), np.array([52.0]))
    dlon = float(lon[0]) + 2.0
    dlat = float(lat[0]) - 52.0
    ground_m = np.hypot(dlon * 111320.0 * np.cos(np.radians(52.0)),
                        dlat * 110574.0)
    assert 80.0 < ground_m < 160.0


# ---------------------------------------------------------------------------
# oblique / equatorial stereographic (round 5 — closes the proj.py stere
# guard; strategy.hpp:69-104 accepts any +proj=stere aspect). Pinned by an
# INDEPENDENT derivation instead of a memorized worked example (no network):
# a conformal-aspect azimuthal projection must place every point at radius
# 2*R'*tan(c/2) and bearing alpha from the center on the conformal sphere,
# with (c, alpha, chi) computed here by plain spherical trigonometry and the
# isometric-latitude form of the conformal latitude — no code shared with
# the implementation's Snyder 21-24..21-27 formulas.
# ---------------------------------------------------------------------------

def _chi_isometric(phi: float, e: float) -> float:
    """Conformal latitude via the isometric-latitude identity
    chi = gd(psi), psi = asinh(tan phi) - e atanh(e sin phi)."""
    import math

    psi = math.asinh(math.tan(phi)) - e * math.atanh(e * math.sin(phi))
    return 2.0 * math.atan(math.exp(psi)) - math.pi / 2.0


def _stere_trig_oracle(crs_str: str, lon: float, lat: float):
    import math

    crs = P.parse_proj4(crs_str)
    e = math.sqrt(crs["e2"])
    phi1 = math.radians(crs["lat_0"])
    chi1 = _chi_isometric(phi1, e) if abs(phi1) > 0 else 0.0
    chi = _chi_isometric(math.radians(lat), e)
    dlam = math.radians(lon - crs["lon_0"])
    # spherical trig on the conformal sphere: distance + initial bearing
    c = math.acos(
        min(1.0, max(-1.0,
            math.sin(chi1) * math.sin(chi)
            + math.cos(chi1) * math.cos(chi) * math.cos(dlam)))
    )
    alpha = math.atan2(
        math.sin(dlam) * math.cos(chi),
        math.cos(chi1) * math.sin(chi)
        - math.sin(chi1) * math.cos(chi) * math.cos(dlam),
    )
    m1 = math.cos(phi1) / math.sqrt(1.0 - crs["e2"] * math.sin(phi1) ** 2)
    r_eff = crs["a"] * crs["k"] * m1 / math.cos(chi1)
    r = 2.0 * r_eff * math.tan(c / 2.0)
    return crs["x_0"] + r * math.sin(alpha), crs["y_0"] + r * math.cos(alpha)


def test_oblique_stere_matches_trig_oracle():
    crs = "+proj=stere +lat_0=52.5 +lon_0=10 +k=0.9997 +x_0=30000 +y_0=-20000 +ellps=intl"
    rng = np.random.default_rng(5)
    lons = rng.uniform(-30.0, 50.0, 40)
    lats = rng.uniform(20.0, 80.0, 40)
    x, y = P.forward(P.parse_proj4(crs), lons, lats)
    for i in range(len(lons)):
        ex, ey = _stere_trig_oracle(crs, float(lons[i]), float(lats[i]))
        assert abs(x[i] - ex) < 1e-5, (lons[i], lats[i])
        assert abs(y[i] - ey) < 1e-5


def test_equatorial_stere_matches_trig_oracle_and_symmetry():
    crs = "+proj=stere +lat_0=0 +lon_0=-60 +k=0.994 +ellps=WGS84"
    pc = P.parse_proj4(crs)
    rng = np.random.default_rng(7)
    lons = rng.uniform(-120.0, 0.0, 25)
    lats = rng.uniform(-70.0, 70.0, 25)
    x, y = P.forward(pc, lons, lats)
    for i in range(len(lons)):
        ex, ey = _stere_trig_oracle(crs, float(lons[i]), float(lats[i]))
        assert abs(x[i] - ex) < 1e-5 and abs(y[i] - ey) < 1e-5
    # hemispheric symmetry: mirroring latitude mirrors y, keeps x
    xm, ym = P.forward(pc, lons, -lats)
    np.testing.assert_allclose(xm, x, rtol=0, atol=1e-6)
    np.testing.assert_allclose(ym, -y, rtol=0, atol=1e-6)


def test_oblique_stere_sphere_exact_identity():
    """On a sphere (a=b) chi == phi and r == 2 R k0 tan(c/2) exactly."""
    import math

    crs = "+proj=stere +lat_0=40 +lon_0=-100 +k=1 +a=6370997 +b=6370997"
    pc = P.parse_proj4(crs)
    assert pc["e2"] == 0.0
    lon, lat = -75.0, 30.0
    x, y = P.forward(pc, np.asarray([lon]), np.asarray([lat]))
    ex, ey = _stere_trig_oracle(crs, lon, lat)
    assert abs(float(x[0]) - ex) < 1e-7
    assert abs(float(y[0]) - ey) < 1e-7
    # center maps to origin, scale k0 at center (numeric Jacobian)
    x0, y0 = P.forward(pc, np.asarray([-100.0]), np.asarray([40.0]))
    assert abs(float(x0[0])) < 1e-9 and abs(float(y0[0])) < 1e-9
    d = 1e-7
    xe, _ = P.forward(pc, np.asarray([-100.0 + d]), np.asarray([40.0]))
    k_num = float(xe[0]) / (
        6370997.0 * math.radians(d) * math.cos(math.radians(40.0))
    )
    assert abs(k_num - 1.0) < 1e-6


def test_oblique_stere_roundtrip_and_transform():
    crs = P.parse_proj4("+proj=stere +lat_0=-35 +lon_0=140 +k=0.9998 +ellps=GRS80")
    rng = np.random.default_rng(3)
    lons = rng.uniform(100.0, 180.0, 50)
    lats = rng.uniform(-75.0, 5.0, 50)
    x, y = P.forward(crs, lons, lats)
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lons, rtol=0, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, rtol=0, atol=1e-9)
    # through transform() into web mercator and back
    mx, my = P.transform(crs, "+init=epsg:3857", x, y)
    x3, y3 = P.transform("+init=epsg:3857", crs, mx, my)
    np.testing.assert_allclose(x3, x, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y3, y, rtol=0, atol=1e-6)


def test_oblique_stere_continuity_with_polar():
    """lat_0 -> 90 limit agrees with the polar-aspect implementation."""
    ob = P.parse_proj4("+proj=stere +lat_0=89.9999 +lon_0=-45 +k=0.994 +ellps=WGS84")
    po = P.parse_proj4("+proj=stere +lat_0=90 +lon_0=-45 +k=0.994 +ellps=WGS84")
    lons = np.asarray([-100.0, 0.0, 77.0])
    lats = np.asarray([70.0, 80.0, 60.0])
    xo, yo = P.forward(ob, lons, lats)
    xp, yp = P.forward(po, lons, lats)
    # 1e-4 deg of center offset -> ~11 m; agreement inside ~3x that
    np.testing.assert_allclose(xo, xp, rtol=0, atol=40.0)
    np.testing.assert_allclose(yo, yp, rtol=0, atol=40.0)


# ---------------------------------------------------------------------------
# geometry-collection gpack (round 5 — closes the geom_tiles gpack guard:
# collections now pack as a nested tree header with every coordinate
# contiguous at the tail, so the parse-once reprojection lane covers the
# full mapnik geometry variant, src/vector_tile_strategy.hpp:69-104 +
# vector_tile_geometry_encoder visitor over geometry<T> incl. collections)
# ---------------------------------------------------------------------------

_GC_WKT = (
    "GEOMETRYCOLLECTION(POINT(540000 4180000),"
    "LINESTRING(540100 4180100,541000 4181000),"
    "POLYGON((540000 4180000,542000 4180000,542000 4182000,540000 4180000)),"
    "GEOMETRYCOLLECTION(POINT(541000 4180500),"
    "MULTIPOLYGON(((540000 4180000,541000 4180000,541000 4181000,540000 4180000)),"
    "((543000 4183000,544000 4183000,544000 4184000,543000 4183000)))))"
)


def test_gpack_roundtrip_geometrycollection():
    from mapnik_vector_tile_spark.functions import geometry as G

    g = G.from_wkt(_GC_WKT)
    assert g[0] == "geometrycollection"
    pk = G.gpack(g)
    assert pk[0] == G._GP_COLLECTION
    g2 = G.gunpack(pk)
    assert G.to_wkt(g2) == G.to_wkt(g)  # nesting structure preserved
    # coords contiguous at the tail — the reproject patch invariant
    coff = int.from_bytes(pk[5:9], "little")
    total = int.from_bytes(pk[1:5], "little")
    assert len(pk) == coff + 16 * total


def test_reproject_gpack_handles_collections(spark):
    """emit='gpack' now accepts collections; the reprojected collection
    round-trips through the pack and matches the WKT-lane output."""
    from mapnik_vector_tile_spark.functions import geometry as G
    from mapnik_vector_tile_spark.operators import geom_tiles as GT

    df = spark.createDataFrame(
        [("gc", _GC_WKT), ("ln", "LINESTRING(540000 4180000,541000 4181000)")],
        "gid string, geom_wkt string",
    )
    via_wkt = GT.reproject_geoms(
        df, "+proj=utm +zone=10", emit="wkt"
    ).toPandas().set_index("gid")
    via_gpk = GT.reproject_geoms(
        df, "+proj=utm +zone=10", emit="gpack"
    ).toPandas().set_index("gid")
    for gid in ("gc", "ln"):
        gw = G.from_wkt(via_wkt.loc[gid, "geom_wkt"])
        gp = G.gunpack(bytes(via_gpk.loc[gid, "_gpk"]))
        assert G.to_wkt(gw) == G.to_wkt(gp)
    # envelope covers every member of the collection
    env = via_gpk.loc["gc"]
    gw = G.from_wkt(via_wkt.loc["gc", "geom_wkt"])

    def _all_coords(geom):
        k, v = geom
        if k == "point":
            return [np.atleast_2d(v)]
        if k in ("multipoint", "linestring"):
            return [np.atleast_2d(v)]
        if k in ("multilinestring", "polygon"):
            return [np.atleast_2d(r) for r in v]
        if k == "multipolygon":
            return [np.atleast_2d(r) for p in v for r in p]
        return [c for m in v for c in _all_coords(m)]

    allc = np.vstack(_all_coords(gw))
    # WKT text keeps ~10 significant digits -> mm-level comparison
    assert abs(env["env_minx"] - allc[:, 0].min()) < 1e-2
    assert abs(env["env_maxy"] - allc[:, 1].max()) < 1e-2


def test_build_geom_tiles_from_collection_gpack(spark):
    """A collection feature tiles identically whether it arrives as WKT
    or as a gpack (both encode lanes end in the scalar collection path)."""
    from mapnik_vector_tile_spark.operators import geom_tiles as GT

    half = 2.0037508342789244e7
    wkt = (
        f"GEOMETRYCOLLECTION(POINT({half/8} {half/8}),"
        f"LINESTRING(0 0,{half/4} {half/4}),"
        f"POLYGON((0 0,{half/4} 0,{half/4} {half/4},0 0)))"
    )
    df = spark.createDataFrame([("gc0", wkt)], "gid string, geom_wkt string")
    via_wkt = GT.build_geom_tiles(df, ["gid"], z=2, id_col="gid").toPandas()
    merc = GT.reproject_geoms(df, "+init=epsg:3857", emit="gpack")
    via_gpk = GT.build_geom_tiles(merc, ["gid"], z=2, id_col="gid").toPandas()
    a = via_wkt.sort_values(["x", "y"]).reset_index(drop=True)
    b = via_gpk.sort_values(["x", "y"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a.itertuples(), b.itertuples()):
        assert (ra.z, ra.x, ra.y, ra.n_features) == (rb.z, rb.x, rb.y, rb.n_features)
        assert bytes(ra.tile) == bytes(rb.tile)


# ---------------------------------------------------------------------------
# aeqd (round 5 — azimuthal equidistant, Snyder ch. 25 + Vincenty 1975
# geodesics for the ellipsoidal oblique aspect). Oracles are independent
# derivations: a numeric-quadrature meridian arc, the exact spherical
# closed form, and geodesic defining properties (fwd/inv duality,
# equidistance along radial lines).
# ---------------------------------------------------------------------------

def test_aeqd_sphere_exact():
    """Sphere: r == R*c exactly (the defining property), azimuth from
    spherical trig — computed here independently."""
    import math

    crs = P.parse_proj4("+proj=aeqd +lat_0=40 +lon_0=-100 +a=6370997 +b=6370997")
    R = 6370997.0
    rng = np.random.default_rng(2)
    lons = rng.uniform(-170.0, -30.0, 30)
    lats = rng.uniform(-40.0, 85.0, 30)
    x, y = P.forward(crs, lons, lats)
    p1 = (math.radians(40.0), math.radians(-100.0))
    for i in range(len(lons)):
        p2 = (math.radians(float(lats[i])), math.radians(float(lons[i])))
        dl = p2[1] - p1[1]
        c = math.acos(
            min(1.0, max(-1.0,
                math.sin(p1[0]) * math.sin(p2[0])
                + math.cos(p1[0]) * math.cos(p2[0]) * math.cos(dl)))
        )
        az = math.atan2(
            math.sin(dl) * math.cos(p2[0]),
            math.cos(p1[0]) * math.sin(p2[0])
            - math.sin(p1[0]) * math.cos(p2[0]) * math.cos(dl),
        )
        assert abs(float(x[i]) - R * c * math.sin(az)) < 1e-6
        assert abs(float(y[i]) - R * c * math.cos(az)) < 1e-6
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)


def test_aeqd_polar_meridian_arc_quadrature():
    """Polar ellipsoidal aspect: rho(phi) must equal the pole-to-phi
    meridian arc, integrated here NUMERICALLY (Simpson over
    M'(phi) = a(1-e^2)/(1-e^2 sin^2 phi)^1.5) — no series shared with
    the implementation."""
    import math

    crs = P.parse_proj4("+proj=aeqd +lat_0=90 +lon_0=0 +ellps=WGS84")
    a, e2 = crs["a"], crs["e2"]

    def arc(phi_from: float, phi_to: float, n: int = 20001) -> float:
        phis = np.linspace(phi_from, phi_to, n)
        integrand = a * (1 - e2) / np.power(1 - e2 * np.sin(phis) ** 2, 1.5)
        h = (phi_to - phi_from) / (n - 1)
        w = np.ones(n)
        w[1:-1:2], w[2:-1:2] = 4.0, 2.0
        return float(h / 3.0 * np.sum(w * integrand))

    for lat, lon in ((80.0, 0.0), (60.0, 90.0), (30.0, -135.0)):
        x, y = P.forward(crs, np.asarray([lon]), np.asarray([lat]))
        rho = math.hypot(float(x[0]), float(y[0]))
        want = arc(math.radians(lat), math.pi / 2.0)
        assert abs(rho - want) < 2e-3, (lat, rho, want)  # quadrature+series mm-level
    # round-trip
    lons = np.asarray([0.0, 90.0, -135.0, 17.0])
    lats = np.asarray([80.0, 60.0, 30.0, 45.0])
    x, y = P.forward(crs, lons, lats)
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, atol=1e-8)


def test_aeqd_oblique_ellipsoid_properties():
    """Oblique ellipsoidal aspect (Vincenty): defining properties —
    (a) fwd/inv round-trip, (b) equidistance: points generated by the
    DIRECT geodesic at distance s from the center must project to
    radius exactly s, (c) sphere-limit agreement."""
    import math

    crs = P.parse_proj4("+proj=aeqd +lat_0=52 +lon_0=5 +ellps=GRS80")
    rng = np.random.default_rng(9)
    lons = rng.uniform(-40.0, 60.0, 40)
    lats = rng.uniform(5.0, 85.0, 40)
    x, y = P.forward(crs, lons, lats)
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-8)
    np.testing.assert_allclose(lat2, lats, atol=1e-8)
    # equidistance: direct-geodesic points at known (az, s)
    phi1, lam1 = math.radians(52.0), math.radians(5.0)
    azs = np.radians(np.asarray([10.0, 95.0, 200.0, 301.0]))
    ss = np.asarray([5e4, 3e5, 1.2e6, 2.5e6])
    phi2, lam2 = P._vincenty_direct(phi1, lam1, azs, ss, crs["a"], crs["e2"])
    xs, ys = P.forward(crs, np.degrees(lam2), np.degrees(phi2))
    np.testing.assert_allclose(np.hypot(xs, ys), ss, rtol=1e-9)
    np.testing.assert_allclose(np.arctan2(xs, ys) % (2 * np.pi), azs, atol=1e-9)
    # sphere limit: +a=+b aeqd equals the spherical closed form
    sph = P.parse_proj4("+proj=aeqd +lat_0=52 +lon_0=5 +a=6371000 +b=6371000")
    x_s, y_s = P.forward(sph, lons, lats)
    R = 6371000.0
    for i in range(3):
        dl = math.radians(float(lons[i]) - 5.0)
        p2 = math.radians(float(lats[i]))
        c = math.acos(
            min(1.0, max(-1.0,
                math.sin(math.radians(52.0)) * math.sin(p2)
                + math.cos(math.radians(52.0)) * math.cos(p2) * math.cos(dl)))
        )
        assert abs(math.hypot(float(x_s[i]), float(y_s[i])) - R * c) < 1e-5


def test_aeqd_transform_integration():
    crs = P.parse_proj4("+proj=aeqd +lat_0=-20 +lon_0=135 +ellps=WGS84 +x_0=10000 +y_0=-5000")
    lons = np.asarray([110.0, 150.0, 178.0])
    lats = np.asarray([-45.0, -10.0, 5.0])
    x, y = P.forward(crs, lons, lats)
    mx, my = P.transform(crs, "+init=epsg:3857", x, y)
    x2, y2 = P.transform("+init=epsg:3857", crs, mx, my)
    np.testing.assert_allclose(x2, x, rtol=0, atol=1e-5)
    np.testing.assert_allclose(y2, y, rtol=0, atol=1e-5)


# ---------------------------------------------------------------------------
# cass (round 5 — Cassini-Soldner, Snyder eq. 13-7..13-12). Oracles:
# the central meridian is the meridian arc (shared quadrature check),
# the SPHERE closed form x = R asin(cos phi sin dlam) /
# y = R (atan2(tan phi, cos dlam) - phi0), and round-trips.
# ---------------------------------------------------------------------------

def test_cass_sphere_closed_form():
    import math

    R = 6370997.0
    crs = P.parse_proj4(f"+proj=cass +lat_0=10 +lon_0=20 +a={R} +b={R}")
    rng = np.random.default_rng(4)
    lons = 20.0 + rng.uniform(-3.0, 3.0, 25)
    lats = rng.uniform(-60.0, 75.0, 25)
    x, y = P.forward(crs, lons, lats)
    for i in range(len(lons)):
        dl = math.radians(float(lons[i]) - 20.0)
        ph = math.radians(float(lats[i]))
        ex = R * math.asin(math.cos(ph) * math.sin(dl))
        ey = R * (math.atan2(math.tan(ph), math.cos(dl)) - math.radians(10.0))
        # series truncation at |dlam|<=3 deg is centimetre-level
        assert abs(float(x[i]) - ex) < 0.05, (lons[i], lats[i])
        assert abs(float(y[i]) - ey) < 0.05


def test_cass_central_meridian_is_meridian_arc():
    import math

    crs = P.parse_proj4("+proj=cass +lat_0=4 +lon_0=102 +ellps=GRS80")
    a, e2 = crs["a"], crs["e2"]
    for lat in (4.0, 7.0, 1.0, -2.0):
        x, y = P.forward(crs, np.asarray([102.0]), np.asarray([lat]))
        assert abs(float(x[0])) < 1e-6
        want = float(
            P._merid_arc(np.asarray([math.radians(lat)]), a, e2)[0]
            - P._merid_arc(np.asarray([math.radians(4.0)]), a, e2)[0]
        )
        assert abs(float(y[0]) - want) < 1e-6


def test_cass_roundtrip_and_offsets():
    crs = P.parse_proj4(
        "+proj=cass +lat_0=4 +lon_0=102 +x_0=40000 +y_0=-10000 +ellps=bessel"
    )
    rng = np.random.default_rng(6)
    lons = 102.0 + rng.uniform(-2.5, 2.5, 50)
    lats = rng.uniform(-5.0, 12.0, 50)
    x, y = P.forward(crs, lons, lats)
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lons, atol=2e-7)
    np.testing.assert_allclose(lat2, lats, atol=2e-7)
    x0, y0 = P.forward(crs, np.asarray([102.0]), np.asarray([4.0]))
    assert abs(float(x0[0]) - 40000.0) < 1e-6
    assert abs(float(y0[0]) + 10000.0) < 1e-6


def test_eqc_closed_form_and_roundtrip():
    """Equirectangular (Snyder 12-1..12-6): exact closed form — one
    published-grade pin needs no memory: at lat_ts=0 on the WGS84
    sphere radius, x is exactly a*radians(lon)."""
    import math

    crs = P.parse_proj4("+proj=eqc +lat_ts=30 +lat_0=5 +lon_0=10 "
                        "+x_0=100 +y_0=-50 +ellps=WGS84")
    rng = np.random.default_rng(8)
    lons = rng.uniform(-170.0, 170.0, 40)
    lats = rng.uniform(-85.0, 85.0, 40)
    x, y = P.forward(crs, lons, lats)
    a = crs["a"]
    c = math.cos(math.radians(30.0))
    for i in range(len(lons)):
        dl = (math.radians(float(lons[i]) - 10.0) + math.pi) % (2 * math.pi) - math.pi
        assert abs(float(x[i]) - (100 + a * dl * c)) < 1e-6
        assert abs(
            float(y[i]) - (-50 + a * (math.radians(float(lats[i])) - math.radians(5.0)))
        ) < 1e-6
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-10)
    np.testing.assert_allclose(lat2, lats, atol=1e-10)
    # Plate Carrée: x = a*radians(lon) exactly
    pc = P.parse_proj4("+proj=eqc +ellps=WGS84")
    x0, y0 = P.forward(pc, np.asarray([90.0]), np.asarray([45.0]))
    assert abs(float(x0[0]) - a * math.pi / 2.0) < 1e-6
    assert abs(float(y0[0]) - a * math.pi / 4.0) < 1e-6


def test_eqc_epsg_aliases():
    import math

    for code in ("+init=epsg:4087", "+init=epsg:32662"):
        crs = P.parse_proj4(code)
        x, y = P.forward(crs, np.asarray([90.0]), np.asarray([-90.0]))
        assert abs(float(x[0]) - P.WGS84_A * math.pi / 2.0) < 1e-6
        assert abs(float(y[0]) + P.WGS84_A * math.pi / 2.0) < 1e-6


# --- omerc (Hotine oblique Mercator — Snyder ch. 9 / EPSG GN7-2) ------------

def test_omerc_epsg_worked_example():
    """EPSG Guidance Note 7-2 §Hotine Oblique Mercator (variant B)
    worked example: Timbalai 1948 / RSO Borneo (m), Everest (Sabah &
    Sarawak), center 4°N 115°E, alpha_c 53°18'56.9537", gamma_c
    53°07'48.3685", k_c 0.99984, FE 590476.87, FN 442857.65. Test point
    5°23'14.1129"N 115°48'19.8196"E -> E 679245.73, N 596562.78."""
    crs = P.parse_proj4(
        "+proj=omerc +lat_0=4 +lonc=115"
        " +alpha=" + repr(53 + 18 / 60 + 56.9537 / 3600)
        + " +gamma=" + repr(53 + 7 / 60 + 48.3685 / 3600)
        + " +k=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=evrstSS"
    )
    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    x, y = P.forward(crs, np.asarray([lon]), np.asarray([lat]))
    assert abs(float(x[0]) - 679245.73) < 0.02
    assert abs(float(y[0]) - 596562.78) < 0.02
    # variant B: the projection CENTER maps to (FE, FN)
    xc, yc = P.forward(crs, np.asarray([115.0]), np.asarray([4.0]))
    assert abs(float(xc[0]) - 590476.87) < 1e-5
    assert abs(float(yc[0]) - 442857.65) < 1e-5


def test_omerc_roundtrip():
    crs = P.parse_proj4(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.316 +k=0.99984"
        " +x_0=590476.87 +y_0=442857.65 +ellps=evrstSS"
    )
    rng = np.random.default_rng(11)
    lons = 115.0 + rng.uniform(-6.0, 6.0, 60)
    lats = rng.uniform(-4.0, 12.0, 60)
    x, y = P.forward(crs, lons, lats)
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)
    # southern-hemisphere aspect + no_off variant round-trips too
    s = P.parse_proj4(
        "+proj=omerc +lat_0=-36 +lonc=143 +alpha=-54 +k=1 +no_off +ellps=WGS84"
    )
    xs, ys = P.forward(s, lons + 28.0, -lats - 25.0)
    lon3, lat3 = P.inverse(s, xs, ys)
    np.testing.assert_allclose(lon3, lons + 28.0, atol=1e-9)
    np.testing.assert_allclose(lat3, -lats - 25.0, atol=1e-9)


def test_omerc_sphere_center_line_oracle():
    """Independent spherical oracle (no memorized numbers): on a sphere
    the omerc initial line is the great circle through the center at
    azimuth alpha. Points generated along that great circle by an
    INDEPENDENT spherical direct-geodesic formula must project onto ONE
    straight line, with spacing k0 * R * dsigma (true scale along the
    center line)."""
    import math

    R = 6370997.0
    lat0, lonc, alpha, k0 = 30.0, 20.0, 50.0, 0.9996
    crs = P.parse_proj4(
        f"+proj=omerc +lat_0={lat0} +lonc={lonc} +alpha={alpha}"
        f" +k={k0} +a={R} +no_off"
    )
    assert crs["e2"] == 0.0
    phi1, lam1, az = map(math.radians, (lat0, lonc, alpha))
    pts = []
    sigmas = np.linspace(-0.5, 0.5, 21)  # ±~3200 km along the line
    for sig in sigmas:
        # spherical direct geodesic (standard nav closed form)
        phi2 = math.asin(
            math.sin(phi1) * math.cos(sig)
            + math.cos(phi1) * math.sin(sig) * math.cos(az)
        )
        lam2 = lam1 + math.atan2(
            math.sin(az) * math.sin(sig) * math.cos(phi1),
            math.cos(sig) - math.sin(phi1) * math.sin(phi2),
        )
        pts.append((math.degrees(lam2), math.degrees(phi2)))
    lons = np.asarray([p[0] for p in pts])
    lats = np.asarray([p[1] for p in pts])
    x, y = P.forward(crs, lons, lats)
    # collinear: regress (x, y) on arc length, residuals ~0
    dx, dy = x[-1] - x[0], y[-1] - y[0]
    L = math.hypot(dx, dy)
    # perpendicular distance of every point from the chord
    d = np.abs((x - x[0]) * dy - (y - y[0]) * dx) / L
    assert d.max() < 1e-4, d.max()
    # true scale: consecutive spacing == k0 * R * dsigma
    spacing = np.hypot(np.diff(x), np.diff(y))
    want = k0 * R * (sigmas[1] - sigmas[0])
    np.testing.assert_allclose(spacing, want, rtol=1e-9)


def test_omerc_conformality():
    """Finite-difference Jacobian is a scaled rotation (conformal) at
    scattered points on the ellipsoid."""
    crs = P.parse_proj4(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.316 +k=0.99984 +ellps=evrstSS"
    )
    rng = np.random.default_rng(12)
    lons = 115.0 + rng.uniform(-5.0, 5.0, 25)
    lats = rng.uniform(-2.0, 10.0, 25)
    h = 1e-6
    x0, y0 = P.forward(crs, lons, lats)
    xl, yl = P.forward(crs, lons + h, lats)
    xp, yp = P.forward(crs, lons, lats + h)
    # columns scaled to common ground units: dλ column / cosφ·(M/N-ish)
    # — conformality on (λ, ψ) isometric coords: dψ = dφ·(1-e2)/((1-e2sin²φ)cosφ)
    import math as m
    e2 = crs["e2"]
    phi = np.radians(lats)
    dpsi_dphi = (1 - e2) / ((1 - e2 * np.sin(phi) ** 2) * np.cos(phi))
    # J in (λ, ψ): [dx/dλ, dx/dψ; dy/dλ, dy/dψ]
    a11 = (xl - x0) / h
    a21 = (yl - y0) / h
    a12 = (xp - x0) / h / dpsi_dphi
    a22 = (yp - y0) / h / dpsi_dphi
    # Cauchy-Riemann: a11 == a22, a12 == -a21 (up to FD error)
    scale = np.hypot(a11, a21)
    np.testing.assert_allclose(a11, a22, atol=scale.max() * 2e-5)
    np.testing.assert_allclose(a12, -a21, atol=scale.max() * 2e-5)


# --- nzmg (New Zealand Map Grid — LINZS25002 complex polynomial) ------------

def test_nzmg_series_vs_isometric_latitude():
    """INDEPENDENT oracle for the published Δφ→Δψ series: ψ must be the
    isometric-latitude difference on International 1924, computed here
    in closed form (arctanh), nothing shared with the series."""
    import math

    a, rf = 6378388.0, 297.0
    f = 1.0 / rf
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    lat = np.linspace(-50.0, -33.0, 401)
    phi = np.radians(lat)
    phi0 = math.radians(-41.0)

    def q(p):
        return np.arctanh(np.sin(p)) - e * np.arctanh(e * np.sin(p))

    want = q(phi) - q(phi0)
    units = (lat - (-41.0)) * 3600.0e-5
    psi = np.polyval(P._NZMG_TPSI_PV, units)
    np.testing.assert_allclose(psi, want, atol=2e-9)
    # the published inverse table really is the inverse
    back = np.polyval(P._NZMG_TPHI_PV, psi)
    np.testing.assert_allclose(back, units, atol=5e-9)


def test_nzmg_origin_orientation_scale():
    crs = P.parse_proj4("+proj=nzmg")
    # true origin -> false origin exactly
    x, y = P.forward(crs, np.asarray([173.0]), np.asarray([-41.0]))
    assert abs(float(x[0]) - 2510000.0) < 1e-6
    assert abs(float(y[0]) - 6023150.0) < 1e-6
    # axes: east responds to +lon, north to +lat; conformal scale ~1
    import math

    a, e2 = crs["a"], crs["e2"]
    lats = np.linspace(-46.5, -34.5, 9)
    lons = np.linspace(167.5, 178.0, 9)
    LO, LA = np.meshgrid(lons, lats)
    lo, la = LO.ravel(), LA.ravel()
    x, y = P.forward(crs, lo, la)
    xe, ye = P.forward(crs, lo + 1e-3, la)
    xn, yn = P.forward(crs, lo, la + 1e-3)
    assert ((xe - x) > 0).all() and ((yn - y) > 0).all()
    de = np.hypot(xe - x, ye - y)
    dn = np.hypot(xn - x, yn - y)
    for i in range(0, len(lo), 7):
        se = P._vincenty_inverse(
            math.radians(la[i]), math.radians(lo[i]),
            np.radians(np.asarray([la[i]])),
            np.radians(np.asarray([lo[i] + 1e-3])), a, e2,
        )[0][0]
        sn = P._vincenty_inverse(
            math.radians(la[i]), math.radians(lo[i]),
            np.radians(np.asarray([la[i] + 1e-3])),
            np.radians(np.asarray([lo[i]])), a, e2,
        )[0][0]
        ke, kn = de[i] / se, dn[i] / sn
        assert 0.9995 < ke < 1.012 and 0.9995 < kn < 1.012
        assert abs(ke - kn) < 1e-5  # conformal: isotropic scale


def test_nzmg_roundtrip_and_epsg_alias():
    crs = P.parse_proj4("+init=epsg:27200")
    assert crs["proj"] == "nzmg"
    rng = np.random.default_rng(13)
    lons = rng.uniform(166.0, 179.5, 80)
    lats = rng.uniform(-47.5, -34.0, 80)
    x, y = P.forward(crs, lons, lats)
    lon2, lat2 = P.inverse(crs, x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)
    # metro sanity: Auckland lands in its NZMG 10 km box
    xa, ya = P.forward(crs, np.asarray([174.7633]), np.asarray([-36.8485]))
    assert abs(float(xa[0]) - 2667700.0) < 1e4
    assert abs(float(ya[0]) - 6482400.0) < 1e4


def test_nztm2000_epsg_alias():
    """EPSG:2193 (NZTM2000) routes to tmerc on GRS80 with the LINZ
    parameters; origin check: (173E, 0) -> (1600000, 10000000)."""
    crs = P.parse_proj4("epsg:2193")
    assert crs["proj"] == "tmerc"
    x, y = P.forward(crs, np.asarray([173.0]), np.asarray([0.0]))
    assert abs(float(x[0]) - 1600000.0) < 1e-6
    assert abs(float(y[0]) - 10000000.0) < 1e-6


# --- krovak / sinu / moll (round 6 tail: rarer proj4 codes) -------------------


def test_krovak_epsg_worked_example():
    """EPSG Guidance Note 7-2, method 9819 worked example (S-JTSK):
    50d12'32.4416\"N 16d50'59.1790\"E -> Southing 1050538.63, Westing
    568990.97 on Bessel 1841 (proj4 axes: x=-Westing, y=-Southing)."""
    crs = P.parse_proj4("+proj=krovak")
    lat = 50 + 12 / 60 + 32.4416 / 3600
    lon = 16 + 50 / 60 + 59.1790 / 3600
    x, y = P.forward(crs, np.array([lon]), np.array([lat]))
    assert abs(float(x[0]) - (-568990.97)) < 0.05
    assert abs(float(y[0]) - (-1050538.63)) < 0.05
    lo, la = P.inverse(crs, x, y)
    assert abs(float(lo[0]) - lon) < 1e-9 and abs(float(la[0]) - lat) < 1e-9


def test_krovak_conformal_jacobian():
    """Independent oracle: Krovak is CONFORMAL, so the finite-difference
    Jacobian in locally-isometric coordinates (dlam*cos(phi), dphi on the
    ellipsoid's local radii) must be a scaled rotation everywhere:
    equal singular values / zero shear, checked without any constant
    shared with the implementation."""
    import math

    crs = P.parse_proj4("+proj=krovak")
    a, e2 = crs["a"], crs["e2"]
    rng = np.random.default_rng(8)
    lons = rng.uniform(12.0, 22.0, 25)
    lats = rng.uniform(47.5, 51.5, 25)
    h = 1e-6  # degrees
    for lon, lat in zip(lons, lats):
        x0, y0 = P.forward(crs, np.array([lon - h, lon + h, lon, lon]),
                           np.array([lat, lat, lat - h, lat + h]))
        dxdl = (x0[1] - x0[0]) / (2 * h)
        dydl = (y0[1] - y0[0]) / (2 * h)
        dxdp = (x0[3] - x0[2]) / (2 * h)
        dydp = (y0[3] - y0[2]) / (2 * h)
        phi = math.radians(lat)
        s2 = 1 - e2 * math.sin(phi) ** 2
        nu = a / math.sqrt(s2)          # prime-vertical radius
        rho = a * (1 - e2) / s2 ** 1.5  # meridian radius
        # per-radian ground distances: east = nu*cos(phi), north = rho
        J = np.array([
            [dxdl / (nu * math.cos(phi)), dxdp / rho],
            [dydl / (nu * math.cos(phi)), dydp / rho],
        ]) * (180.0 / math.pi)
        sv = np.linalg.svd(J, compute_uv=False)
        assert sv[0] / sv[1] - 1 < 1e-5, (lon, lat, sv)
        # scale near the pseudo-standard parallel's k
        assert 0.999 < sv[0] < 1.001


def test_krovak_epsg_5514_alias_and_datum():
    crs = P.parse_proj4("epsg:5514")
    assert crs["proj"] == "krovak" and crs["towgs84"][:3] == (589.0, 76.0, 480.0)
    # S-JTSK -> WGS84 via the Helmert shift: Prague stays in Czechia
    lon, lat = P.transform("epsg:5514", "+proj=longlat +ellps=WGS84",
                           np.array([-743000.0]), np.array([-1043000.0]))
    assert 14.0 < float(lon[0]) < 15.0 and 49.9 < float(lat[0]) < 50.4


def test_sinu_snyder_examples_and_equal_area():
    """Snyder (PP 1395) ch. 30: spherical worked example p. 365 and the
    ellipsoidal Clarke-1866 example; equal-area pinned by a
    finite-difference Jacobian == true area element (independent)."""
    crs = P.parse_proj4("+proj=sinu +lon_0=-90 +R=1")
    x, y = P.forward(crs, np.array([-75.0]), np.array([-50.0]))
    assert abs(float(x[0]) - 0.1682814) < 1e-7
    assert abs(float(y[0]) - (-0.8726646)) < 1e-7
    crs2 = P.parse_proj4("+proj=sinu +lon_0=-90 +ellps=clrk66")
    x2, y2 = P.forward(crs2, np.array([-75.0]), np.array([-50.0]))
    assert abs(float(x2[0]) - 1075471.5) < 0.2
    assert abs(float(y2[0]) - (-5540628.0)) < 0.2
    _assert_equal_area(crs2, lon_lo=-120, lon_hi=-60, lat_lo=-70, lat_hi=70)
    rng = np.random.default_rng(3)
    lons, lats = rng.uniform(-170, -10, 40), rng.uniform(-85, 85, 40)
    xx, yy = P.forward(crs2, lons, lats)
    lo, la = P.inverse(crs2, xx, yy)
    np.testing.assert_allclose(lo, lons, atol=2e-9)
    np.testing.assert_allclose(la, lats, atol=2e-9)


def test_moll_snyder_example_and_equal_area():
    """Snyder ch. 31 worked example (R=1, lon_0=-90): (50N, 75W) ->
    (0.1788845, 0.9208758); global equal-area + boundary invariants."""
    import math

    crs = P.parse_proj4("+proj=moll +lon_0=-90 +R=1")
    x, y = P.forward(crs, np.array([-75.0]), np.array([50.0]))
    assert abs(float(x[0]) - 0.1788845) < 1e-6
    assert abs(float(y[0]) - 0.9208758) < 1e-6
    # poles map to (0, +/-sqrt(2) R); equator edge to (+/-2 sqrt(2) R, 0)
    xp, yp = P.forward(crs, np.array([-90.0, -90.0]), np.array([90.0, -90.0]))
    np.testing.assert_allclose(xp, [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(yp, [math.sqrt(2), -math.sqrt(2)], atol=1e-9)
    xe, _ = P.forward(crs, np.array([90.0]), np.array([0.0]))
    assert abs(float(xe[0]) - 2 * math.sqrt(2)) < 1e-9
    crs_m = P.parse_proj4("+proj=moll +ellps=WGS84")  # sphere on a
    _assert_equal_area(crs_m, lon_lo=-150, lon_hi=150, lat_lo=-80, lat_hi=80)
    rng = np.random.default_rng(5)
    lons, lats = rng.uniform(-150, 150, 40), rng.uniform(-88, 88, 40)
    xx, yy = P.forward(crs_m, lons, lats)
    lo, la = P.inverse(crs_m, xx, yy)
    np.testing.assert_allclose(lo, lons, atol=1e-8)
    np.testing.assert_allclose(la, lats, atol=1e-8)


def _assert_equal_area(crs, lon_lo, lon_hi, lat_lo, lat_hi, n=20):
    """Finite-difference |det J| must equal the TRUE ellipsoidal area
    element rho * nu * cos(phi) (sphere: R^2 cos phi) at every sample —
    the defining equal-area property, no series shared with the code."""
    import math

    a, e2 = crs["a"], crs["e2"]
    rng = np.random.default_rng(11)
    lons = rng.uniform(lon_lo, lon_hi, n)
    lats = rng.uniform(lat_lo, lat_hi, n)
    h = 1e-6
    for lon, lat in zip(lons, lats):
        xs, ys = P.forward(crs, np.array([lon - h, lon + h, lon, lon]),
                           np.array([lat, lat, lat - h, lat + h]))
        det = abs(
            (xs[1] - xs[0]) * (ys[3] - ys[2]) - (xs[3] - xs[2]) * (ys[1] - ys[0])
        ) / (2 * h * math.pi / 180.0) ** 2
        phi = math.radians(lat)
        s2 = 1 - e2 * math.sin(phi) ** 2
        true = (a / math.sqrt(s2)) * (a * (1 - e2) / s2 ** 1.5) * math.cos(phi)
        assert abs(det / true - 1) < 1e-5, (lon, lat, det, true)


# --- laea (round 6 tail: EPSG:3035 Europe, North-Pole arctic grids) -----------


def test_laea_epsg_worked_example():
    """EPSG Guidance Note 7-2, method 9820 worked example (ETRS89-LAEA
    Europe): 50N 5E -> E 3962799.45, N 2999718.85 on GRS80."""
    crs = P.parse_proj4("epsg:3035")
    assert crs["proj"] == "laea" and crs["lat_0"] == 52.0
    x, y = P.forward(crs, np.array([5.0]), np.array([50.0]))
    assert abs(float(x[0]) - 3962799.45) < 0.02
    assert abs(float(y[0]) - 2999718.85) < 0.02
    lo, la = P.inverse(crs, x, y)
    assert abs(float(lo[0]) - 5.0) < 1e-9
    # the authalic phi<->beta series truncates at e^6: ~3e-9 deg on GRS80
    assert abs(float(la[0]) - 50.0) < 5e-9


def test_laea_equal_area_and_roundtrip():
    """Independent oracle: finite-difference |det J| == the TRUE
    ellipsoidal area element everywhere in the Europe window; dense
    random round-trip at the series floor."""
    crs = P.parse_proj4(
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80"
    )
    _assert_equal_area(crs, lon_lo=-10, lon_hi=35, lat_lo=30, lat_hi=72)
    rng = np.random.default_rng(17)
    lons, lats = rng.uniform(-120, 150, 60), rng.uniform(-85, 85, 60)
    xx, yy = P.forward(crs, lons, lats)
    lo, la = P.inverse(crs, xx, yy)
    np.testing.assert_allclose(lo, lons, atol=1e-8)
    np.testing.assert_allclose(la, lats, atol=5e-9)


def test_laea_polar_cap_area_quadrature():
    """North-polar aspect (EPSG:3575): equal-area means pi*rho(phi)^2
    must equal the TRUE ellipsoidal cap area above phi, computed here by
    numeric quadrature of 2*pi*rho_m*nu*cos(phi) — no constant or series
    shared with the implementation."""
    import math

    crs = P.parse_proj4("epsg:3575")
    assert crs["proj"] == "laea" and crs["lat_0"] == 90.0 and crs["lon_0"] == 10.0
    a, e2 = crs["a"], crs["e2"]

    def cap_area(lat_deg: float) -> float:
        phi = np.linspace(math.radians(lat_deg), math.pi / 2.0, 200001)
        s2 = 1.0 - e2 * np.sin(phi) ** 2
        integ = (a * (1 - e2) / s2 ** 1.5) * (a / np.sqrt(s2)) * np.cos(phi)
        return 2.0 * math.pi * float(np.trapz(integ, phi))

    for lat in (45.0, 60.0, 75.0, 85.0):
        x, y = P.forward(crs, np.array([10.0]), np.array([lat]))
        rho2 = float(x[0]) ** 2 + float(y[0]) ** 2
        assert abs(math.pi * rho2 / cap_area(lat) - 1.0) < 1e-8, lat

    # the pole is the origin; the central meridian runs straight south
    x0, y0 = P.forward(crs, np.array([10.0]), np.array([90.0]))
    assert abs(float(x0[0])) < 1e-6 and abs(float(y0[0])) < 1e-6
    xm, ym = P.forward(crs, np.array([10.0]), np.array([70.0]))
    assert abs(float(xm[0])) < 1e-6 and float(ym[0]) < 0

    # round-trip across the grid incl. the antimeridian side
    rng = np.random.default_rng(23)
    lons, lats = rng.uniform(-180, 180, 60), rng.uniform(40, 89.9, 60)
    xx, yy = P.forward(crs, lons, lats)
    lo, la = P.inverse(crs, xx, yy)
    dl = (np.asarray(lo) - lons + 180.0) % 360.0 - 180.0
    np.testing.assert_allclose(dl, 0.0, atol=1e-8)
    np.testing.assert_allclose(la, lats, atol=5e-9)


def test_laea_transform_datum_chain():
    """EPSG:3035 -> web mercator through the full transform() chain
    (towgs84=0 identity): Brussels stays at Brussels."""
    x, y = P.transform(
        "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",
        "epsg:3035", np.array([4.35]), np.array([50.85]),
    )
    bx, by = P.transform("epsg:3035", "epsg:3857", x, y)
    assert abs(float(bx[0]) - 4.35 * 20037508.342789244 / 180.0) < 1e-3
    merc_y = 6378137.0 * np.log(np.tan(np.pi / 4 + np.radians(50.85) / 2))
    assert abs(float(by[0]) - float(merc_y)) < 1e-3


# --- cea (EASE-Grid 2.0: EPSG:6933) -------------------------------------------


def test_cea_ease2_extent_and_area_conservation():
    """EPSG:6933 (NSIDC EASE-Grid 2.0 Global): the published map width
    constant x_max = 17367530.445161 m; and the whole map's rectangle
    area must equal the TRUE ellipsoid surface area (independent
    quadrature — the defining property of an equal-area cylindrical)."""
    import math

    crs = P.parse_proj4("epsg:6933")
    assert crs["proj"] == "cea" and crs["lat_ts"] == 30.0
    x, y = P.forward(crs, np.array([180.0]), np.array([90.0]))
    assert abs(float(x[0]) - 17367530.445161) < 1e-3
    # surface area of the WGS84 ellipsoid by quadrature
    a, e2 = crs["a"], crs["e2"]
    phi = np.linspace(0.0, math.pi / 2.0, 400001)
    s2 = 1.0 - e2 * np.sin(phi) ** 2
    integ = (a * (1 - e2) / s2 ** 1.5) * (a / np.sqrt(s2)) * np.cos(phi)
    surface = 4.0 * math.pi * float(np.trapz(integ, phi))
    map_area = (2.0 * float(x[0])) * (2.0 * float(y[0]))
    assert abs(map_area / surface - 1.0) < 1e-9


def test_cea_equal_area_and_roundtrip():
    crs = P.parse_proj4("+proj=cea +lat_ts=30 +lon_0=-15 +ellps=WGS84")
    _assert_equal_area(crs, lon_lo=-170, lon_hi=170, lat_lo=-85, lat_hi=85)
    rng = np.random.default_rng(29)
    lons, lats = rng.uniform(-180, 180, 60), rng.uniform(-89.9, 89.9, 60)
    xx, yy = P.forward(crs, lons, lats)
    lo, la = P.inverse(crs, xx, yy)
    np.testing.assert_allclose(lo, lons, atol=1e-9)
    np.testing.assert_allclose(la, lats, atol=5e-9)
    # lat_ts is the true-scale parallel: a degree of longitude there
    # must measure its true ellipsoidal length on the map
    h = 1e-6
    x2, _ = P.forward(crs, np.array([10.0 - h, 10.0 + h]), np.array([30.0, 30.0]))
    per_rad = (float(x2[1]) - float(x2[0])) / np.radians(2 * h)
    nu = crs["a"] / np.sqrt(1 - crs["e2"] * np.sin(np.radians(30.0)) ** 2)
    assert abs(per_rad / (nu * np.cos(np.radians(30.0))) - 1.0) < 1e-8


# --- omerc two-point form (round 6: the last omerc parse gap) -----------------


def test_omerc_two_point_matches_azimuth_form():
    """The two-point central line (Snyder eqs. 9-16..9-24) must be THE
    SAME projection as the azimuth form it was sampled from: defining
    points land on the central line (v == 0), and the unrotated (u, v)
    charts agree to float noise everywhere (the rectified frames differ
    only by the documented gamma convention: gamma_0 vs alpha)."""
    import math

    az = P.parse_proj4(
        "+proj=omerc +lat_0=57 +lonc=-133.6666666 +alpha=-36.8698976"
        " +k=0.9999 +ellps=GRS80"
    )
    # two points exactly on the azimuth form's central line: inverse of
    # rotated (u, v=0)
    g_a = math.radians(az["gamma"])

    def on_line(u):
        lo, la = P.inverse(
            az, np.array([u * math.sin(g_a)]), np.array([u * math.cos(g_a)])
        )
        return float(lo[0]), float(la[0])

    (lo1, la1), (lo2, la2) = on_line(-300000.0), on_line(400000.0)
    tp = P.parse_proj4(
        f"+proj=omerc +lat_0=57 +lat_1={la1} +lon_1={lo1}"
        f" +lat_2={la2} +lon_2={lo2} +k=0.9999 +ellps=GRS80"
    )
    assert abs(tp["alpha"] - az["alpha"]) < 1e-9
    assert abs(tp["lonc"] - az["lonc"]) < 1e-9
    # defining points sit on the central line of the derived CRS
    g_t = math.radians(tp["gamma"])
    x, y = P.forward(tp, np.array([lo1, lo2]), np.array([la1, la2]))
    v = x * math.cos(g_t) - y * math.sin(g_t)
    np.testing.assert_allclose(v, 0.0, atol=1e-6)
    # unrotated charts agree across the region; round-trip exact
    rng = np.random.default_rng(1)
    lons, lats = rng.uniform(-140, -128, 30), rng.uniform(54, 60, 30)
    xa, ya = P.forward(az, lons, lats)
    xt, yt = P.forward(tp, lons, lats)
    u_t = xt * math.sin(g_t) + yt * math.cos(g_t)
    v_t = xt * math.cos(g_t) - yt * math.sin(g_t)
    u_a = xa * math.sin(g_a) + ya * math.cos(g_a)
    v_a = xa * math.cos(g_a) - ya * math.sin(g_a)
    np.testing.assert_allclose(u_t, u_a, atol=1e-6)
    np.testing.assert_allclose(v_t, v_a, atol=1e-6)
    lo, la = P.inverse(tp, xt, yt)
    np.testing.assert_allclose(lo, lons, atol=1e-9)
    np.testing.assert_allclose(la, lats, atol=1e-9)


def test_omerc_two_point_equal_latitude_line():
    """Two points at the SAME latitude define an east-west central line
    (P == 0 in Snyder 9-22): the limit branch must produce a valid CRS
    whose central line passes through both points."""
    import math

    tp = P.parse_proj4(
        "+proj=omerc +lat_0=45 +lat_1=45 +lon_1=-10 +lat_2=45 +lon_2=10"
        " +k=1 +ellps=WGS84"
    )
    g = math.radians(tp["gamma"])
    x, y = P.forward(tp, np.array([-10.0, 10.0]), np.array([45.0, 45.0]))
    v = x * math.cos(g) - y * math.sin(g)
    np.testing.assert_allclose(v, 0.0, atol=1e-5)
    lo, la = P.inverse(tp, x, y)
    np.testing.assert_allclose(lo, [-10.0, 10.0], atol=1e-9)
    np.testing.assert_allclose(la, [45.0, 45.0], atol=1e-9)


def test_cea_degenerate_lat_ts_raises():
    with pytest.raises(ValueError):
        P.forward(P.parse_proj4("+proj=cea +lat_ts=90"), np.array([0.0]), np.array([0.0]))


# --- gnom / ortho (spherical azimuthal tail) -----------------------------------


def test_gnom_great_circles_are_straight_lines():
    """The defining property of the gnomonic projection — every great
    circle maps to a straight line — checked on great circles that do
    NOT pass through the projection centre (an oracle no other azimuthal
    satisfies), plus the Snyder ch. 22 spherical worked example."""
    import math

    crs = P.parse_proj4("+proj=gnom +lat_0=40 +lon_0=-100 +R=1")
    # Snyder p. 320 example: (30N, 110W) -> x=-0.1542826, y=-0.1694739
    x, y = P.forward(crs, np.array([-110.0]), np.array([30.0]))
    assert abs(float(x[0]) - (-0.1542826)) < 1e-7
    assert abs(float(y[0]) - (-0.1694739)) < 1e-7

    rng = np.random.default_rng(41)
    for _ in range(5):
        # a random great circle near the centre: normal vector n, points
        # p(t) = cos t * u + sin t * v with {u, v} orthonormal in n's plane
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        u = np.cross(n, [0.0, 0.0, 1.0])
        if np.linalg.norm(u) < 1e-6:
            u = np.cross(n, [0.0, 1.0, 0.0])
        u /= np.linalg.norm(u)
        v = np.cross(n, u)
        # centre direction
        c = np.array([
            math.cos(math.radians(40)) * math.cos(math.radians(-100)),
            math.cos(math.radians(40)) * math.sin(math.radians(-100)),
            math.sin(math.radians(40)),
        ])
        ts = np.linspace(-0.4, 0.4, 9)
        pts = np.outer(np.cos(ts), u) + np.outer(np.sin(ts), v)
        # keep only samples on the visible hemisphere, need >= 3
        vis = pts @ c > 0.3
        if vis.sum() < 3:
            continue
        pts = pts[vis]
        lat = np.degrees(np.arcsin(pts[:, 2]))
        lon = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
        xs, ys = P.forward(crs, lon, lat)
        # collinearity: every point's cross product with the end-to-end
        # chord vanishes (relative to the chord's scale)
        dx, dy = xs[-1] - xs[0], ys[-1] - ys[0]
        cross = (xs - xs[0]) * dy - (ys - ys[0]) * dx
        assert np.abs(cross).max() < 1e-9 * max(np.hypot(dx, dy), 1e-9)

    # round-trip + horizon -> NaN
    lons, lats = rng.uniform(-140, -60, 40), rng.uniform(5, 75, 40)
    xx, yy = P.forward(crs, lons, lats)
    lo, la = P.inverse(crs, xx, yy)
    np.testing.assert_allclose(lo, lons, atol=1e-9)
    np.testing.assert_allclose(la, lats, atol=1e-9)
    xh, yh = P.forward(crs, np.array([80.0]), np.array([-40.0]))  # antipode
    assert np.isnan(float(xh[0])) and np.isnan(float(yh[0]))


def test_ortho_distance_law_and_roundtrip():
    """Orthographic: the planar radius must equal R sin(c) with c the
    TRUE spherical angular distance from the centre (independent
    law-of-cosines computation), incl. the Snyder ch. 20 example."""
    import math

    crs = P.parse_proj4("+proj=ortho +lat_0=40 +lon_0=-100 +R=1")
    # Snyder p. 311 example: (30N, 110W) -> x=-0.1503837, y=-0.1651911
    x, y = P.forward(crs, np.array([-110.0]), np.array([30.0]))
    assert abs(float(x[0]) - (-0.1503837)) < 1e-7
    assert abs(float(y[0]) - (-0.1651911)) < 1e-7

    rng = np.random.default_rng(43)
    lons, lats = rng.uniform(-170, -30, 50), rng.uniform(-35, 85, 50)
    xs, ys = P.forward(crs, lons, lats)
    phi0, lam0 = math.radians(40.0), math.radians(-100.0)
    phi, lam = np.radians(lats), np.radians(lons)
    cosc = (
        math.sin(phi0) * np.sin(phi)
        + math.cos(phi0) * np.cos(phi) * np.cos(lam - lam0)
    )
    vis = cosc > 0.0
    c = np.arccos(np.clip(cosc[vis], -1.0, 1.0))
    np.testing.assert_allclose(np.hypot(xs[vis], ys[vis]), np.sin(c), atol=1e-12)
    assert np.isnan(xs[~vis]).all()
    lo, la = P.inverse(crs, xs[vis], ys[vis])
    np.testing.assert_allclose(lo, lons[vis], atol=1e-8)
    np.testing.assert_allclose(la, lats[vis], atol=1e-8)


def test_eck4_equal_area_structure_and_roundtrip():
    """Eckert IV is UNIQUELY determined by (a) the functional form
    x = Cx R lam (1+cos theta), y = Cy R sin theta, (b) the equal-area
    property — pinned here by the independent FD |det J| == R^2 cos(phi)
    oracle, which fixes Cx*Cy and the theta equation — and (c) the two
    boundary conditions checked below: the pole line is exactly HALF the
    equator (fixes Cx/Cy) and theta(pole) = pi/2. The constants land on
    the published values Cx = 0.4222382..., Cy = 1.3265004...."""
    import math

    crs = P.parse_proj4("+proj=eck4 +lon_0=-90 +R=1")
    # published closed-form constants (2/sqrt(pi(4+pi)), 2 sqrt(pi/(4+pi)))
    assert abs(P._ECK4_CX - 0.42223820031577120149) < 1e-15
    assert abs(P._ECK4_CY - 1.32650042817700232218) < 1e-15
    # the Newton solve satisfies the canonical theta equation exactly
    phi = np.radians(np.array([50.0]))
    th = P._eck4_theta(phi)
    lhs = th + np.sin(th) * np.cos(th) + 2.0 * np.sin(th)
    np.testing.assert_allclose(lhs, (2 + math.pi / 2) * np.sin(phi), atol=1e-12)
    crs_m = P.parse_proj4("+proj=eck4 +ellps=WGS84")  # sphere on a
    _assert_equal_area(crs_m, lon_lo=-150, lon_hi=150, lat_lo=-80, lat_hi=80)
    # pole line = half the equator; y at the poles = CY * R
    xe, _ = P.forward(crs_m, np.array([180.0]), np.array([0.0]))
    xp, yp = P.forward(crs_m, np.array([180.0, 0.0]), np.array([90.0, 90.0]))
    assert abs(float(xp[0]) / float(xe[0]) - 0.5) < 1e-12
    assert abs(float(yp[1]) - 2.0 * math.sqrt(math.pi / (4 + math.pi)) * crs_m["a"]) < 1e-6
    rng = np.random.default_rng(47)
    lons, lats = rng.uniform(-180, 180, 50), rng.uniform(-89, 89, 50)
    xx, yy = P.forward(crs_m, lons, lats)
    lo, la = P.inverse(crs_m, xx, yy)
    np.testing.assert_allclose(lo, lons, atol=1e-8)
    np.testing.assert_allclose(la, lats, atol=1e-8)
