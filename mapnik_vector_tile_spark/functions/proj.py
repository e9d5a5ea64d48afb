"""Minimal projection engine (P3 — the reference's
vector_tile_strategy_proj, src/vector_tile_strategy.hpp:69-104, runs
arbitrary proj4 transforms through mapnik::proj_transform; pyproj is
absent in this container, so the common projections are implemented
directly in numpy):

* ``longlat``  — geographic (any supported ellipsoid, degrees)
* ``merc``     — spherical web mercator (EPSG:3857 semantics, a=R)
* ``merc_e``   — ellipsoidal mercator (EPSG:3395) when +ellps=WGS84 and
                 no +R/+a=6378137-only spherical hint
* ``tmerc``    — transverse mercator via the Krüger/Karney series
                 (order n^4 — sub-millimetre inside a UTM-width zone),
                 parameterized per ellipsoid (OSGB airy, Gauss-Krüger
                 bessel, ... — r4)
* ``utm``      — tmerc with zone parameters (k0=0.9996, FE=500km)
* ``lcc``      — Lambert Conformal Conic, ellipsoidal 1SP/2SP
                 (Snyder eq. 15-x; Lambert-93 / NAD83 state planes / the
                 post-UTM national-grid family — r4)
* ``stere``    — stereographic, ellipsoidal: polar aspects (Snyder eq.
                 21-33..21-41; NSIDC / Antarctic grids — r4) and
                 oblique/equatorial aspects via the conformal-latitude
                 method (Snyder eq. 3-1, 21-24..21-40 — r5)
* ``aeqd``     — azimuthal equidistant: spherical closed form, polar
                 meridian-arc, oblique ellipsoidal via Vincenty
                 geodesics (Snyder ch. 25 — r5)
* ``cass``     — Cassini-Soldner, ellipsoidal series (Snyder ch. 13 —
                 r5; historic cadastral grids)
* ``eqc``      — equirectangular / Plate Carrée (Snyder ch. 12 — r5)

Ellipsoids come from +ellps/+a/+b/+rf (WGS84, GRS80, intl, clrk66,
bessel, krass, airy); ``+towgs84`` 3/7-parameter Helmert datum shifts
apply through geocentric XYZ in ``transform`` (position-vector
convention, proj4-classic semantics: no +towgs84 anywhere = no shift).

``parse_proj4`` reads the proj4 strings the reference's own tests use
plus the above; ``transform`` converts coordinate arrays between any
two supported CRSs through the geographic intermediate, exactly the
shape of mapnik's proj_transform.forward/backward.
"""

from __future__ import annotations

import math

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)

# (a, rf) per proj4 +ellps tag — the grids lcc/stere national CRSs use
_ELLPS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.9786982138982),
    "bessel": (6377397.155, 299.1528128),
    "krass": (6378245.0, 298.3),
    "airy": (6377563.396, 299.3249646),
    "evrstSS": (6377298.556, 300.8017),  # Everest 1830 (Sabah/Sarawak)
}


def _ellipsoid(params: dict) -> tuple[float, float]:
    """proj4 ellipsoid params -> (a, e2). Defaults to WGS84."""
    if "R" in params:  # explicit sphere radius
        return float(str(params["R"])), 0.0
    if "a" in params:
        a = float(str(params["a"]))
        if "b" in params:
            b = float(str(params["b"]))
            f = (a - b) / a
        elif "rf" in params:
            f = 1.0 / float(str(params["rf"]))
        elif "f" in params:
            f = float(str(params["f"]))
        else:
            f = 0.0  # sphere
        return a, f * (2.0 - f)
    tag = str(params.get("ellps", params.get("datum", "WGS84")))
    if tag in _ELLPS:
        a, rf = _ELLPS[tag]
        f = 1.0 / rf
        return a, f * (2.0 - f)
    return WGS84_A, WGS84_E2


def _towgs84(params: dict):
    if "towgs84" not in params:
        return None
    vals = tuple(float(v) for v in str(params["towgs84"]).split(","))
    if len(vals) == 3:
        vals = vals + (0.0, 0.0, 0.0, 0.0)
    if len(vals) != 7:
        raise ValueError(f"+towgs84 needs 3 or 7 values, got {len(vals)}")
    return vals


# EPSG:3571-3576 North Pole LAEA regional grids: the central meridian
# is the only varying parameter (Bering Sea / Alaska / Canada / Atlantic
# / Europe / Russia).
_NP_LAEA_LON0 = {
    "epsg:3571": 180.0, "epsg:3572": -150.0, "epsg:3573": -100.0,
    "epsg:3574": -40.0, "epsg:3575": 10.0, "epsg:3576": 90.0,
}


def parse_proj4(s: str) -> dict:
    s = s.strip()
    params: dict[str, str | bool] = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            params[k] = v
        elif tok.lower().startswith("epsg:"):
            # ADVICE r5: bare 'epsg:NNNN' (no '+init=') must not fall
            # through to the longlat default as a silent no-op.
            params["init"] = tok.lower()
        else:
            params[tok] = True
    if "init" in params:
        epsg = str(params["init"]).lower()
        if epsg in ("epsg:4326",):
            return {"proj": "longlat"}
        if epsg in ("epsg:3857", "epsg:900913"):
            return {"proj": "merc", "spherical": True}
        if epsg in ("epsg:3395",):
            return {"proj": "merc", "spherical": False}
        if epsg in ("epsg:4087", "epsg:32662"):  # World Equidistant Cyl /
            return {  # Plate Carrée on the WGS84 semi-major axis
                "proj": "eqc", "lat_ts": 0.0, "lat_0": 0.0, "lon_0": 0.0,
                "x_0": 0.0, "y_0": 0.0, "a": WGS84_A, "e2": WGS84_E2,
                "towgs84": None,
            }
        if epsg.startswith("epsg:326") or epsg.startswith("epsg:327"):
            zone = int(epsg[8:])
            return {"proj": "utm", "zone": zone, "south": epsg.startswith("epsg:327")}
        if epsg == "epsg:27200":  # NZGD49 / New Zealand Map Grid
            return parse_proj4("+proj=nzmg")
        if epsg == "epsg:5514":  # S-JTSK / Krovak East North
            return parse_proj4("+proj=krovak +towgs84=589,76,480")
        if epsg == "epsg:6933":  # WGS 84 / NSIDC EASE-Grid 2.0 Global
            return parse_proj4(
                "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0"
                " +ellps=WGS84 +towgs84=0,0,0"
            )
        if epsg == "epsg:3035":  # ETRS89-extended / LAEA Europe
            return parse_proj4(
                "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000"
                " +ellps=GRS80 +towgs84=0,0,0"
            )
        if epsg in _NP_LAEA_LON0:  # WGS84 / North Pole LAEA grids
            return parse_proj4(
                f"+proj=laea +lat_0=90 +lon_0={_NP_LAEA_LON0[epsg]}"
                " +x_0=0 +y_0=0 +ellps=WGS84 +towgs84=0,0,0"
            )
        if epsg == "epsg:2193":  # NZGD2000 / NZTM2000
            return parse_proj4(
                "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996"
                " +x_0=1600000 +y_0=10000000 +ellps=GRS80"
            )
        raise NotImplementedError(f"unsupported +init {epsg}")
    proj = str(params.get("proj", "longlat"))
    if proj in ("longlat", "latlong", "lonlat"):
        a, e2 = _ellipsoid(params)
        return {"proj": "longlat", "a": a, "e2": e2, "towgs84": _towgs84(params)}
    if proj == "merc":
        # web mercator is declared spherical via +R, +a==+b, or +nadgrids
        spherical = (
            "R" in params
            or params.get("a") == params.get("b") == "6378137"
            or "nadgrids" in params
            or params.get("k") in ("1.0", "1")
            and "lat_ts" not in params
            and params.get("a") == "6378137"
        )
        # proj4 semantics: bare '+proj=merc' defaults to the WGS84
        # ELLIPSOID (EPSG:3395-style); spherical only on explicit hints
        # (+R / +a==+b / +nadgrids / the web-merc k=1,a=6378137 combo).
        # ADVICE r2: the old '+ellps absent => spherical' fallback was a
        # ~20 km northing error vs mapnik::proj_transform.
        return {"proj": "merc", "spherical": bool(spherical)}
    if proj == "utm":
        a, e2 = _ellipsoid(params)
        return {
            "proj": "utm",
            "zone": int(str(params["zone"])),
            "south": bool(params.get("south", False)),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "tmerc":
        a, e2 = _ellipsoid(params)
        return {
            "proj": "tmerc",
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "k": float(str(params.get("k", params.get("k_0", 1.0)))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "lcc":
        a, e2 = _ellipsoid(params)
        lat_1 = float(str(params.get("lat_1", 0.0)))
        return {
            "proj": "lcc",
            "lat_1": lat_1,
            "lat_2": float(str(params.get("lat_2", lat_1))),
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "k": float(str(params.get("k", params.get("k_0", 1.0)))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "stere":
        a, e2 = _ellipsoid(params)
        lat_0 = float(str(params.get("lat_0", 90.0)))
        if abs(lat_0) != 90.0:
            # oblique/equatorial aspect (r5): conformal-latitude method
            return {
                "proj": "stere_ob",
                "lat_0": lat_0,
                "lon_0": float(str(params.get("lon_0", 0.0))),
                "k": float(str(params.get("k", params.get("k_0", 1.0)))),
                "x_0": float(str(params.get("x_0", 0.0))),
                "y_0": float(str(params.get("y_0", 0.0))),
                "a": a, "e2": e2,
                "towgs84": _towgs84(params),
            }
        return {
            "proj": "stere",
            "south": lat_0 < 0,
            "lat_ts": (
                float(str(params["lat_ts"])) if "lat_ts" in params else None
            ),
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "k": float(str(params.get("k", params.get("k_0", 1.0)))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "eqc":
        a, e2 = _ellipsoid(params)
        return {
            "proj": "eqc",
            "lat_ts": float(str(params.get("lat_ts", 0.0))),
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "cass":
        a, e2 = _ellipsoid(params)
        return {
            "proj": "cass",
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "aeqd":
        a, e2 = _ellipsoid(params)
        return {
            "proj": "aeqd",
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "omerc":
        a, e2 = _ellipsoid(params)
        if "lon_1" in params or "lat_1" in params:
            # two-point form (Snyder ch. 9 eqs. 9-16..9-24): reduce to
            # the azimuth form at parse time — compute the central-line
            # azimuth at the aposphere origin and the longitude of the
            # projection centre, then reuse the same fwd/inv machinery.
            lat_0 = float(str(params.get("lat_0", 0.0)))
            lat_1 = float(str(params["lat_1"]))
            lon_1 = float(str(params["lon_1"]))
            lat_2 = float(str(params["lat_2"]))
            lon_2 = float(str(params["lon_2"]))
            k = float(str(params.get("k", params.get("k_0", 1.0))))
            alpha_c, gamma0, lonc = _omerc_from_two_points(
                a, e2, lat_0, lat_1, lon_1, lat_2, lon_2
            )
            return {
                "proj": "omerc",
                "lat_0": lat_0,
                "lonc": lonc,
                "alpha": alpha_c,
                "gamma": gamma0,
                "k": k,
                "x_0": float(str(params.get("x_0", 0.0))),
                "y_0": float(str(params.get("y_0", 0.0))),
                "no_off": bool(params.get("no_off", params.get("no_uoff", False))),
                "a": a, "e2": e2,
                "towgs84": _towgs84(params),
            }
        alpha = float(str(params.get("alpha", 90.0)))
        return {
            "proj": "omerc",
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "lonc": float(str(params.get("lonc", 0.0))),
            "alpha": alpha,
            "gamma": float(str(params.get("gamma", alpha))),
            "k": float(str(params.get("k", params.get("k_0", 1.0)))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "no_off": bool(params.get("no_off", params.get("no_uoff", False))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "krovak":
        # EPSG method 9819 (S-JTSK). proj4's krovak hard-wired Bessel
        # 1841; honor an explicit ellipsoid but default to bessel.
        if not any(k in params for k in ("ellps", "a", "b", "rf", "R")):
            a_, rf_ = _ELLPS["bessel"]
            f_ = 1.0 / rf_
            a, e2 = a_, f_ * (2.0 - f_)
        else:
            a, e2 = _ellipsoid(params)
        return {
            "proj": "krovak",
            # latitude of projection centre and longitude of origin
            # (42d30' East of Ferro == 24d50' East of Greenwich)
            "lat_0": float(str(params.get("lat_0", 49.5))),
            "lon_0": float(str(params.get("lon_0", 24.833333333333332))),
            # azimuth of the oblique cone axis at the centre
            "alpha": float(str(params.get("alpha", 30.28813972222222))),
            # scale on the pseudo-standard parallel (78d30'N)
            "k": float(str(params.get("k", params.get("k_0", 0.9999)))),
            "lat_ts": float(str(params.get("lat_ts", 78.5))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "sinu":
        a, e2 = _ellipsoid(params)
        return {
            "proj": "sinu",
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "moll":
        # classic proj4 mollweide is spherical: the ellipsoid's
        # semi-major axis is used as the sphere radius (es forced 0)
        a, _e2 = _ellipsoid(params)
        return {
            "proj": "moll",
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": 0.0,
            "towgs84": _towgs84(params),
        }
    if proj == "eck4":
        # spherical (proj4-classic): es forced 0, a as the radius
        a, _e2 = _ellipsoid(params)
        return {
            "proj": "eck4",
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": 0.0,
            "towgs84": _towgs84(params),
        }
    if proj in ("gnom", "ortho"):
        # spherical (proj4-classic): the ellipsoid's a is the radius
        a, _e2 = _ellipsoid(params)
        return {
            "proj": proj,
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": 0.0,
            "towgs84": _towgs84(params),
        }
    if proj == "cea":
        a, e2 = _ellipsoid(params)
        return {
            "proj": "cea",
            "lat_ts": float(str(params.get("lat_ts", 0.0))),
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "laea":
        a, e2 = _ellipsoid(params)
        return {
            "proj": "laea",
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
            "a": a, "e2": e2,
            "towgs84": _towgs84(params),
        }
    if proj == "nzmg":
        # fixed definition (LINZS25002): International 1924, origin
        # 41°S 173°E, FE 2 510 000 / FN 6 023 150
        a, rf = _ELLPS["intl"]
        f = 1.0 / rf
        return {
            "proj": "nzmg",
            "x_0": float(str(params.get("x_0", 2510000.0))),
            "y_0": float(str(params.get("y_0", 6023150.0))),
            "a": a, "e2": f * (2.0 - f),
            "towgs84": _towgs84(params),
        }
    raise NotImplementedError(f"unsupported +proj {proj}")


# --- merc ---------------------------------------------------------------------

def _merc_fwd(lon, lat, spherical: bool):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -89.9999, 89.9999)
    x = WGS84_A * np.radians(lon)
    phi = np.radians(lat)
    if spherical:
        y = WGS84_A * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
    else:
        e = math.sqrt(WGS84_E2)
        esin = e * np.sin(phi)
        y = WGS84_A * (
            np.log(np.tan(np.pi / 4.0 + phi / 2.0))
            - (e / 2.0) * np.log((1.0 + esin) / (1.0 - esin))
        )
    return x, y


def _merc_inv(x, y, spherical: bool):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / WGS84_A)
    t = np.exp(-np.asarray(y, dtype=np.float64) / WGS84_A)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    if not spherical:
        e = math.sqrt(WGS84_E2)
        for _ in range(6):  # standard fixed-point iteration
            esin = e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * np.power((1.0 - esin) / (1.0 + esin), e / 2.0)
            )
    return lon, np.degrees(phi)


# --- tmerc (Krüger series, Karney 2011 order-4 coefficients) ------------------

from functools import lru_cache


@lru_cache(maxsize=32)
def _tmerc_consts(a: float, e2: float):
    """(A_CAP, alpha[4], beta[4]) for an ellipsoid — n^4 series, exact
    enough for sub-millimetre inside a UTM-width zone on any national
    ellipsoid (airy/bessel/intl/GRS80/WGS84)."""
    f = 1.0 - math.sqrt(1.0 - e2)
    n = f / (2.0 - f)
    a_cap = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    alpha = [
        n / 2.0 - 2.0 / 3.0 * n**2 + 5.0 / 16.0 * n**3 + 41.0 / 180.0 * n**4,
        13.0 / 48.0 * n**2 - 3.0 / 5.0 * n**3 + 557.0 / 1440.0 * n**4,
        61.0 / 240.0 * n**3 - 103.0 / 140.0 * n**4,
        49561.0 / 161280.0 * n**4,
    ]
    beta = [
        n / 2.0 - 2.0 / 3.0 * n**2 + 37.0 / 96.0 * n**3 - 1.0 / 360.0 * n**4,
        1.0 / 48.0 * n**2 + 1.0 / 15.0 * n**3 - 437.0 / 1440.0 * n**4,
        17.0 / 480.0 * n**3 - 37.0 / 840.0 * n**4,
        4397.0 / 161280.0 * n**4,
    ]
    return a_cap, alpha, beta


def _tmerc_fwd(lon, lat, lon0: float, k0: float, x0: float, y0: float,
               a: float = WGS84_A, e2: float = WGS84_E2):
    a_cap, alpha, _beta = _tmerc_consts(a, e2)
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    e = math.sqrt(e2)
    # conformal latitude
    t = np.sinh(
        np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi))
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, av in enumerate(alpha, start=1):
        xi += av * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += av * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = x0 + k0 * a_cap * eta
    y = y0 + k0 * a_cap * xi
    return x, y


def _tmerc_inv(x, y, lon0: float, k0: float, x0: float, y0: float,
               a: float = WGS84_A, e2: float = WGS84_E2):
    a_cap, _alpha, beta = _tmerc_consts(a, e2)
    eta = (np.asarray(x, dtype=np.float64) - x0) / (k0 * a_cap)
    xi = (np.asarray(y, dtype=np.float64) - y0) / (k0 * a_cap)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    e = math.sqrt(e2)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for _ in range(6):  # invert the conformal latitude
        phi = phi + (
            chi - (np.arctan(np.sinh(
                np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi))
            )))
        )
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0, np.degrees(phi)


# --- lcc (Lambert Conformal Conic, ellipsoidal 2SP/1SP — Snyder
# eq. 15-1..15-11; the most common national-grid family after UTM) -------------

def _lcc_consts(crs: dict):
    a, e2 = crs["a"], crs["e2"]
    e = math.sqrt(e2)

    def m(phi):
        return math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)

    def t_of(phi):
        esin = e * math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            (1.0 - esin) / (1.0 + esin)
        ) ** (e / 2.0)

    p1 = math.radians(crs["lat_1"])
    p2 = math.radians(crs["lat_2"])
    p0 = math.radians(crs["lat_0"])
    if abs(p1 - p2) < 1e-12:
        n = math.sin(p1)
    else:
        n = (math.log(m(p1)) - math.log(m(p2))) / (
            math.log(t_of(p1)) - math.log(t_of(p2))
        )
    F = m(p1) / (n * t_of(p1) ** n)
    rho0 = a * crs["k"] * F * t_of(p0) ** n
    return a, e, n, F, rho0


def _t_arr(phi: np.ndarray, e: float) -> np.ndarray:
    esin = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / np.power(
        (1.0 - esin) / (1.0 + esin), e / 2.0
    )


def _phi_from_t(t: np.ndarray, e: float) -> np.ndarray:
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        esin = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * np.power((1.0 - esin) / (1.0 + esin), e / 2.0)
        )
    return phi


def _lcc_fwd(crs: dict, lon, lat):
    a, e, n, F, rho0 = _lcc_consts(crs)
    lam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = a * crs["k"] * F * np.power(_t_arr(phi, e), n)
    theta = n * lam
    return (
        crs["x_0"] + rho * np.sin(theta),
        crs["y_0"] + rho0 - rho * np.cos(theta),
    )


def _lcc_inv(crs: dict, x, y):
    a, e, n, F, rho0 = _lcc_consts(crs)
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = rho0 - (np.asarray(y, dtype=np.float64) - crs["y_0"])
    rho = np.sign(n) * np.hypot(dx, dy)
    theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    t = np.power(rho / (a * crs["k"] * F), 1.0 / n)
    phi = _phi_from_t(t, e)
    return np.degrees(theta / n) + crs["lon_0"], np.degrees(phi)


# --- stere (polar stereographic, ellipsoidal — Snyder eq. 21-33..21-41,
# the NSIDC/Antarctic grid family) ---------------------------------------------

def _stere_rho(crs: dict, t: np.ndarray) -> np.ndarray:
    a, e2 = crs["a"], crs["e2"]
    e = math.sqrt(e2)
    if crs["lat_ts"] is not None:
        pc = math.radians(abs(crs["lat_ts"]))
        m_c = math.cos(pc) / math.sqrt(1.0 - e2 * math.sin(pc) ** 2)
        t_c = float(_t_arr(np.asarray([pc]), e)[0])
        return a * m_c * t / t_c
    return (
        2.0 * a * crs["k"] * t
        / math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
    )


def _stere_fwd(crs: dict, lon, lat):
    e = math.sqrt(crs["e2"])
    sgn = -1.0 if crs["south"] else 1.0
    lam = sgn * np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    phi = sgn * np.radians(np.asarray(lat, dtype=np.float64))
    rho = _stere_rho(crs, _t_arr(phi, e))
    return (
        crs["x_0"] + sgn * rho * np.sin(lam),
        crs["y_0"] - sgn * rho * np.cos(lam),
    )


def _stere_inv(crs: dict, x, y):
    e = math.sqrt(crs["e2"])
    sgn = -1.0 if crs["south"] else 1.0
    dx = sgn * (np.asarray(x, dtype=np.float64) - crs["x_0"])
    dy = sgn * (np.asarray(y, dtype=np.float64) - crs["y_0"])
    rho = np.hypot(dx, dy)
    one = np.ones(1, dtype=np.float64)
    unit = float(_stere_rho(crs, one)[0])  # rho is linear in t
    t = rho / unit
    phi = _phi_from_t(t, e)
    lam = np.arctan2(dx, -dy)
    lon = crs["lon_0"] + sgn * np.degrees(lam)
    return (lon + 180.0) % 360.0 - 180.0, sgn * np.degrees(phi)


# --- stere_ob (oblique/equatorial stereographic, ellipsoidal — Snyder
# eq. 3-1, 21-24..21-31 forward and 21-38..21-40 + 3-5 inverse: the
# conformal-latitude method, which maps the ellipsoid conformally to a
# sphere and applies the exact spherical oblique stereographic there;
# completes the any-proj4 stere contract of vector_tile_strategy.hpp:69-104.
# Pinned in tests by an INDEPENDENT derivation: on the conformal sphere
# the image of any point must sit at radius 2*R'*tan(c/2) and azimuth
# alpha from the center, with (c, alpha) computed by plain spherical
# trigonometry — no shared code with the forward formulas.) ------------------

def _conformal_lat(phi: np.ndarray, e: float) -> np.ndarray:
    """Snyder eq. 3-1: geodetic -> conformal latitude chi (radians)."""
    esin = e * np.sin(phi)
    return (
        2.0 * np.arctan(
            np.tan(np.pi / 4.0 + phi / 2.0)
            * np.power((1.0 - esin) / (1.0 + esin), e / 2.0)
        )
        - np.pi / 2.0
    )


def _phi_from_conformal(chi: np.ndarray, e: float) -> np.ndarray:
    """Snyder eq. 3-4 iteration: conformal -> geodetic latitude."""
    phi = chi.copy()
    for _ in range(8):
        esin = e * np.sin(phi)
        phi = (
            2.0 * np.arctan(
                np.tan(np.pi / 4.0 + chi / 2.0)
                * np.power((1.0 + esin) / (1.0 - esin), e / 2.0)
            )
            - np.pi / 2.0
        )
    return phi


def _stere_ob_consts(crs: dict) -> tuple[float, float, float]:
    """(chi1, sin/cos-free helpers): conformal center latitude and the
    2*a*k0*m1 scale numerator (Snyder 21-27's A shares them per-CRS)."""
    e = math.sqrt(crs["e2"])
    phi1 = math.radians(crs["lat_0"])
    chi1 = float(_conformal_lat(np.asarray([phi1]), e)[0])
    m1 = math.cos(phi1) / math.sqrt(1.0 - crs["e2"] * math.sin(phi1) ** 2)
    return chi1, m1, 2.0 * crs["a"] * crs["k"] * m1


def _stere_ob_fwd(crs: dict, lon, lat):
    e = math.sqrt(crs["e2"])
    chi1, _m1, num = _stere_ob_consts(crs)
    sc1, cc1 = math.sin(chi1), math.cos(chi1)
    lam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    chi = _conformal_lat(np.radians(np.asarray(lat, dtype=np.float64)), e)
    sch, cch = np.sin(chi), np.cos(chi)
    A = num / (cc1 * (1.0 + sc1 * sch + cc1 * cch * np.cos(lam)))  # 21-27
    x = A * cch * np.sin(lam)                                      # 21-24
    y = A * (cc1 * sch - sc1 * cch * np.cos(lam))                  # 21-25
    return crs["x_0"] + x, crs["y_0"] + y


def _stere_ob_inv(crs: dict, x, y):
    e = math.sqrt(crs["e2"])
    chi1, _m1, num = _stere_ob_consts(crs)
    sc1, cc1 = math.sin(chi1), math.cos(chi1)
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    rho = np.hypot(dx, dy)
    ce = 2.0 * np.arctan2(rho * cc1, num)                          # 21-38
    sce, cce = np.sin(ce), np.cos(ce)
    safe = np.where(rho == 0.0, 1.0, rho)
    chi = np.arcsin(
        np.where(rho == 0.0, sc1, cce * sc1 + dy * sce * cc1 / safe)
    )                                                              # 21-39
    lam = np.arctan2(dx * sce, rho * cc1 * cce - dy * sc1 * sce)   # 21-40
    phi = _phi_from_conformal(chi, e)
    lon = crs["lon_0"] + np.degrees(np.where(rho == 0.0, 0.0, lam))
    return (lon + 180.0) % 360.0 - 180.0, np.degrees(phi)


# --- aeqd (azimuthal equidistant — Snyder ch. 25: r = geodesic distance
# from the center, theta = forward azimuth. Sphere: exact closed form
# (25-2..25-4). Ellipsoid, polar aspect: meridian-arc rho (25-9/25-16,
# series 3-21). Ellipsoid, oblique: geodesic inverse/direct problems
# (Vincenty 1975, the published iteration PROJ's aeqd 'e_fwd/e_inv' legs
# correspond to) — x = s*sin(az1), y = s*cos(az1). Tests pin the sphere
# limit, a numeric-quadrature meridian-arc oracle, and geodesic
# self-consistency; near-antipodal points (where Vincenty's inverse is
# known not to converge) are outside the projection's useful domain. ---

def _merid_arc(phi: np.ndarray, a: float, e2: float) -> np.ndarray:
    """Meridian arc length from the equator (Snyder eq. 3-21)."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def _inv_merid_arc(m: np.ndarray, a: float, e2: float) -> np.ndarray:
    """Footpoint latitude of a meridian arc length (Snyder 3-24, 3-26)."""
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 ** 3 / 256))
    return (
        mu
        + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
        + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
        + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
        + (1097 * e1 ** 4 / 512) * np.sin(8 * mu)
    )


def _vincenty_inverse(phi1: float, lam1: float, phi2, lam2, a: float, e2: float):
    """(s, alpha1) of the geodesic from a FIXED point 1 to points 2
    (vectorized Vincenty 1975 inverse)."""
    f = 1.0 - math.sqrt(1.0 - e2)
    b = a * (1.0 - f)
    U1 = math.atan((1 - f) * math.tan(phi1))
    sU1, cU1 = math.sin(U1), math.cos(U1)
    U2 = np.arctan((1 - f) * np.tan(np.asarray(phi2, dtype=np.float64)))
    sU2, cU2 = np.sin(U2), np.cos(U2)
    L = np.asarray(lam2, dtype=np.float64) - lam1
    L = (L + np.pi) % (2 * np.pi) - np.pi
    lam = L.copy()
    for _ in range(60):
        sl, cl = np.sin(lam), np.cos(lam)
        sin_sig = np.hypot(cU2 * sl, cU1 * sU2 - sU1 * cU2 * cl)
        cos_sig = sU1 * sU2 + cU1 * cU2 * cl
        sig = np.arctan2(sin_sig, cos_sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alp = np.where(sin_sig == 0, 0.0, cU1 * cU2 * sl / sin_sig)
        cos2_alp = 1.0 - sin_alp ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_2sm = np.where(
                cos2_alp == 0, 0.0, cos_sig - 2 * sU1 * sU2 / np.where(cos2_alp == 0, 1.0, cos2_alp)
            )
        C = f / 16 * cos2_alp * (4 + f * (4 - 3 * cos2_alp))
        lam_new = L + (1 - C) * f * sin_alp * (
            sig + C * sin_sig * (cos_2sm + C * cos_sig * (-1 + 2 * cos_2sm ** 2))
        )
        if np.all(np.abs(lam_new - lam) < 1e-14):
            lam = lam_new
            break
        lam = lam_new
    sl, cl = np.sin(lam), np.cos(lam)
    sin_sig = np.hypot(cU2 * sl, cU1 * sU2 - sU1 * cU2 * cl)
    cos_sig = sU1 * sU2 + cU1 * cU2 * cl
    sig = np.arctan2(sin_sig, cos_sig)
    with np.errstate(divide="ignore", invalid="ignore"):
        sin_alp = np.where(sin_sig == 0, 0.0, cU1 * cU2 * sl / sin_sig)
    cos2_alp = 1.0 - sin_alp ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        cos_2sm = np.where(
            cos2_alp == 0, 0.0, cos_sig - 2 * sU1 * sU2 / np.where(cos2_alp == 0, 1.0, cos2_alp)
        )
    u2 = cos2_alp * (a * a - b * b) / (b * b)
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    dsig = B * sin_sig * (
        cos_2sm
        + B / 4 * (
            cos_sig * (-1 + 2 * cos_2sm ** 2)
            - B / 6 * cos_2sm * (-3 + 4 * sin_sig ** 2) * (-3 + 4 * cos_2sm ** 2)
        )
    )
    s = b * A * (sig - dsig)
    alpha1 = np.arctan2(cU2 * sl, cU1 * sU2 - sU1 * cU2 * cl)
    return s, alpha1


def _vincenty_direct(phi1: float, lam1: float, alpha1, s, a: float, e2: float):
    """Point at azimuth alpha1 / distance s from a FIXED point 1
    (vectorized Vincenty 1975 direct)."""
    f = 1.0 - math.sqrt(1.0 - e2)
    b = a * (1.0 - f)
    U1 = math.atan((1 - f) * math.tan(phi1))
    sU1, cU1 = math.sin(U1), math.cos(U1)
    alpha1 = np.asarray(alpha1, dtype=np.float64)
    s = np.asarray(s, dtype=np.float64)
    sa1, ca1 = np.sin(alpha1), np.cos(alpha1)
    sig1 = np.arctan2(sU1, cU1 * ca1)
    sin_alp = cU1 * sa1
    cos2_alp = 1.0 - sin_alp ** 2
    u2 = cos2_alp * (a * a - b * b) / (b * b)
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    sig = s / (b * A)
    for _ in range(60):
        cos_2sm = np.cos(2 * sig1 + sig)
        sin_sig, cos_sig = np.sin(sig), np.cos(sig)
        dsig = B * sin_sig * (
            cos_2sm
            + B / 4 * (
                cos_sig * (-1 + 2 * cos_2sm ** 2)
                - B / 6 * cos_2sm * (-3 + 4 * sin_sig ** 2) * (-3 + 4 * cos_2sm ** 2)
            )
        )
        sig_new = s / (b * A) + dsig
        if np.all(np.abs(sig_new - sig) < 1e-14):
            sig = sig_new
            break
        sig = sig_new
    sin_sig, cos_sig = np.sin(sig), np.cos(sig)
    cos_2sm = np.cos(2 * sig1 + sig)
    phi2 = np.arctan2(
        sU1 * cos_sig + cU1 * sin_sig * ca1,
        (1 - f) * np.hypot(sin_alp, sU1 * sin_sig - cU1 * cos_sig * ca1),
    )
    lam = np.arctan2(sin_sig * sa1, cU1 * cos_sig - sU1 * sin_sig * ca1)
    C = f / 16 * cos2_alp * (4 + f * (4 - 3 * cos2_alp))
    L = lam - (1 - C) * f * sin_alp * (
        sig + C * sin_sig * (cos_2sm + C * cos_sig * (-1 + 2 * cos_2sm ** 2))
    )
    return phi2, lam1 + L


# --- eqc (equirectangular / equidistant cylindrical — Snyder eq. 12-1..12-6,
# the proj4 spherical formulation with the ellipsoid's semi-major axis:
# x = a (lam - lam0) cos(lat_ts), y = a (phi - lat_0). EPSG:32662 /
# EPSG:4087 Plate Carrée family.) ---------------------------------------------

def _eqc_fwd(crs: dict, lon, lat):
    a = crs["a"]
    lam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    c = math.cos(math.radians(crs["lat_ts"]))
    return (
        crs["x_0"] + a * lam * c,
        crs["y_0"] + a * (phi - math.radians(crs["lat_0"])),
    )


def _eqc_inv(crs: dict, x, y):
    a = crs["a"]
    c = math.cos(math.radians(crs["lat_ts"]))
    lon = crs["lon_0"] + np.degrees(
        (np.asarray(x, dtype=np.float64) - crs["x_0"]) / (a * c)
    )
    lat = crs["lat_0"] + np.degrees(
        (np.asarray(y, dtype=np.float64) - crs["y_0"]) / a
    )
    return (lon + 180.0) % 360.0 - 180.0, lat


# --- cass (Cassini-Soldner, ellipsoidal series — Snyder eq. 13-7/13-8
# forward, 13-9..13-12 inverse; the historic national cadastral grids,
# e.g. older UK county series / Malaysia cassini states). Valid within a
# few degrees of the central meridian, like the projection itself. -----------

def _cass_fwd(crs: dict, lon, lat):
    a, e2 = crs["a"], crs["e2"]
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    lam = (lam + np.pi) % (2 * np.pi) - np.pi
    sin_p, cos_p = np.sin(phi), np.cos(phi)
    N = a / np.sqrt(1 - e2 * sin_p ** 2)
    T = np.tan(phi) ** 2
    A = lam * cos_p
    C = e2 * cos_p ** 2 / (1 - e2) if e2 else np.zeros_like(phi)
    x = N * (A - T * A ** 3 / 6 - (8 - T + 8 * C) * T * A ** 5 / 120)
    m0 = float(_merid_arc(np.asarray([math.radians(crs["lat_0"])]), a, e2)[0])
    y = _merid_arc(phi, a, e2) - m0 + N * np.tan(phi) * (
        A ** 2 / 2 + (5 - T + 6 * C) * A ** 4 / 24
    )
    return crs["x_0"] + x, crs["y_0"] + y


def _cass_inv(crs: dict, x, y):
    a, e2 = crs["a"], crs["e2"]
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    m0 = float(_merid_arc(np.asarray([math.radians(crs["lat_0"])]), a, e2)[0])
    phi1 = _inv_merid_arc(m0 + dy, a, e2)
    sin1, cos1 = np.sin(phi1), np.cos(phi1)
    T1 = np.tan(phi1) ** 2
    N1 = a / np.sqrt(1 - e2 * sin1 ** 2)
    R1 = a * (1 - e2) / np.power(1 - e2 * sin1 ** 2, 1.5)
    D = dx / N1
    phi = phi1 - (N1 * np.tan(phi1) / R1) * (
        D ** 2 / 2 - (1 + 3 * T1) * D ** 4 / 24
    )
    lam = (D - T1 * D ** 3 / 3 + (1 + 3 * T1) * T1 * D ** 5 / 15) / cos1
    lon = crs["lon_0"] + np.degrees(lam)
    return (lon + 180.0) % 360.0 - 180.0, np.degrees(phi)


def _aeqd_fwd(crs: dict, lon, lat):
    a, e2 = crs["a"], crs["e2"]
    phi1 = math.radians(crs["lat_0"])
    lam1 = math.radians(crs["lon_0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    if e2 == 0.0:
        dl = lam - lam1
        cosc = math.sin(phi1) * np.sin(phi) + math.cos(phi1) * np.cos(phi) * np.cos(dl)
        c = np.arccos(np.clip(cosc, -1.0, 1.0))
        az = np.arctan2(
            np.sin(dl) * np.cos(phi),
            math.cos(phi1) * np.sin(phi) - math.sin(phi1) * np.cos(phi) * np.cos(dl),
        )
        r = a * c
        return crs["x_0"] + r * np.sin(az), crs["y_0"] + r * np.cos(az)
    if abs(crs["lat_0"]) == 90.0:  # polar: rho = meridian arc to the pole
        sgn = 1.0 if crs["lat_0"] > 0 else -1.0
        mp = float(_merid_arc(np.asarray([math.pi / 2.0]), a, e2)[0])
        rho = mp - sgn * _merid_arc(phi, a, e2)
        dl = lam - lam1
        return (
            crs["x_0"] + rho * np.sin(dl),
            crs["y_0"] - sgn * rho * np.cos(dl),
        )
    s, az1 = _vincenty_inverse(phi1, lam1, phi, lam, a, e2)
    return crs["x_0"] + s * np.sin(az1), crs["y_0"] + s * np.cos(az1)


def _aeqd_inv(crs: dict, x, y):
    a, e2 = crs["a"], crs["e2"]
    phi1 = math.radians(crs["lat_0"])
    lam1 = math.radians(crs["lon_0"])
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    rho = np.hypot(dx, dy)
    if e2 == 0.0:
        c = rho / a
        safe = np.where(rho == 0, 1.0, rho)
        phi = np.arcsin(
            np.where(
                rho == 0, math.sin(phi1),
                np.cos(c) * math.sin(phi1) + dy * np.sin(c) * math.cos(phi1) / safe,
            )
        )
        lam = lam1 + np.arctan2(
            dx * np.sin(c),
            rho * math.cos(phi1) * np.cos(c) - dy * math.sin(phi1) * np.sin(c),
        )
        lam = np.where(rho == 0, lam1, lam)
        return (np.degrees(lam) + 180.0) % 360.0 - 180.0, np.degrees(phi)
    if abs(crs["lat_0"]) == 90.0:
        sgn = 1.0 if crs["lat_0"] > 0 else -1.0
        mp = float(_merid_arc(np.asarray([math.pi / 2.0]), a, e2)[0])
        phi = sgn * _inv_merid_arc(mp - rho, a, e2)
        lam = lam1 + np.arctan2(dx, -sgn * dy)
        return (np.degrees(lam) + 180.0) % 360.0 - 180.0, np.degrees(phi)
    az1 = np.arctan2(dx, dy)
    phi, lam = _vincenty_direct(phi1, lam1, az1, rho, a, e2)
    phi = np.where(rho == 0, phi1, phi)
    lam = np.where(rho == 0, lam1, lam)
    return (np.degrees(lam) + 180.0) % 360.0 - 180.0, np.degrees(phi)


# --- omerc (Hotine oblique Mercator, azimuth form — Snyder ch. 9 /
# EPSG Guidance Note 7-2 variants A (+no_off) and B; the Malaysian RSO
# and Alaska panhandle grids) --------------------------------------------------

def _omerc_from_two_points(
    a: float, e2: float,
    lat_0: float, lat_1: float, lon_1: float, lat_2: float, lon_2: float,
) -> tuple[float, float, float]:
    """Snyder eqs. 9-16..9-24: central line through two points ->
    (alpha_c, gamma_0, lonc) in degrees, so the azimuth-form constants
    reproduce the same line (lam0 and gamma0 round-trip exactly through
    _omerc_consts' lonc -> lam0 relation)."""
    e = math.sqrt(e2)
    phi0 = math.radians(lat_0)
    sphi0, cphi0 = math.sin(phi0), math.cos(phi0)
    B = math.sqrt(1.0 + e2 * cphi0**4 / (1.0 - e2))
    t0 = float(_t_arr(np.asarray([phi0]), e)[0])
    D = B * math.sqrt(1.0 - e2) / (cphi0 * math.sqrt(1.0 - e2 * sphi0**2))
    D2 = max(D * D, 1.0)
    sign = 1.0 if phi0 >= 0.0 else -1.0
    Fc = D + math.sqrt(D2 - 1.0) * sign
    E = Fc * t0**B
    t1 = float(_t_arr(np.asarray([math.radians(lat_1)]), e)[0])
    t2 = float(_t_arr(np.asarray([math.radians(lat_2)]), e)[0])
    H = t1**B
    L = t2**B
    F = E / H
    G = (F - 1.0 / F) / 2.0
    J = (E * E - L * H) / (E * E + L * H)
    P = (L - H) / (L + H)
    lam1, lam2 = math.radians(lon_1), math.radians(lon_2)
    dlam = lam1 - lam2
    dlam = (dlam + math.pi) % (2.0 * math.pi) - math.pi
    # Snyder 9-23 takes the PRINCIPAL arctan branch. P -> 0 when the two
    # points share a latitude (an east-west central line): the arctan's
    # limit is +/- pi/2 with the numerator's sign.
    num = J * math.tan(B * dlam / 2.0)
    if abs(P) < 1e-14:
        at = math.copysign(math.pi / 2.0, num) if num else 0.0
    else:
        at = math.atan(num / P)
    lam0 = (lam1 + lam2) / 2.0 - at / B
    gamma0 = math.atan2(math.sin(B * ((lam1 - lam0 + math.pi) %
                                      (2.0 * math.pi) - math.pi)), G)
    alpha_c = math.asin(max(-1.0, min(1.0, D * math.sin(gamma0))))
    # back-convert to the azimuth form's lonc with ITS G (from Fc, not
    # the two-point E/H ratio) so _omerc_consts reproduces lam0 exactly
    g_az = (Fc - 1.0 / Fc) / 2.0
    lonc = lam0 + math.asin(
        max(-1.0, min(1.0, g_az * math.tan(gamma0)))
    ) / B
    return math.degrees(alpha_c), math.degrees(gamma0), math.degrees(lonc)


def _omerc_consts(crs: dict):
    a, e2 = crs["a"], crs["e2"]
    e = math.sqrt(e2)
    phi0 = math.radians(crs["lat_0"])
    alpha = math.radians(crs["alpha"])
    sphi0, cphi0 = math.sin(phi0), math.cos(phi0)
    B = math.sqrt(1.0 + e2 * cphi0**4 / (1.0 - e2))
    A = a * B * crs["k"] * math.sqrt(1.0 - e2) / (1.0 - e2 * sphi0**2)
    t0 = float(_t_arr(np.asarray([phi0]), e)[0])
    D = B * math.sqrt(1.0 - e2) / (cphi0 * math.sqrt(1.0 - e2 * sphi0**2))
    D2 = max(D * D, 1.0)
    sign = 1.0 if phi0 >= 0.0 else -1.0
    F = D + math.sqrt(D2 - 1.0) * sign
    H = F * t0**B
    G = (F - 1.0 / F) / 2.0
    # clamp: at lat_0 near 0, D is 1 up to float noise, so |alpha|=90
    # can push sin(alpha)/D marginally past 1 (r6 advisor)
    gamma0 = math.asin(max(-1.0, min(1.0, math.sin(alpha) / D)))
    lam0 = math.radians(crs["lonc"]) - math.asin(G * math.tan(gamma0)) / B
    if crs.get("no_off"):
        uc = 0.0
    elif abs(crs["alpha"]) == 90.0:
        uc = A * (math.radians(crs["lonc"]) - lam0)
    else:
        uc = (A / B) * math.atan2(math.sqrt(D2 - 1.0), math.cos(alpha)) * sign
    return A, B, H, gamma0, lam0, uc, e


def _omerc_fwd(crs: dict, lon, lat):
    A, B, H, gamma0, lam0, uc, e = _omerc_consts(crs)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
    lam = (lam + np.pi) % (2.0 * np.pi) - np.pi
    phi = np.radians(np.clip(np.asarray(lat, dtype=np.float64), -89.999, 89.999))
    t = _t_arr(phi, e)
    Q = H / np.power(t, B)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * lam)
    U = (-V * math.cos(gamma0) + S * math.sin(gamma0)) / T
    v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = (
        A / B * np.arctan2(
            S * math.cos(gamma0) + V * math.sin(gamma0), np.cos(B * lam)
        )
        - uc
    )
    g = math.radians(crs["gamma"])
    return (
        v * math.cos(g) + u * math.sin(g) + crs["x_0"],
        u * math.cos(g) - v * math.sin(g) + crs["y_0"],
    )


def _omerc_inv(crs: dict, x, y):
    A, B, H, gamma0, lam0, uc, e = _omerc_consts(crs)
    g = math.radians(crs["gamma"])
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    v = dx * math.cos(g) - dy * math.sin(g)
    u = dy * math.cos(g) + dx * math.sin(g) + uc
    Q = np.exp(-B * v / A)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * u / A)
    U = (V * math.cos(gamma0) + S * math.sin(gamma0)) / T
    t = np.power(H / np.sqrt((1.0 + U) / (1.0 - U)), 1.0 / B)
    phi = _phi_from_t(t, e)
    lam = lam0 - np.arctan2(
        S * math.cos(gamma0) - V * math.sin(gamma0), np.cos(B * u / A)
    ) / B
    return np.degrees(lam), np.degrees(phi)


# --- nzmg (New Zealand Map Grid — the LINZS25002 sixth-order complex
# conformal polynomial on International 1924; EPSG:27200) ----------------------

_NZMG_LAT0, _NZMG_LON0 = -41.0, 173.0
# Δφ -> Δψ (isometric) series and its published inverse, Δφ in units of
# 1e-5 arc-seconds of latitude difference (LINZS25002 table coefficients)
_NZMG_TPSI = np.array([
    0.6399175073, -0.1358797613, 0.063294409, -0.02526853, 0.0117879,
    -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034,
])
_NZMG_TPHI = np.array([
    1.5627014243, 0.5185406398, -0.03333098, -0.1052906, -0.0368594,
    0.007317, 0.01220, 0.00394, -0.0013,
])
_NZMG_BF = np.array([
    0.7557853228 + 0.0j, 0.249204646 + 0.003371507j,
    -0.001541739 + 0.041058560j, -0.10162907 + 0.01727609j,
    -0.26623489 - 0.36249218j, -0.6870983 - 1.1651967j,
])
# highest-power-first with a zero constant term, for np.polyval Horner
_NZMG_TPSI_PV = np.append(_NZMG_TPSI[::-1], 0.0)
_NZMG_TPHI_PV = np.append(_NZMG_TPHI[::-1], 0.0)
_NZMG_BF_PV = np.append(_NZMG_BF[::-1], 0.0 + 0.0j)
_NZMG_BFD_PV = np.polyder(_NZMG_BF_PV)


def _nzmg_fwd(crs: dict, lon, lat):
    a = crs["a"]
    dphi = (np.asarray(lat, dtype=np.float64) - _NZMG_LAT0) * 3600.0e-5
    psi = np.polyval(_NZMG_TPSI_PV, dphi)
    lam = np.radians(np.asarray(lon, dtype=np.float64) - _NZMG_LON0)
    z = psi + 1j * lam
    w = np.polyval(_NZMG_BF_PV, z)
    return crs["x_0"] + a * w.imag, crs["y_0"] + a * w.real


def _nzmg_inv(crs: dict, x, y):
    a = crs["a"]
    w = (
        (np.asarray(y, dtype=np.float64) - crs["y_0"])
        + 1j * (np.asarray(x, dtype=np.float64) - crs["x_0"])
    ) / a
    z = w / _NZMG_BF[0]
    for _ in range(12):  # complex Newton on the forward polynomial
        z = z - (np.polyval(_NZMG_BF_PV, z) - w) / np.polyval(_NZMG_BFD_PV, z)
    psi = z.real
    dphi = np.polyval(_NZMG_TPHI_PV, psi)
    return (
        _NZMG_LON0 + np.degrees(z.imag),
        _NZMG_LAT0 + dphi / 3600.0e-5,
    )


# --- datum shift (+towgs84: 3/7-parameter Helmert via geocentric XYZ,
# position-vector convention — what proj4/mapnik apply between datums) ---------

# --- krovak (EPSG method 9819: the S-JTSK oblique conformal conic on a
# Gaussian sphere — Czech/Slovak national CRS, EPSG:5514) ----------------------

def _krovak_consts(crs: dict):
    a, e2 = crs["a"], crs["e2"]
    e = math.sqrt(e2)
    phic = math.radians(crs["lat_0"])
    A_ = a * math.sqrt(1.0 - e2) / (1.0 - e2 * math.sin(phic) ** 2)
    B = math.sqrt(1.0 + e2 * math.cos(phic) ** 4 / (1.0 - e2))
    g0 = math.asin(math.sin(phic) / B)
    t0 = (
        math.tan(math.pi / 4 + g0 / 2)
        * ((1.0 + e * math.sin(phic)) / (1.0 - e * math.sin(phic))) ** (e * B / 2)
        / math.tan(math.pi / 4 + phic / 2) ** B
    )
    phip = math.radians(crs["lat_ts"])
    n = math.sin(phip)
    r0 = crs["k"] * A_ / math.tan(phip)
    alpha = math.radians(crs["alpha"])
    lam0 = math.radians(crs["lon_0"])
    return e, B, g0, t0, n, r0, alpha, phip, lam0


def _krovak_fwd(crs: dict, lon, lat):
    """proj4 sign convention: (x, y) = (-Westing, -Southing) — the
    EPSG:5514 'Krovak East North' axes (coordinates in Czechia are both
    negative); the classic Southing/Westing pair is (-y, -x)."""
    e, B, g0, t0, n, r0, alpha, phip, lam0 = _krovak_consts(crs)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    sphi = np.sin(phi)
    t = t0 * np.power(np.tan(phi / 2 + math.pi / 4), B) / np.power(
        (1.0 + e * sphi) / (1.0 - e * sphi), e * B / 2
    )
    U = 2.0 * (np.arctan(t) - math.pi / 4)
    V = B * (lam0 - lam)
    T = np.arcsin(np.cos(alpha) * np.sin(U) + np.sin(alpha) * np.cos(U) * np.cos(V))
    D = np.arcsin(np.cos(U) * np.sin(V) / np.cos(T))
    theta = n * D
    r = (
        r0
        * math.tan(math.pi / 4 + phip / 2) ** n
        / np.power(np.tan(T / 2 + math.pi / 4), n)
    )
    southing = r * np.cos(theta)
    westing = r * np.sin(theta)
    return -westing + crs["x_0"], -southing + crs["y_0"]


def _krovak_inv(crs: dict, x, y):
    e, B, g0, t0, n, r0, alpha, phip, lam0 = _krovak_consts(crs)
    westing = -(np.asarray(x, dtype=np.float64) - crs["x_0"])
    southing = -(np.asarray(y, dtype=np.float64) - crs["y_0"])
    r = np.hypot(westing, southing)
    theta = np.arctan2(westing, southing)
    D = theta / n
    T = 2.0 * (
        np.arctan(
            np.power(r0 / r, 1.0 / n) * math.tan(math.pi / 4 + phip / 2)
        )
        - math.pi / 4
    )
    U = np.arcsin(np.cos(alpha) * np.sin(T) - np.sin(alpha) * np.cos(T) * np.cos(D))
    V = np.arcsin(np.cos(T) * np.sin(D) / np.cos(U))
    lam = lam0 - V / B
    # latitude by fixed-point iteration on the Gaussian-sphere relation
    phi = U.copy()
    base = np.power(np.tan(U / 2 + math.pi / 4) / t0, 1.0 / B)
    for _ in range(12):
        sphi = np.sin(phi)
        phi = 2.0 * (
            np.arctan(
                base * np.power((1.0 + e * sphi) / (1.0 - e * sphi), e / 2)
            )
            - math.pi / 4
        )
    return np.degrees(lam), np.degrees(phi)


# --- sinu (ellipsoidal sinusoidal: equal-area, Snyder ch. 30) -----------------

def _sinu_fwd(crs: dict, lon, lat):
    a, e2 = crs["a"], crs["e2"]
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    x = a * dlam * np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
    y = _merid_arc(phi, a, e2)
    return x + crs["x_0"], y + crs["y_0"]


def _sinu_inv(crs: dict, x, y):
    a, e2 = crs["a"], crs["e2"]
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    phi = _inv_merid_arc(dy, a, e2)
    cphi = np.cos(phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        dlam = dx * np.sqrt(1.0 - e2 * np.sin(phi) ** 2) / (a * cphi)
    dlam = np.where(np.abs(cphi) < 1e-12, 0.0, dlam)  # poles: lon = lon_0
    return crs["lon_0"] + np.degrees(dlam), np.degrees(phi)


# --- moll (spherical Mollweide: equal-area, Snyder ch. 31) --------------------

_MOLL_RT2 = math.sqrt(2.0)


def _moll_theta(phi: np.ndarray) -> np.ndarray:
    """Solve 2*theta + sin(2*theta) = pi * sin(phi) (Newton)."""
    rhs = math.pi * np.sin(phi)
    theta = phi.copy()
    for _ in range(15):
        f = 2.0 * theta + np.sin(2.0 * theta) - rhs
        fp = 2.0 + 2.0 * np.cos(2.0 * theta)
        step = np.where(np.abs(fp) > 1e-12, f / np.maximum(fp, 1e-12), 0.0)
        theta = theta - step
    # at the poles the Newton denominator vanishes; the solution is exact
    theta = np.where(np.abs(phi) >= math.pi / 2 - 1e-12,
                     np.sign(phi) * (math.pi / 2), theta)
    return theta


def _moll_fwd(crs: dict, lon, lat):
    R = crs["a"]
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    theta = _moll_theta(phi)
    x = 2.0 * _MOLL_RT2 / math.pi * R * dlam * np.cos(theta)
    y = _MOLL_RT2 * R * np.sin(theta)
    return x + crs["x_0"], y + crs["y_0"]


def _moll_inv(crs: dict, x, y):
    R = crs["a"]
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    st = np.clip(dy / (_MOLL_RT2 * R), -1.0, 1.0)
    theta = np.arcsin(st)
    phi = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / math.pi, -1.0, 1.0))
    ct = np.cos(theta)
    with np.errstate(divide="ignore", invalid="ignore"):
        dlam = math.pi * dx / (2.0 * _MOLL_RT2 * R * ct)
    dlam = np.where(ct < 1e-12, 0.0, dlam)
    return crs["lon_0"] + np.degrees(dlam), np.degrees(phi)


# --- laea (Lambert azimuthal equal-area: Snyder ch. 24, EPSG method 9820) -----
# ETRS89-LAEA Europe (EPSG:3035) and the North-Pole LAEA arctic grids
# (EPSG:3571-3576). Oblique aspect via authalic latitude; polar aspect
# closed-form. Matches the reference's any-proj4 contract
# (src/vector_tile_strategy.hpp:69-104 accepts arbitrary CRS via libproj).


def _authalic_q(phi: np.ndarray, e2: float) -> np.ndarray:
    """q(phi) — Snyder eq. 3-12, the authalic-latitude integrand."""
    if e2 == 0.0:
        return 2.0 * np.sin(phi)
    e = math.sqrt(e2)
    s = np.sin(phi)
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (0.5 / e) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def _authalic_phi(beta: np.ndarray, e2: float) -> np.ndarray:
    """Authalic -> geodetic latitude (Snyder eq. 3-18 series)."""
    if e2 == 0.0:
        return beta
    e4, e6 = e2 * e2, e2 * e2 * e2
    return (
        beta
        + (e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0) * np.sin(2.0 * beta)
        + (23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0) * np.sin(4.0 * beta)
        + (761.0 * e6 / 45360.0) * np.sin(6.0 * beta)
    )


def _laea_consts(crs: dict):
    a, e2 = crs["a"], crs["e2"]
    qp = float(_authalic_q(np.asarray([math.pi / 2.0]), e2)[0])
    phi0 = math.radians(crs["lat_0"])
    q0 = float(_authalic_q(np.asarray([phi0]), e2)[0])
    beta0 = math.asin(max(-1.0, min(1.0, q0 / qp)))
    rq = a * math.sqrt(qp / 2.0)
    m0 = math.cos(phi0) / math.sqrt(1.0 - e2 * math.sin(phi0) ** 2)
    cb0 = math.cos(beta0)
    d = (a * m0) / (rq * cb0) if abs(cb0) > 1e-12 else 1.0
    return a, e2, qp, beta0, rq, d


def _laea_fwd(crs: dict, lon, lat):
    a, e2, qp, beta0, rq, d = _laea_consts(crs)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    q = _authalic_q(phi, e2)
    if crs["lat_0"] >= 90.0:  # north polar (Snyder 24-23, 21-30/31)
        rho = a * np.sqrt(np.maximum(qp - q, 0.0))
        return rho * np.sin(dlam) + crs["x_0"], -rho * np.cos(dlam) + crs["y_0"]
    if crs["lat_0"] <= -90.0:  # south polar (Snyder 24-24)
        rho = a * np.sqrt(np.maximum(qp + q, 0.0))
        return rho * np.sin(dlam) + crs["x_0"], rho * np.cos(dlam) + crs["y_0"]
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    sb, cb = np.sin(beta), np.cos(beta)
    sb0, cb0 = math.sin(beta0), math.cos(beta0)
    # Snyder 24-19: B blows up only at the exact antipode of the centre
    den = np.maximum(1.0 + sb0 * sb + cb0 * cb * np.cos(dlam), 1e-12)
    b = rq * np.sqrt(2.0 / den)
    x = b * d * cb * np.sin(dlam)
    y = (b / d) * (cb0 * sb - sb0 * cb * np.cos(dlam))
    return x + crs["x_0"], y + crs["y_0"]


def _laea_inv(crs: dict, x, y):
    a, e2, qp, beta0, rq, d = _laea_consts(crs)
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    if abs(crs["lat_0"]) >= 90.0:  # polar (Snyder 24-31, 20-14/16/17)
        rho = np.hypot(dx, dy)
        q = qp - (rho / a) ** 2
        if crs["lat_0"] <= -90.0:
            q = -q
            lam = np.arctan2(dx, dy)
        else:
            lam = np.arctan2(dx, -dy)
        beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        phi = _authalic_phi(beta, e2)
        return crs["lon_0"] + np.degrees(lam), np.degrees(phi)
    sb0, cb0 = math.sin(beta0), math.cos(beta0)
    px = dx / d
    py = d * dy
    rho = np.hypot(px, py)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    sc, cc = np.sin(ce), np.cos(ce)
    safe = np.maximum(rho, 1e-30)
    beta = np.arcsin(np.clip(cc * sb0 + py * sc * cb0 / safe, -1.0, 1.0))
    lam = np.arctan2(px * sc, safe * cb0 * cc - py * sb0 * sc)
    # rho == 0 is the projection centre exactly
    beta = np.where(rho < 1e-12, beta0, beta)
    lam = np.where(rho < 1e-12, 0.0, lam)
    phi = _authalic_phi(beta, e2)
    return crs["lon_0"] + np.degrees(lam), np.degrees(phi)


# --- eck4 (Eckert IV: spherical pseudocylindrical equal-area, Snyder ch. 32) --

_ECK4_CX = 2.0 / math.sqrt(math.pi * (4.0 + math.pi))
_ECK4_CY = 2.0 * math.sqrt(math.pi / (4.0 + math.pi))


def _eck4_theta(phi: np.ndarray) -> np.ndarray:
    """Solve theta + sin(theta)cos(theta) + 2 sin(theta) =
    (2 + pi/2) sin(phi) (Newton; Snyder eq. 32-9)."""
    rhs = (2.0 + math.pi / 2.0) * np.sin(phi)
    theta = phi / 2.0
    for _ in range(20):
        st, ct = np.sin(theta), np.cos(theta)
        f = theta + st * ct + 2.0 * st - rhs
        fp = 1.0 + ct * ct - st * st + 2.0 * ct
        step = np.where(np.abs(fp) > 1e-14, f / np.where(fp == 0, 1.0, fp), 0.0)
        theta = theta - step
    theta = np.where(np.abs(phi) >= math.pi / 2 - 1e-12,
                     np.sign(phi) * (math.pi / 2), theta)
    return theta


def _eck4_fwd(crs: dict, lon, lat):
    R = crs["a"]
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    theta = _eck4_theta(phi)
    x = _ECK4_CX * R * dlam * (1.0 + np.cos(theta))
    y = _ECK4_CY * R * np.sin(theta)
    return x + crs["x_0"], y + crs["y_0"]


def _eck4_inv(crs: dict, x, y):
    R = crs["a"]
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    theta = np.arcsin(np.clip(dy / (_ECK4_CY * R), -1.0, 1.0))
    st, ct = np.sin(theta), np.cos(theta)
    phi = np.arcsin(
        np.clip((theta + st * ct + 2.0 * st) / (2.0 + math.pi / 2.0), -1.0, 1.0)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        dlam = dx / (_ECK4_CX * R * (1.0 + ct))
    dlam = np.where(1.0 + ct < 1e-12, 0.0, dlam)
    return crs["lon_0"] + np.degrees(dlam), np.degrees(phi)


# --- gnom / ortho (spherical azimuthal: Snyder ch. 22 / ch. 20) ---------------
# proj4-classic semantics: both are spherical (the ellipsoid's a is the
# sphere radius). Points on or behind the horizon project to NaN, the
# vectorized analogue of proj's HUGE_VAL error coordinates.


def _az_cosc(crs: dict, lon, lat):
    phi0 = math.radians(crs["lat_0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    cosc = (
        math.sin(phi0) * np.sin(phi)
        + math.cos(phi0) * np.cos(phi) * np.cos(dlam)
    )
    return phi0, phi, dlam, cosc


def _gnom_fwd(crs: dict, lon, lat):
    R = crs["a"]
    phi0, phi, dlam, cosc = _az_cosc(crs, lon, lat)
    with np.errstate(divide="ignore", invalid="ignore"):
        kp = np.where(cosc > 1e-10, 1.0 / cosc, np.nan)
    x = R * kp * np.cos(phi) * np.sin(dlam)
    y = R * kp * (
        math.cos(phi0) * np.sin(phi) - math.sin(phi0) * np.cos(phi) * np.cos(dlam)
    )
    return x + crs["x_0"], y + crs["y_0"]


def _ortho_fwd(crs: dict, lon, lat):
    R = crs["a"]
    phi0, phi, dlam, cosc = _az_cosc(crs, lon, lat)
    x = np.where(cosc >= -1e-12, R * np.cos(phi) * np.sin(dlam), np.nan)
    y = np.where(
        cosc >= -1e-12,
        R * (math.cos(phi0) * np.sin(phi)
             - math.sin(phi0) * np.cos(phi) * np.cos(dlam)),
        np.nan,
    )
    return x + crs["x_0"], y + crs["y_0"]


def _az_inv(crs: dict, x, y, c: np.ndarray, rho: np.ndarray):
    """Shared azimuthal inverse (Snyder 20-14/15): angular distance c
    along the azimuth from the centre back to (lon, lat)."""
    phi0 = math.radians(crs["lat_0"])
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    safe = np.where(rho == 0.0, 1.0, rho)
    sc, cc = np.sin(c), np.cos(c)
    phi = np.arcsin(
        np.clip(cc * math.sin(phi0) + dy * sc * math.cos(phi0) / safe, -1.0, 1.0)
    )
    lam = np.arctan2(dx * sc, rho * math.cos(phi0) * cc - dy * math.sin(phi0) * sc)
    phi = np.where(rho == 0.0, phi0, phi)
    lam = np.where(rho == 0.0, 0.0, lam)
    return crs["lon_0"] + np.degrees(lam), np.degrees(phi)


def _gnom_inv(crs: dict, x, y):
    R = crs["a"]
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    rho = np.hypot(dx, dy)
    c = np.arctan2(rho, R)
    return _az_inv(crs, x, y, c, rho)


def _ortho_inv(crs: dict, x, y):
    R = crs["a"]
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    rho = np.hypot(dx, dy)
    c = np.arcsin(np.clip(rho / R, -1.0, 1.0))
    return _az_inv(crs, x, y, c, rho)


# --- cea (cylindrical equal-area: Snyder ch. 10, EPSG method 9835) ------------
# EASE-Grid 2.0 (EPSG:6933, lat_ts=30) and the Lambert/Behrmann family.


def _cea_k0(crs: dict) -> float:
    if abs(crs["lat_ts"]) >= 90.0:
        # k0 = cos(lat_ts)/... -> 0: the cylinder degenerates to a line
        raise ValueError("cea: |lat_ts| must be < 90")
    phi_ts = math.radians(crs["lat_ts"])
    return math.cos(phi_ts) / math.sqrt(1.0 - crs["e2"] * math.sin(phi_ts) ** 2)


def _cea_fwd(crs: dict, lon, lat):
    a, e2 = crs["a"], crs["e2"]
    k0 = _cea_k0(crs)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64) - crs["lon_0"])
    x = a * k0 * dlam
    y = a * _authalic_q(phi, e2) / (2.0 * k0)
    return x + crs["x_0"], y + crs["y_0"]


def _cea_inv(crs: dict, x, y):
    a, e2 = crs["a"], crs["e2"]
    k0 = _cea_k0(crs)
    dx = np.asarray(x, dtype=np.float64) - crs["x_0"]
    dy = np.asarray(y, dtype=np.float64) - crs["y_0"]
    qp = float(_authalic_q(np.asarray([math.pi / 2.0]), e2)[0])
    beta = np.arcsin(np.clip(2.0 * dy * k0 / (a * qp), -1.0, 1.0))
    phi = _authalic_phi(beta, e2)
    return crs["lon_0"] + np.degrees(dx / (a * k0)), np.degrees(phi)


def _geodetic_to_geocentric(lon, lat, a: float, e2: float):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    N = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
    X = N * np.cos(phi) * np.cos(lam)
    Y = N * np.cos(phi) * np.sin(lam)
    Z = N * (1.0 - e2) * np.sin(phi)
    return X, Y, Z


def _geocentric_to_geodetic(X, Y, Z, a: float, e2: float):
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(6):
        N = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
        phi = np.arctan2(Z + e2 * N * np.sin(phi), p)
    return np.degrees(lam), np.degrees(phi)


def _helmert(X, Y, Z, p: tuple, inverse: bool = False):
    dx, dy, dz, rx, ry, rz, s = p
    rx, ry, rz = (v * math.pi / 648000.0 for v in (rx, ry, rz))  # arcsec -> rad
    m = 1.0 + s * 1e-6
    if not inverse:
        return (
            dx + m * (X - rz * Y + ry * Z),
            dy + m * (rz * X + Y - rx * Z),
            dz + m * (-ry * X + rx * Y + Z),
        )
    Xs, Ys, Zs = (X - dx) / m, (Y - dy) / m, (Z - dz) / m
    return (
        Xs + rz * Ys - ry * Zs,
        -rz * Xs + Ys + rx * Zs,
        ry * Xs - rx * Ys + Zs,
    )


def _datum_of(crs: dict):
    """(a, e2, towgs84) — projections without explicit ellipsoid params
    computed on WGS84 (merc/tmerc/utm here) report WGS84."""
    return crs.get("a", WGS84_A), crs.get("e2", WGS84_E2), crs.get("towgs84")


def forward(crs: dict, lon, lat):
    """geographic degrees -> projected (same-CRS passthrough for longlat)."""
    p = crs["proj"]
    if p == "longlat":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if p == "merc":
        return _merc_fwd(lon, lat, crs.get("spherical", True))
    if p == "utm":
        lon0 = -183.0 + 6.0 * crs["zone"]
        return _tmerc_fwd(lon, lat, lon0, 0.9996, 500000.0,
                          10000000.0 if crs.get("south") else 0.0,
                          crs.get("a", WGS84_A), crs.get("e2", WGS84_E2))
    if p == "tmerc":
        return _tmerc_fwd(lon, lat, crs["lon_0"], crs["k"], crs["x_0"],
                          crs["y_0"] - _tmerc_lat0_northing(crs),
                          crs.get("a", WGS84_A), crs.get("e2", WGS84_E2))
    if p == "lcc":
        return _lcc_fwd(crs, lon, lat)
    if p == "stere":
        return _stere_fwd(crs, lon, lat)
    if p == "stere_ob":
        return _stere_ob_fwd(crs, lon, lat)
    if p == "aeqd":
        return _aeqd_fwd(crs, lon, lat)
    if p == "cass":
        return _cass_fwd(crs, lon, lat)
    if p == "eqc":
        return _eqc_fwd(crs, lon, lat)
    if p == "omerc":
        return _omerc_fwd(crs, lon, lat)
    if p == "nzmg":
        return _nzmg_fwd(crs, lon, lat)
    if p == "krovak":
        return _krovak_fwd(crs, lon, lat)
    if p == "sinu":
        return _sinu_fwd(crs, lon, lat)
    if p == "moll":
        return _moll_fwd(crs, lon, lat)
    if p == "laea":
        return _laea_fwd(crs, lon, lat)
    if p == "cea":
        return _cea_fwd(crs, lon, lat)
    if p == "eck4":
        return _eck4_fwd(crs, lon, lat)
    if p == "gnom":
        return _gnom_fwd(crs, lon, lat)
    if p == "ortho":
        return _ortho_fwd(crs, lon, lat)
    raise NotImplementedError(p)


def _tmerc_lat0_northing(crs: dict) -> float:
    """Northing of +lat_0 on the central meridian (proj4 tmerc measures
    y from lat_0, not the equator; UTM's lat_0=0 makes this vanish).
    Evaluated with the same Krüger series so fwd/inv stay bit-exact
    mutual inverses."""
    lat0 = crs.get("lat_0", 0.0)
    if not lat0:
        return 0.0
    _x, y = _tmerc_fwd(
        np.asarray([crs["lon_0"]]), np.asarray([lat0]),
        crs["lon_0"], crs["k"], 0.0, 0.0,
        crs.get("a", WGS84_A), crs.get("e2", WGS84_E2),
    )
    return float(y[0])


def inverse(crs: dict, x, y):
    p = crs["proj"]
    if p == "longlat":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if p == "merc":
        return _merc_inv(x, y, crs.get("spherical", True))
    if p == "utm":
        lon0 = -183.0 + 6.0 * crs["zone"]
        return _tmerc_inv(x, y, lon0, 0.9996, 500000.0,
                          10000000.0 if crs.get("south") else 0.0,
                          crs.get("a", WGS84_A), crs.get("e2", WGS84_E2))
    if p == "tmerc":
        return _tmerc_inv(x, y, crs["lon_0"], crs["k"], crs["x_0"],
                          crs["y_0"] - _tmerc_lat0_northing(crs),
                          crs.get("a", WGS84_A), crs.get("e2", WGS84_E2))
    if p == "lcc":
        return _lcc_inv(crs, x, y)
    if p == "stere":
        return _stere_inv(crs, x, y)
    if p == "stere_ob":
        return _stere_ob_inv(crs, x, y)
    if p == "aeqd":
        return _aeqd_inv(crs, x, y)
    if p == "cass":
        return _cass_inv(crs, x, y)
    if p == "eqc":
        return _eqc_inv(crs, x, y)
    if p == "omerc":
        return _omerc_inv(crs, x, y)
    if p == "nzmg":
        return _nzmg_inv(crs, x, y)
    if p == "krovak":
        return _krovak_inv(crs, x, y)
    if p == "sinu":
        return _sinu_inv(crs, x, y)
    if p == "moll":
        return _moll_inv(crs, x, y)
    if p == "laea":
        return _laea_inv(crs, x, y)
    if p == "cea":
        return _cea_inv(crs, x, y)
    if p == "eck4":
        return _eck4_inv(crs, x, y)
    if p == "gnom":
        return _gnom_inv(crs, x, y)
    if p == "ortho":
        return _ortho_inv(crs, x, y)
    raise NotImplementedError(p)


def transform(src: dict | str, dst: dict | str, x, y):
    """proj_transform.forward: src coords -> dst coords via geographic,
    applying +towgs84 Helmert datum shifts through geocentric XYZ when
    either side declares them (proj4-classic semantics: no +towgs84 on
    either side means no datum shift, coordinates reinterpreted)."""
    if isinstance(src, str):
        src = parse_proj4(src)
    if isinstance(dst, str):
        dst = parse_proj4(dst)
    lon, lat = inverse(src, x, y)
    sa, se2, stw = _datum_of(src)
    da, de2, dtw = _datum_of(dst)
    if stw is not None or dtw is not None:
        X, Y, Z = _geodetic_to_geocentric(lon, lat, sa, se2)
        if stw is not None:
            X, Y, Z = _helmert(X, Y, Z, stw)
        if dtw is not None:
            X, Y, Z = _helmert(X, Y, Z, dtw, inverse=True)
        lon, lat = _geocentric_to_geodetic(X, Y, Z, da, de2)
    return forward(dst, lon, lat)
