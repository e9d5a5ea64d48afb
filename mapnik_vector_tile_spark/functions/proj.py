"""Minimal projection engine (P3 — the reference's
vector_tile_strategy_proj, src/vector_tile_strategy.hpp:69-104, runs
arbitrary proj4 transforms through mapnik::proj_transform; pyproj is
absent in this container, so the common projections are implemented
directly in numpy):

* ``longlat``  — geographic WGS84 (degrees)
* ``merc``     — spherical web mercator (EPSG:3857 semantics, a=R)
* ``merc_e``   — ellipsoidal mercator (EPSG:3395) when +ellps=WGS84 and
                 no +R/+a=6378137-only spherical hint
* ``tmerc``    — transverse mercator via the Krüger/Karney series
                 (order n^4 — sub-millimetre inside a UTM zone)
* ``utm``      — tmerc with zone parameters (k0=0.9996, FE=500km)

``parse_proj4`` reads the subset of proj4 strings the reference's own
tests use ("+init=epsg:4326", "+proj=longlat ...", "+proj=merc ...",
"+proj=utm +zone=.."); ``transform`` converts coordinate arrays between
any two supported CRSs through the geographic intermediate, exactly the
shape of mapnik's proj_transform.forward/backward.
"""

from __future__ import annotations

import math

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)


def parse_proj4(s: str) -> dict:
    s = s.strip()
    params: dict[str, str | bool] = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            params[k] = v
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
        if epsg.startswith("epsg:326") or epsg.startswith("epsg:327"):
            zone = int(epsg[8:])
            return {"proj": "utm", "zone": zone, "south": epsg.startswith("epsg:327")}
        raise NotImplementedError(f"unsupported +init {epsg}")
    proj = str(params.get("proj", "longlat"))
    if proj in ("longlat", "latlong", "lonlat"):
        return {"proj": "longlat"}
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
        return {
            "proj": "utm",
            "zone": int(str(params["zone"])),
            "south": bool(params.get("south", False)),
        }
    if proj == "tmerc":
        return {
            "proj": "tmerc",
            "lon_0": float(str(params.get("lon_0", 0.0))),
            "lat_0": float(str(params.get("lat_0", 0.0))),
            "k": float(str(params.get("k", params.get("k_0", 1.0)))),
            "x_0": float(str(params.get("x_0", 0.0))),
            "y_0": float(str(params.get("y_0", 0.0))),
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

_N = WGS84_F / (2.0 - WGS84_F)
_A_CAP = WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_ALPHA = [
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 5.0 / 16.0 * _N**3 + 41.0 / 180.0 * _N**4,
    13.0 / 48.0 * _N**2 - 3.0 / 5.0 * _N**3 + 557.0 / 1440.0 * _N**4,
    61.0 / 240.0 * _N**3 - 103.0 / 140.0 * _N**4,
    49561.0 / 161280.0 * _N**4,
]
_BETA = [
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 37.0 / 96.0 * _N**3 - 1.0 / 360.0 * _N**4,
    1.0 / 48.0 * _N**2 + 1.0 / 15.0 * _N**3 - 437.0 / 1440.0 * _N**4,
    17.0 / 480.0 * _N**3 - 37.0 / 840.0 * _N**4,
    4397.0 / 161280.0 * _N**4,
]


def _tmerc_fwd(lon, lat, lon0: float, k0: float, x0: float, y0: float):
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    e = math.sqrt(WGS84_E2)
    # conformal latitude
    t = np.sinh(
        np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi))
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = x0 + k0 * _A_CAP * eta
    y = y0 + k0 * _A_CAP * xi
    return x, y


def _tmerc_inv(x, y, lon0: float, k0: float, x0: float, y0: float):
    eta = (np.asarray(x, dtype=np.float64) - x0) / (k0 * _A_CAP)
    xi = (np.asarray(y, dtype=np.float64) - y0) / (k0 * _A_CAP)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    e = math.sqrt(WGS84_E2)
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
                          10000000.0 if crs.get("south") else 0.0)
    if p == "tmerc":
        return _tmerc_fwd(lon, lat, crs["lon_0"], crs["k"], crs["x_0"],
                          crs["y_0"] - _tmerc_lat0_northing(crs))
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
                          10000000.0 if crs.get("south") else 0.0)
    if p == "tmerc":
        return _tmerc_inv(x, y, crs["lon_0"], crs["k"], crs["x_0"],
                          crs["y_0"] - _tmerc_lat0_northing(crs))
    raise NotImplementedError(p)


def transform(src: dict | str, dst: dict | str, x, y):
    """proj_transform.forward: src coords -> dst coords via geographic."""
    if isinstance(src, str):
        src = parse_proj4(src)
    if isinstance(dst, str):
        dst = parse_proj4(dst)
    lon, lat = inverse(src, x, y)
    return forward(dst, lon, lat)
