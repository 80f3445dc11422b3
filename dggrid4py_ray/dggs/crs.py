"""Minimal projected-CRS support (no pyproj in this environment).

Closes the reference's projected-CRS raster path (igeo7_ext.py:263-334:
get_crs_info / projected_distance / get_raster_pixel_edge_len for projected
rasters) for the two CRS families that cover the overwhelming majority of
real projected rasters:

* EPSG:3857 Web Mercator — exact closed forms (spherical, R = 6378137).
* EPSG:326xx / 327xx UTM (WGS84) — transverse Mercator via the Krüger
  series in the third flattening n (Karney, "Transverse Mercator with an
  accuracy of a few nanometers", J. Geodesy 85, 2011 — public knowledge).
  Third-order series: error O(n^4 * A) ~ 0.1 mm for WGS84, far below any
  raster pixel.

All functions are vectorized numpy; the inverse is what the raster path
needs (pixel centers in projected meters -> lon/lat for cell encoding).
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
_N = _F / (2.0 - _F)
# rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64 + ...)
_AR = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
# Krüger series coefficients (3rd order in n)
_ALPHA = np.array([
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
])
_BETA = np.array([
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0,
    _N**2 / 48.0 + _N**3 / 15.0,
    17.0 * _N**3 / 480.0,
])
_K0 = 0.9996          # UTM central scale
_FE = 500_000.0       # false easting
_FN_S = 10_000_000.0  # false northing (southern hemisphere)

_R_MERC = 6378137.0   # Web Mercator sphere radius


def crs_info(crs: str):
    """-> (kind, unit): 'geographic'/'degree' or 'projected'/'metre'
    (reference get_crs_info, igeo7_ext.py:263-292)."""
    c = str(crs).upper().replace("EPSG:", "")
    if c in ("4326", "4258", "4269"):
        return "geographic", "degree"
    if c == "3857":
        return "projected", "metre"
    if c.isdigit() and (32601 <= int(c) <= 32660 or 32701 <= int(c) <= 32760):
        return "projected", "metre"
    raise ValueError(f"unsupported CRS {crs!r} (supported: EPSG:4326, "
                     f"EPSG:3857, EPSG:326xx/327xx UTM)")


def utm_zone_params(epsg: int):
    """-> (central meridian deg, false northing) for a UTM EPSG code."""
    if 32601 <= epsg <= 32660:
        return -183.0 + 6.0 * (epsg - 32600), 0.0
    if 32701 <= epsg <= 32760:
        return -183.0 + 6.0 * (epsg - 32700), _FN_S
    raise ValueError(f"not a UTM EPSG code: {epsg}")


# -- Web Mercator ------------------------------------------------------------

def lonlat_to_webmercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = _R_MERC * np.deg2rad(lon)
    y = _R_MERC * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.rad2deg(x / _R_MERC)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / _R_MERC)) - np.pi / 2.0)
    return lon, lat


# -- UTM / transverse Mercator (Karney-Krüger) -------------------------------

def _tm_forward(lon_deg, lat_deg, lon0_deg: float):
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    t = np.tan(phi)
    sig = np.sinh(_E * np.arctanh(_E * t / np.sqrt(1.0 + t * t)))
    tp = t * np.sqrt(1.0 + sig * sig) - sig * np.sqrt(1.0 + t * t)
    xi_p = np.arctan2(tp, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(tp * tp + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(1, 4):
        xi += _ALPHA[j - 1] * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += _ALPHA[j - 1] * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return _K0 * _AR * eta, _K0 * _AR * xi   # (x from CM, y from equator)


def _tm_inverse(x, y, lon0_deg: float):
    eta = np.asarray(x, dtype=np.float64) / (_K0 * _AR)
    xi = np.asarray(y, dtype=np.float64) / (_K0 * _AR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(1, 4):
        xi_p -= _BETA[j - 1] * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= _BETA[j - 1] * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    tp = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # Newton: recover tau (= tan phi) from tau' (Karney 2011)
    tau = tp.copy()
    for _ in range(6):
        sig = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1.0 + tau * tau)))
        f = (tau * np.sqrt(1.0 + sig * sig)
             - sig * np.sqrt(1.0 + tau * tau)) - tp
        df = ((np.sqrt((1.0 + sig * sig) * (1.0 + tau * tau)) - sig * tau)
              * (1.0 - _E2) * np.sqrt(1.0 + tau * tau)
              / (1.0 + (1.0 - _E2) * tau * tau))
        tau = tau - f / df
    lat = np.rad2deg(np.arctan(tau))
    lon = lon0_deg + np.rad2deg(lam)
    return lon, lat


def lonlat_to_utm(lon, lat, epsg: int):
    cm, fn = utm_zone_params(epsg)
    x, y = _tm_forward(lon, lat, cm)
    return x + _FE, y + fn


def utm_to_lonlat(x, y, epsg: int):
    cm, fn = utm_zone_params(epsg)
    return _tm_inverse(np.asarray(x, dtype=np.float64) - _FE,
                       np.asarray(y, dtype=np.float64) - fn, cm)


def projected_to_lonlat(x, y, crs: str):
    """Dispatch: projected coordinates -> lon/lat (the raster path's need)."""
    c = str(crs).upper().replace("EPSG:", "")
    if c == "3857":
        return webmercator_to_lonlat(x, y)
    return utm_to_lonlat(x, y, int(c))


def lonlat_to_projected(lon, lat, crs: str):
    c = str(crs).upper().replace("EPSG:", "")
    if c == "3857":
        return lonlat_to_webmercator(lon, lat)
    return lonlat_to_utm(lon, lat, int(c))


def projected_distance(x0, y0, x1, y1):
    """Planar distance in CRS units (reference projected_distance)."""
    return np.hypot(np.asarray(x1) - np.asarray(x0),
                    np.asarray(y1) - np.asarray(y0))
