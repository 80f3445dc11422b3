"""Vectorized unit-sphere math (numpy only; no shapely/pyproj available).

All functions operate on numpy arrays. Points on the sphere are unit
3-vectors of shape (..., 3); lon/lat are degrees WGS84 (sphere model —
ellipsoid handled separately via the authalic transforms in geodesy.py,
mirroring the reference's auxlat.py (/root/reference/dggrid4py/auxlat.py:6-37)).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.007180918475  # authalic earth radius (same sphere DGGRID uses)
EARTH_AREA_KM2 = 4.0 * np.pi * EARTH_RADIUS_KM**2

DEG = np.pi / 180.0


def lonlat_to_unit(lon_deg, lat_deg):
    """(lon, lat) degrees -> unit vectors (..., 3)."""
    lon = np.asarray(lon_deg, dtype=np.float64) * DEG
    lat = np.asarray(lat_deg, dtype=np.float64) * DEG
    cl = np.cos(lat)
    out = np.empty(lon.shape + (3,), dtype=np.float64)
    out[..., 0] = cl * np.cos(lon)
    out[..., 1] = cl * np.sin(lon)
    out[..., 2] = np.sin(lat)
    return out


def unit_to_lonlat(v):
    """Unit vectors (..., 3) -> (lon, lat) degrees."""
    v = np.asarray(v, dtype=np.float64)
    lon = np.arctan2(v[..., 1], v[..., 0]) / DEG
    lat = np.arcsin(np.clip(v[..., 2], -1.0, 1.0)) / DEG
    return lon, lat


def normalize(v):
    n = np.sqrt(np.sum(v * v, axis=-1, keepdims=True))
    return v / n


def east_north(v):
    """Local east/north unit tangent vectors at unit point(s) v.

    At the poles east is taken along +y / -y (continuous-enough for our
    use: base-cell frames are never placed exactly at the coordinate
    poles unless the user asks; grid math never consults east/north
    except at explicitly constructed anchor points).
    """
    v = np.asarray(v, dtype=np.float64)
    z = np.zeros_like(v)
    z[..., 2] = 1.0
    east = np.cross(z, v)
    norm = np.sqrt(np.sum(east * east, axis=-1, keepdims=True))
    small = norm[..., 0] < 1e-12
    east = np.where(small[..., None], np.array([0.0, 1.0, 0.0]), east / np.where(norm == 0, 1.0, norm))
    north = np.cross(v, east)
    return east, north


def tangent_at_azimuth(v, az_deg):
    """Unit tangent at v pointing along compass azimuth (deg, from north, clockwise toward east)."""
    east, north = east_north(v)
    az = np.asarray(az_deg, dtype=np.float64) * DEG
    return np.cos(az)[..., None] * north + np.sin(az)[..., None] * east


def geodesic_step(v, tangent, dist_rad):
    """Move from unit point v along unit tangent by angle dist_rad.

    Returns (new_point, new_tangent) where new_tangent is the parallel-
    transported direction (continuation of the geodesic at the new point).
    """
    d = np.asarray(dist_rad, dtype=np.float64)
    cd = np.cos(d)[..., None]
    sd = np.sin(d)[..., None]
    p = cd * v + sd * tangent
    t = -sd * v + cd * tangent
    return p, t


def rotate_tangent(tangent, normal, ang_rad):
    """Rotate tangent vector(s) about the local normal by ang_rad (CCW seen from outside)."""
    c = np.cos(ang_rad)
    s = np.sin(ang_rad)
    if np.ndim(c):
        c = c[..., None]
        s = s[..., None]
    return tangent * c + np.cross(normal, tangent) * s


def angle_between(a, b):
    """Angular distance (radians) between unit vectors."""
    d = np.clip(np.sum(a * b, axis=-1), -1.0, 1.0)
    return np.arccos(d)


def haversine_km(lon1, lat1, lon2, lat2, radius_km=6371.0):
    """Great-circle distance in km (reference: igeo7_ext.py:243-260 uses R=6371)."""
    lam1 = np.asarray(lon1, dtype=np.float64) * DEG
    lam2 = np.asarray(lon2, dtype=np.float64) * DEG
    phi1 = np.asarray(lat1, dtype=np.float64) * DEG
    phi2 = np.asarray(lat2, dtype=np.float64) * DEG
    h = np.sin((phi2 - phi1) / 2) ** 2 + np.cos(phi1) * np.cos(phi2) * np.sin((lam2 - lam1) / 2) ** 2
    return 2.0 * radius_km * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def ring_solid_angle(verts: np.ndarray) -> np.ndarray:
    """Solid angle (steradians) of NaN-padded closed lon/lat rings.

    ``verts`` is (n, m, 2) degrees with each ring closed (last valid
    vertex repeats the first) and NaN padding after it — the layout
    ``IGeo7Grid.boundary`` emits.  Edges are treated as great-circle
    arcs; the excess of each fan triangle (v0, vi, vi+1) comes from the
    Oosterom-Strackee / Eriksson formula
    ``E = 2 atan2(v0 . (v1 x v2), 1 + v0.v1 + v1.v2 + v2.v0)``
    (numerically stable for the tiny triangles of fine cells, unlike
    Girard's angle sum).  Fully vectorized over cells; multiply by
    R^2 for area."""
    verts = np.asarray(verts, dtype=np.float64)
    n, m, _ = verts.shape
    if n == 0:
        return np.zeros(0)
    valid = ~np.isnan(verts[:, :, 0])
    k = valid.sum(axis=1) - 1            # ring length w/o closing vertex
    U = lonlat_to_unit(np.nan_to_num(verts[:, :, 0]),
                       np.nan_to_num(verts[:, :, 1]))
    area = np.zeros(n)
    v0 = U[:, 0, :]
    for i in range(1, int(k.max()) - 1):
        v1 = U[:, i, :]
        v2 = U[:, i + 1, :]
        trip = np.einsum("ij,ij->i", v0, np.cross(v1, v2))
        den = (1.0 + np.einsum("ij,ij->i", v0, v1)
               + np.einsum("ij,ij->i", v1, v2)
               + np.einsum("ij,ij->i", v2, v0))
        area += np.where(i + 1 <= k - 1, 2.0 * np.arctan2(trip, den), 0.0)
    return np.abs(area)
