"""Authalic <-> geodetic latitude transforms (vectorized).

Replaces the reference's pygeodesy-based auxlat helpers
(/root/reference/dggrid4py/auxlat.py:6-37) with the standard series
expansions (Snyder, "Map Projections — A Working Manual", USGS PP 1395).
Needed for OGC-compliant IGEO7 on the WGS84 ellipsoid: convert geodetic
latitudes to the authalic sphere before encoding, and back after decoding
(reference docs/source/IGEO7.rst:19-28).
"""

from __future__ import annotations

import numpy as np

WGS84_E2 = 0.00669437999014  # first eccentricity squared
_E2 = WGS84_E2
_E4 = _E2 * _E2
_E6 = _E4 * _E2

# geodetic -> authalic coefficients
_G2A_2 = -(_E2 / 3.0 + 31.0 * _E4 / 180.0 + 59.0 * _E6 / 560.0)
_G2A_4 = 17.0 * _E4 / 360.0 + 61.0 * _E6 / 1260.0
_G2A_6 = -383.0 * _E6 / 45360.0

# authalic -> geodetic coefficients
_A2G_2 = _E2 / 3.0 + 31.0 * _E4 / 180.0 + 517.0 * _E6 / 5040.0
_A2G_4 = 23.0 * _E4 / 360.0 + 251.0 * _E6 / 3780.0
_A2G_6 = 761.0 * _E6 / 45360.0

_DEG = np.pi / 180.0


def geodetic_to_authalic(lat_deg):
    """WGS84 geodetic latitude (deg) -> authalic-sphere latitude (deg).
    Mirrors reference auxlat.geodetic_to_authalic (auxlat.py:9-10)."""
    phi = np.asarray(lat_deg, dtype=np.float64) * _DEG
    beta = phi + _G2A_2 * np.sin(2 * phi) + _G2A_4 * np.sin(4 * phi) + _G2A_6 * np.sin(6 * phi)
    return beta / _DEG


def authalic_to_geodetic(lat_deg):
    """Authalic-sphere latitude (deg) -> WGS84 geodetic latitude (deg).
    Mirrors reference auxlat.authalic_to_geodetic (auxlat.py:6-7)."""
    beta = np.asarray(lat_deg, dtype=np.float64) * _DEG
    phi = beta + _A2G_2 * np.sin(2 * beta) + _A2G_4 * np.sin(4 * beta) + _A2G_6 * np.sin(6 * beta)
    return phi / _DEG
