"""Web-Mercator slippy-map (XYZ) tile encoding — the tile scheme every
web map (OSM, Google, Bing quadkeys) serves from.

The reference engine tiles via DGGS cells (`dggrid_runner.py`
grid-generate paths); a training-data / geo-analytics pipeline also
needs the rectangular Web-Mercator pyramid for interop with map
tooling, so this stage provides the vectorized encoder:

    xt = floor((lon + 180) / 360 * 2^z)
    yt = floor((1 - ln(tan(lat) + sec(lat)) / pi) / 2 * 2^z)

with lat clamped to the Web-Mercator domain (+/-85.05113) and the tile
indices clamped to [0, 2^z - 1].  The float expression is evaluated in
the exact operation order shown so a SQL twin using LN/TAN/COS/FLOOR
reproduces every tile index bit-for-bit (verified over all 18,000
centi-degree latitudes at z in {8, 10, 12}).

``quadkey`` is Bing's base-4 path string (z chars, MSB first, digit =
2*y_bit + x_bit) — built fully vectorized via a (n, z) uint8 char
matrix reinterpreted as fixed-width bytes, no per-row Python.

This is a pure per-batch map: no shuffle, no state, stream-safe at any
scale.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

# Web-Mercator latitude limit: atan(sinh(pi)) in degrees.
MERCATOR_LAT_LIMIT = 85.0511287798066


def slippy_encode(lon: np.ndarray, lat: np.ndarray, zoom: int):
    """Vectorized lon/lat (degrees) -> (xt, yt) int64 tile indices."""
    if not 0 <= zoom <= 30:
        raise ValueError(f"zoom must be in [0, 30], got {zoom}")
    n = float(2 ** zoom)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64),
                  -MERCATOR_LAT_LIMIT, MERCATOR_LAT_LIMIT)
    xt = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    latr = np.radians(lat)
    yt = np.floor((1.0 - np.log(np.tan(latr) + 1.0 / np.cos(latr))
                   / np.pi) / 2.0 * n).astype(np.int64)
    hi = 2 ** zoom - 1
    np.clip(xt, 0, hi, out=xt)
    np.clip(yt, 0, hi, out=yt)
    return xt, yt


def quadkeys(xt: np.ndarray, yt: np.ndarray, zoom: int) -> pa.Array:
    """Vectorized Bing quadkey strings for (xt, yt) at ``zoom``."""
    nrows = len(xt)
    if nrows == 0:
        return pa.array([], pa.string())
    shifts = np.arange(zoom - 1, -1, -1, dtype=np.int64)
    digits = (((yt[:, None] >> shifts) & 1) * 2
              + ((xt[:, None] >> shifts) & 1)).astype(np.uint8)
    chars = digits + ord("0")
    flat = np.frombuffer(chars.tobytes(), dtype=f"S{zoom}")
    return pa.array(flat.astype("U"), pa.string())


def add_tile_columns(batch: pa.Table, lon_col: str, lat_col: str,
                     zoom: int, with_quadkey: bool = True) -> pa.Table:
    """Append tile_x / tile_y (+ quadkey) columns to an Arrow batch."""
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    xt, yt = slippy_encode(lon, lat, zoom)
    batch = batch.append_column("tile_x", pa.array(xt))
    batch = batch.append_column("tile_y", pa.array(yt))
    if with_quadkey:
        batch = batch.append_column("quadkey", quadkeys(xt, yt, zoom))
    return batch


# base-32 alphabet of the geohash standard (no a/i/l/o)
_GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz",
                           dtype=np.uint8)


def geohash_encode(lon: np.ndarray, lat: np.ndarray,
                   precision: int = 10) -> np.ndarray:
    """Vectorized geohash strings (numpy unicode array, ``precision``
    chars).  Geohash interleaves one longitude-bisection bit then one
    latitude bit, MSB first, 5 bits per base-32 char — equivalently:
    the top ``ceil(bits/2)`` bits of floor((lon+180)/360 * 2^nlon)
    interleaved with the top ``floor(bits/2)`` bits of the latitude
    fraction.  Pure integer bit math after the two normalizing
    divisions (no transcendentals), so a SQL twin using the same
    FLOOR expressions is bit-exact."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    xi = np.floor((lon + 180.0) / 360.0 * (2.0 ** nlon)).astype(np.int64)
    yi = np.floor((lat + 90.0) / 180.0 * (2.0 ** nlat)).astype(np.int64)
    np.clip(xi, 0, 2 ** nlon - 1, out=xi)
    np.clip(yi, 0, 2 ** nlat - 1, out=yi)
    j = np.arange(bits, dtype=np.int64)
    sh_lon = nlon - 1 - j // 2
    sh_lat = nlat - 1 - j // 2
    is_lon = (j % 2) == 0
    bitvals = np.where(is_lon,
                       (xi[:, None] >> sh_lon) & 1,
                       (yi[:, None] >> sh_lat) & 1)
    weights = np.array([16, 8, 4, 2, 1], dtype=np.int64)
    charvals = (bitvals.reshape(-1, precision, 5) * weights).sum(axis=2)
    chars = _GEOHASH32[charvals]
    if len(chars) == 0:
        return np.array([], dtype=f"U{precision}")
    return np.frombuffer(chars.tobytes(), dtype=f"S{precision}").astype("U")
