"""Spatial interpolation: inverse-distance-weighted (IDW) surfaces.

``idw_grid`` interpolates a scattered point attribute onto a regular
lon/lat site grid — the classic "points -> continuous surface" step of a
zonal/raster pipeline (the inverse of ``sources/raster.pixels->points``).

IDW with a GLOBAL neighborhood is a ratio of two sums over all points,
both decomposable per site:

    idw(s) = sum_p w(s,p) * v_p / sum_p w(s,p),   w = 1 / (d(s,p)^2 + eps)

so the Ray shape is pure streaming: the site grid is closed-form (computed
in the UDF, nothing to broadcast), each batch emits ONE partial-sum row
per site (a (batch x sites) vectorized haversine matrix), and a
bounded-key aggregate (#sites rows) finishes the ratio.  No shuffle of
the point data, no driver materialization — at 100 TB of points the
exchange volume is #batches x #sites tiny partial rows.

Distances are great-circle central angles (haversine, radians) — exactly
the SQL-expressible formula, which keeps the operator DuckDB-oracle-able.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def grid_sites(nx: int, ny: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Closed-form regular lon/lat grid: site (i, j) sits at the center of
    cell i of nx longitude columns and j of ny latitude rows."""
    i = np.repeat(np.arange(nx, dtype=np.int64), ny)
    j = np.tile(np.arange(ny, dtype=np.int64), nx)
    lon = -180.0 + 360.0 * (i + 0.5) / nx
    lat = -90.0 + 180.0 * (j + 0.5) / ny
    return i, j, lon, lat


def idw_grid(points: ray.data.Dataset, value_col: str = "value",
             lon_col: str = "lon", lat_col: str = "lat",
             nx: int = 24, ny: int = 12, eps: float = 1e-6,
             batch_size: int = 8192) -> ray.data.Dataset:
    """IDW (power 2) of ``value_col`` onto the (nx x ny) site grid.
    Returns one row per site: (si, sj, sum_wv, sum_w) — callers divide
    (kept as sums so the aggregate stays exactly associative).

    ``batch_size`` bounds the (batch x sites) distance matrix: the kernel
    allocates ~3 float64 temporaries of that shape, so 8192 x 288 is
    ~57 MB of scratch per task — an explicit cap because a whole-block
    batch (hundreds of MB per temporary) pages instead of computing."""
    si, sj, slon, slat = grid_sites(nx, ny)
    srad_lat = np.radians(slat)
    srad_lon = np.radians(slon)
    cos_slat = np.cos(srad_lat)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"si": pa.array([], pa.int64()),
                             "sj": pa.array([], pa.int64()),
                             "swv": pa.array([], pa.float64()),
                             "sw": pa.array([], pa.float64())})
        lon = np.radians(t[lon_col].to_numpy(zero_copy_only=False)
                         .astype(np.float64))
        lat = np.radians(t[lat_col].to_numpy(zero_copy_only=False)
                         .astype(np.float64))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # (points x sites) haversine central angle; temporaries reused
        # in place so the scratch stays at ~3 matrices
        a = np.sin((lat[:, None] - srad_lat[None, :]) / 2.0)
        np.square(a, out=a)
        b = np.sin((lon[:, None] - srad_lon[None, :]) / 2.0)
        np.square(b, out=b)
        b *= np.cos(lat)[:, None]
        b *= cos_slat[None, :]
        a += b
        np.minimum(a, 1.0, out=a)
        np.sqrt(a, out=a)
        np.arcsin(a, out=a)
        a *= 2.0                       # central angle d
        np.square(a, out=a)
        a += eps
        np.reciprocal(a, out=a)        # w = 1/(d^2 + eps)
        return pa.table({"si": pa.array(si), "sj": pa.array(sj),
                         "swv": pa.array(a.T @ v),
                         "sw": pa.array(a.sum(axis=0))})

    return (points.map_batches(partial, batch_format="pyarrow",
                               batch_size=batch_size)
                  .groupby(["si", "sj"])
                  .aggregate(Sum("swv", alias_name="sum_wv"),
                             Sum("sw", alias_name="sum_w")))
