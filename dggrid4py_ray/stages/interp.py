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


def stencil_smooth(cells: ray.data.Dataset, x_col: str, y_col: str,
                   val_cols: dict, radius: int = 1,
                   unbounded_cells: bool = True) -> ray.data.Dataset:
    """(2r+1)^2 neighborhood aggregation on an integer grid — kernel
    smoothing / focal statistics over binned cells (the raster "focal
    sum" in DGGS clothing).  Input: one row per OCCUPIED cell (x, y,
    values); output: the same cells with each value column replaced by
    its window SUM over the (2r+1)^2 neighborhood (``val_cols`` maps
    input -> output names), plus the cell's own columns preserved as
    ``own_<col>``.

    Shape: shift-and-aggregate, the dual of a stencil convolution — each
    occupied cell EMITS its value to its (2r+1)^2 neighbor positions
    (bounded fan-out, vectorized repeat+tile), then ONE grouped sum; the
    identity shift carries an occupancy flag so the output is restricted
    to occupied cells without a join.  Works on any integer lattice; the
    grid is treated as non-periodic (no lon wraparound — callers with a
    periodic axis pre-wrap the emitted coordinates).
    """
    from .groupagg import grouped_reduce
    from ray.data.aggregate import Sum

    R = 2 * radius + 1
    in_cols = list(val_cols)
    dx = np.tile(np.arange(-radius, radius + 1), R)
    dy = np.repeat(np.arange(-radius, radius + 1), R)
    ident = np.flatnonzero((dx == 0) & (dy == 0))[0]

    def emit(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            out = {x_col: t[x_col], y_col: t[y_col],
                   "_occ": pa.array([], pa.int64())}
            for c in in_cols:
                out[f"_w_{c}"] = pa.array([], pa.float64())
                out[f"_o_{c}"] = pa.array([], pa.float64())
            return pa.table(out)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = np.repeat(np.arange(n), R * R)
        sx = x[rep] + np.tile(dx, n)
        sy = y[rep] + np.tile(dy, n)
        occ = np.zeros(n * R * R, dtype=np.int64)
        occ[np.arange(n) * R * R + ident] = 1
        out = {x_col: pa.array(sx), y_col: pa.array(sy),
               "_occ": pa.array(occ)}
        for c in in_cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            out[f"_w_{c}"] = pa.array(v[rep])
            out[f"_o_{c}"] = pa.array(v[rep] * occ)
        return pa.table(out)

    emitted = cells.map_batches(emit, batch_format="pyarrow")
    col_map = {"_occ": "_occ"}
    for c in in_cols:
        col_map[f"_w_{c}"] = f"_w_{c}"
        col_map[f"_o_{c}"] = f"_o_{c}"
    if unbounded_cells:
        agg = grouped_reduce(emitted, [x_col, y_col], col_map, how="sum")
    else:
        agg = emitted.groupby([x_col, y_col]).aggregate(
            *[Sum(c, alias_name=c) for c in col_map])

    def finish(t: pa.Table) -> pa.Table:
        keep = pa.array(
            t["_occ"].to_numpy(zero_copy_only=False) > 0)
        t = t.filter(keep)
        out = {x_col: t[x_col], y_col: t[y_col]}
        for c in in_cols:
            out[val_cols[c]] = t[f"_w_{c}"]
            out[f"own_{c}"] = t[f"_o_{c}"]
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def gi_star(cells: ray.data.Dataset, x_col: str, y_col: str, val_col: str,
            radius: int = 1, z_col: str = "z") -> ray.data.Dataset:
    """Getis-Ord Gi* hotspot statistic over the OCCUPIED cells of an
    integer lattice (binary weights, (2r+1)^2 window including self):

        z_i = (G_i - mean * W_i) / (S * sqrt((n W_i - W_i^2) / (n - 1)))

    where G_i is the focal value sum, W_i the count of occupied neighbors
    (edge cells naturally have smaller W_i), and n / mean / S are the
    global moments over occupied cells.  The study region is the occupied
    set — absent cells are excluded rather than zero-filled (the sparse
    convention; callers wanting the dense-region statistic densify first).

    Scale shape: one narrow global-moment pass (3 scalars), one
    stencil_smooth (shift-and-aggregate, no join), one pure map.  Values
    must be integers for the moments to be exact across engines."""
    def moments(t: pa.Table) -> pa.Table:
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([int(v.sum())], pa.int64()),
                         "ss": pa.array([int((v * v).sum())], pa.int64())})

    mom = cells.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, s, ss = int(mom["n"]), int(mom["s"]), int(mom["ss"])
    if n < 2:
        raise ValueError("gi_star needs at least 2 occupied cells")
    xbar = s / n
    S = np.sqrt(ss / n - (s / n) * (s / n))

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("_one", pa.array(np.ones(t.num_rows,
                                                        np.int64)))

    foc = stencil_smooth(cells.map_batches(ones, batch_format="pyarrow"),
                         x_col, y_col, {val_col: "_G", "_one": "_W"},
                         radius=radius)

    def finish(t: pa.Table) -> pa.Table:
        G = t["_G"].to_numpy(zero_copy_only=False)
        W = t["_W"].to_numpy(zero_copy_only=False)
        denom = S * np.sqrt((n * W - W * W) / (n - 1.0))
        z = (G - xbar * W) / denom
        return pa.table({
            x_col: t[x_col], y_col: t[y_col],
            "focal_sum": pa.array(G.astype(np.int64)),
            "n_neighbors": pa.array(W.astype(np.int64)),
            z_col: pa.array(z)})

    return foc.map_batches(finish, batch_format="pyarrow")


def local_moran(cells: ray.data.Dataset, x_col: str, y_col: str,
                val_col: str, radius: int = 1,
                i_col: str = "moran_i") -> ray.data.Dataset:
    """Local Moran's I (LISA) over the OCCUPIED cells of an integer
    lattice with binary weights, self EXCLUDED (the Anselin 1995 local
    indicator):

        I_i = (x_i - xbar) * sum_{j in ring(i)} (x_j - xbar) / m2

    where m2 = ss/n - xbar^2 is the population variance of occupied
    cells.  Positive I = the cell sits in a high-high or low-low
    cluster; negative = spatial outlier.  Same scale shape as
    ``gi_star``: one 3-scalar moments pass, one shift-and-aggregate
    stencil, one pure map — the self term is removed algebraically
    (lag = (focal_sum - x_i) - xbar * (W_i - 1)) instead of a second
    stencil.  Values must be integers for exact cross-engine moments."""
    def moments(t: pa.Table) -> pa.Table:
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([int(v.sum())], pa.int64()),
                         "ss": pa.array([int((v * v).sum())], pa.int64())})

    mom = cells.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, s, ss = int(mom["n"]), int(mom["s"]), int(mom["ss"])
    if n < 2:
        raise ValueError("local_moran needs at least 2 occupied cells")
    xbar = s / n
    m2 = ss / n - xbar * xbar

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("_one", pa.array(np.ones(t.num_rows,
                                                        np.int64)))

    foc = stencil_smooth(cells.map_batches(ones, batch_format="pyarrow"),
                         x_col, y_col, {val_col: "_G", "_one": "_W"},
                         radius=radius)

    def finish(t: pa.Table) -> pa.Table:
        G = t["_G"].to_numpy(zero_copy_only=False).astype(np.int64)
        W = t["_W"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t[f"own_{val_col}"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lag = (G - x) - xbar * (W - 1)
        mi = (x - xbar) * lag / m2
        return pa.table({
            x_col: t[x_col], y_col: t[y_col],
            val_col: pa.array(x),
            "lag_sum": pa.array(G - x),
            "n_neighbors": pa.array(W - 1),
            i_col: pa.array(mi)})

    return foc.map_batches(finish, batch_format="pyarrow")


def global_moran(cells: ray.data.Dataset, x_col: str, y_col: str,
                 val_col: str, radius: int = 1) -> pa.Table:
    """GLOBAL Moran's I spatial-autocorrelation statistic over the
    OCCUPIED cells of an integer lattice, binary (2r+1)^2 weights with
    self excluded (the classic companion to ``local_moran``):

        I = (n / W) * sum_i (x_i - m)(S_i - m W'_i) / sum_i (x_i - m)^2

    where S_i / W'_i are the occupied-neighbor value sum / count.  The
    whole statistic folds from SEVEN integer scalars (n, s, ss,
    sum x_i S_i, sum x_i W'_i, sum S_i, sum W'_i) — so a SQL twin that
    accumulates the same integers reproduces I bit-for-bit regardless of
    either engine's summation order.  Scale shape: one stencil_smooth
    shift-and-aggregate + one narrow partial pass; the driver folds an
    answer-sized scalar row.  Values must be integers.  Returns a 1-row
    Arrow table with the seven partials and ``moran_i``."""
    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("_one", pa.array(np.ones(t.num_rows,
                                                        np.int64)))

    foc = stencil_smooth(cells.map_batches(ones, batch_format="pyarrow"),
                         x_col, y_col, {val_col: "_G", "_one": "_W"},
                         radius=radius)

    def partial(t: pa.Table) -> pa.Table:
        x = t[f"own_{val_col}"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        G = t["_G"].to_numpy(zero_copy_only=False).astype(np.int64)
        W = t["_W"].to_numpy(zero_copy_only=False).astype(np.int64)
        S, Wp = G - x, W - 1
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "s": pa.array([int(x.sum())], pa.int64()),
            "ss": pa.array([int((x * x).sum())], pa.int64()),
            "sxs": pa.array([int((x * S).sum())], pa.int64()),
            "sxw": pa.array([int((x * Wp).sum())], pa.int64()),
            "ssum": pa.array([int(S.sum())], pa.int64()),
            "wsum": pa.array([int(Wp.sum())], pa.int64())})

    tot = foc.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().sum()
    n, s, ss = int(tot["n"]), int(tot["s"]), int(tot["ss"])
    sxs, sxw = int(tot["sxs"]), int(tot["sxw"])
    ssum, wsum = int(tot["ssum"]), int(tot["wsum"])
    if n < 2 or wsum == 0:
        raise ValueError("global_moran needs >= 2 occupied cells with "
                         "at least one neighboring pair")
    m = s / n
    num = sxs - m * sxw - m * ssum + m * m * wsum
    den = ss - n * m * m
    if den == 0:
        raise ValueError("global_moran: every occupied cell holds the "
                         "same value (zero variance) — Moran's I is "
                         "undefined for a constant field")
    moran = 1.0 * n / wsum * num / den
    return pa.table({
        "n": pa.array([n], pa.int64()), "s": pa.array([s], pa.int64()),
        "ss": pa.array([ss], pa.int64()),
        "sxs": pa.array([sxs], pa.int64()),
        "sxw": pa.array([sxw], pa.int64()),
        "ssum": pa.array([ssum], pa.int64()),
        "wsum": pa.array([wsum], pa.int64()),
        "moran_i": pa.array([moran], pa.float64())})
