"""Windowed raster source (rasterio is not available in this environment, so
the window/block machinery operates on in-memory or .npy grids; the Ray-side
plumbing — one read task per window, bounds as metadata, vectorized
pixel->point conversion — is real and tested).

Mirrors the reference raster helpers:
* suggest_windows        — igeo7_ext.suggest_window_blocks_per_chunk
                           (igeo7_ext.py:159-179): window sizing to a memory
                           budget at 64 bytes/pixel
* windows_dataset        — igeo7_ext.extract_windows_with_bounds (:182-240):
                           one block per window with its bounds
* pixels (inside gen)    — igeo7_ext.create_geopoints_for_window (:357-408):
                           per-pixel-center points + values, nodata masked —
                           here fully vectorized (the reference loops rows in
                           Python)
* pixel_edge_len_m       — igeo7_ext.get_raster_pixel_edge_len (:295-334)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..dggs.sphere import haversine_km


@dataclass(frozen=True)
class RasterMeta:
    """Geographic raster: affine (north-up) transform in degrees."""

    width: int
    height: int
    lon0: float           # west edge
    lat0: float           # north edge
    px: float             # pixel width (deg, > 0)
    py: float             # pixel height (deg, > 0; rows go south)
    nodata: float | None = None

    def bounds(self):
        return (self.lon0, self.lat0 - self.py * self.height,
                self.lon0 + self.px * self.width, self.lat0)


@dataclass(frozen=True)
class ProjectedRasterMeta:
    """Projected raster (EPSG:3857 Web Mercator or EPSG:326xx/327xx UTM):
    affine (north-up) transform in CRS meters.  Pixel centers are converted
    to lon/lat with the in-repo CRS math (dggs/crs.py) — the reference's
    projected-CRS raster path (igeo7_ext.py:263-334) without pyproj."""

    width: int
    height: int
    x0: float             # west edge (m)
    y0: float             # north edge (m)
    px: float             # pixel width (m, > 0)
    py: float             # pixel height (m, > 0; rows go south)
    crs: str = "EPSG:3857"
    nodata: float | None = None

    # duck-typed like RasterMeta for the window machinery
    @property
    def lon0(self):
        return self.x0

    @property
    def lat0(self):
        return self.y0

    def bounds(self):
        return (self.x0, self.y0 - self.py * self.height,
                self.x0 + self.px * self.width, self.y0)


def suggest_windows(meta: RasterMeta, max_mb: float = 500.0,
                    bytes_per_pixel: int = 64, block_rows: int = 256):
    """Row-window spans sized to the memory budget (reference
    suggest_window_blocks_per_chunk: 64 B/px estimate, 500 MB default)."""
    rows_per_window = max(block_rows,
                          int(max_mb * 1e6 / (bytes_per_pixel * meta.width))
                          // block_rows * block_rows)
    spans = []
    r = 0
    while r < meta.height:
        spans.append((r, min(rows_per_window, meta.height - r)))
        r += rows_per_window
    return spans


def window_to_points(meta, row0: int, nrows: int,
                     data: np.ndarray) -> pa.Table:
    """Vectorized pixel-center points for a window (replaces the reference's
    nested Python loops, igeo7_ext.py:357-408).  Projected rasters convert
    pixel centers to lon/lat in the same vectorized pass."""
    h, w = data.shape
    assert h == nrows and w == meta.width
    cols = np.arange(w)
    rows = np.arange(row0, row0 + nrows)
    cx = meta.lon0 + (cols + 0.5) * meta.px
    cy = meta.lat0 - (rows + 0.5) * meta.py
    gx, gy = np.meshgrid(cx, cy)
    vals = data.astype(np.float64).ravel()
    mask = np.isfinite(vals)
    if meta.nodata is not None:
        mask &= vals != meta.nodata
    xm = gx.ravel()[mask]
    ym = gy.ravel()[mask]
    if isinstance(meta, ProjectedRasterMeta):
        from ..dggs.crs import projected_to_lonlat
        lon, lat = projected_to_lonlat(xm, ym, meta.crs)
    else:
        lon, lat = xm, ym
    return pa.table({
        "row": pa.array(np.repeat(rows, w)[mask].astype(np.int32)),
        "col": pa.array(np.tile(cols, nrows)[mask].astype(np.int32)),
        "lon": pa.array(lon),
        "lat": pa.array(lat),
        "data": pa.array(vals[mask]),
    })


def windows_dataset(meta: RasterMeta, read_window, max_mb: float = 64.0,
                    bytes_per_pixel: int = 64):
    """Lazy Ray Dataset of pixel points: one read task per window.

    ``read_window(row0, nrows) -> np.ndarray (nrows, width)`` must be a
    serializable callable (e.g. np.load of an .npy + slice, or a synthetic
    generator).  Each window is read inside its own Ray task, so the raster
    streams through the object store without driver materialization."""
    import ray.data

    spans = suggest_windows(meta, max_mb, bytes_per_pixel)
    idx = ray.data.from_items([{"row0": r, "nrows": n} for r, n in spans])

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for row0, nrows in zip(batch["row0"].to_numpy(), batch["nrows"].to_numpy()):
            data = read_window(int(row0), int(nrows))
            out.append(window_to_points(meta, int(row0), int(nrows), data))
        return pa.concat_tables(out) if out else window_to_points(meta, 0, 0, np.zeros((0, meta.width)))

    return idx.map_batches(load, batch_format="pyarrow", batch_size=1)


def pixel_edge_len_m(meta, lat_adjust: bool = True) -> float:
    """Approximate ground pixel edge in meters (reference
    get_raster_pixel_edge_len, igeo7_ext.py:295-334: projected CRS -> the
    transform step in meters; geographic -> haversine + optional
    per-latitude width adjustment via the std+min heuristic)."""
    if isinstance(meta, ProjectedRasterMeta):
        return float(min(meta.px, meta.py))
    lats = np.linspace(meta.lat0 - meta.py * meta.height, meta.lat0, 32)
    widths = haversine_km(0.0, lats, meta.px, lats) * 1000.0
    height_m = haversine_km(0.0, 0.0, 0.0, meta.py) * 1000.0
    if lat_adjust and np.std(widths) > 0.1 * np.mean(widths):
        w = float(np.min(widths) + np.std(widths))
    else:
        w = float(np.mean(widths))
    return min(w, height_m)


def synthetic_raster(meta: RasterMeta, seed: int = 7):
    """Deterministic synthetic read_window for tests/benchmarks."""

    def read_window(row0: int, nrows: int) -> np.ndarray:
        rows = np.arange(row0, row0 + nrows)[:, None]
        cols = np.arange(meta.width)[None, :]
        v = ((rows * 7919 + cols * 104729 + seed) % 10007).astype(np.float64) / 10.0
        if meta.nodata is not None:
            v = np.where((rows * 31 + cols * 17) % 23 == 0, meta.nodata, v)
        return v

    return read_window


def zonal_from_raster(meta: RasterMeta, read_window, dggs_type: str = "IGEO7",
                      resolution: int | None = None, max_mb: float = 64.0):
    """Full raster->vector zonal pipeline (SURVEY §3.3): windows -> pixel
    points -> cell encode -> per-cell mean/count; resolution defaults to the
    reference's pixel-size heuristic (propose_dggs_level_for_pixel_length)."""
    from ..dggs.stats import propose_res_for_pixel_size
    from ..pipelines.binning import zonal_mean

    if resolution is None:
        resolution = propose_res_for_pixel_size(pixel_edge_len_m(meta))
    ds = windows_dataset(meta, read_window, max_mb=max_mb)
    return zonal_mean(ds, dggs_type, resolution, value_col="data")


def meta_from_rasterio(path: str, band: int = 1):
    """GeoTIFF (or any rasterio-readable) file -> (meta, read_window):
    the thin adapter a rasterio-equipped deployment plugs into
    ``windows_dataset`` / ``zonal_from_raster`` (reference:
    ``igeo7_ext.py:182-240`` reads via rasterio directly).

    Requires ``rasterio`` (absent from this sandbox — gated behind the
    import so the rest of the raster machinery, which is fully tested
    over in-memory/.npy grids, never depends on it).  Geographic
    (EPSG:4326) rasters map to :class:`RasterMeta`; EPSG:3857 and UTM
    zones map to :class:`ProjectedRasterMeta` (the in-repo CRS math
    converts pixel centers, no pyproj).  ``read_window`` re-opens the
    file per task — rasterio dataset handles don't pickle, paths do."""
    try:
        import rasterio  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "meta_from_rasterio needs the 'rasterio' package; in this "
            "environment use windows_dataset over .npy/in-memory grids "
            "instead (sources/raster.py module docstring)") from e
    import rasterio as rio

    with rio.open(path) as src:
        t = src.transform
        if t.b or t.d:
            raise ValueError(f"{path}: rotated/skewed transform "
                             "unsupported (north-up rasters only)")
        nodata = src.nodata
        epsg = src.crs.to_epsg() if src.crs else 4326
        if epsg == 4326:
            meta = RasterMeta(width=src.width, height=src.height,
                              lon0=t.c, lat0=t.f, px=t.a, py=-t.e,
                              nodata=nodata)
        else:
            meta = ProjectedRasterMeta(width=src.width, height=src.height,
                                       x0=t.c, y0=t.f, px=t.a, py=-t.e,
                                       crs=f"EPSG:{int(epsg)}",
                                       nodata=nodata)

    def read_window(row0: int, nrows: int) -> np.ndarray:
        import rasterio as _rio
        from rasterio.windows import Window
        with _rio.open(path) as s:
            return s.read(band, window=Window(0, row0, s.width, nrows))

    return meta, read_window
