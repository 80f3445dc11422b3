"""Spatial joins.

* PointInPolygonJoin — broadcast-small-side PIP join: the polygon set +
  STRtree are ray.put once and rebuilt per actor (never per batch); each
  batch is classified via bbox candidate pruning + exact vectorized
  ray-casting.  (SURVEY §2.8 joins row — replaces the reference's clip-region
  point-in-polygon that happened inside the DGGRID C++ process.)
* cell_equi_join — large-large equi-join keyed on cell_id via Ray Data's
  hash join, with the partition count exposed (the shuffle is keyed on the
  same cell partitioning the rest of the pipeline uses, SURVEY §7.3).
* large-large spatial join: encode both sides to a coarse cell (partition
  key = parent cell), then cogroup per cell and run the exact predicate
  locally — see spatial_join_via_cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..geometry import PolygonSet, STRtree, parse_wkb


def _join_partitions(cap: int = 32) -> int:
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus // 2))


def _build_polys(wkbs) -> tuple[list[PolygonSet], STRtree]:
    polys = []
    bboxes = []
    for b in wkbs:
        ps = PolygonSet.from_wkb([b])
        polys.append(ps)
        bboxes.append(ps.bounds)
    tree = STRtree(np.array(bboxes, dtype=np.float64))
    return polys, tree


class PointInPolygonJoin:
    """map_batches actor: adds `poly_id` (int64, -1 = no polygon) for point
    rows.  Polygons are broadcast via ray.put; the STRtree is built once per
    actor in __init__."""

    def __init__(self, polys_ref, lon_col: str = "lon", lat_col: str = "lat",
                 out_col: str = "poly_id", keep_unmatched: bool = True):
        wkbs = ray.get(polys_ref)
        self.polys, self.tree = _build_polys(wkbs)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.out_col = out_col
        self.keep_unmatched = keep_unmatched

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.full(len(lon), -1, dtype=np.int64)
        pi, poly_i = self.tree.query_points(lon, lat)
        # exact test per candidate polygon (vectorized over its points)
        for p in np.unique(poly_i):
            pts = pi[poly_i == p]
            hit = self.polys[p].contains(lon[pts], lat[pts])
            sel = pts[hit]
            # first-match semantics (lowest polygon id wins)
            take = out[sel] == -1
            out[sel[take]] = p
        res = batch.append_column(self.out_col, pa.array(out, type=pa.int64()))
        if not self.keep_unmatched:
            res = res.filter(pa.array(out != -1))
        return res


def pip_join(points: ray.data.Dataset, polygon_wkbs: list[bytes],
             lon_col: str = "lon", lat_col: str = "lat",
             keep_unmatched: bool = True,
             concurrency: int | None = None) -> ray.data.Dataset:
    ref = ray.put(list(polygon_wkbs))
    return points.map_batches(
        PointInPolygonJoin,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"lon_col": lon_col, "lat_col": lat_col,
                               "keep_unmatched": keep_unmatched},
        batch_format="pyarrow", concurrency=concurrency or (1, 4))


def cell_equi_join(left: ray.data.Dataset, right: ray.data.Dataset,
                   on: str = "cell_id", how: str = "inner",
                   num_partitions: int | None = None) -> ray.data.Dataset:
    """Large-large equi-join on a cell-id column (Ray Data hash join)."""
    np_ = num_partitions or _join_partitions()
    return left.join(right, join_type=how, num_partitions=np_, on=(on,))


def spatial_join_via_cells(points: ray.data.Dataset, polygons: ray.data.Dataset,
                           coarse_res: int = 4, lon_col: str = "lon",
                           lat_col: str = "lat", wkb_col: str = "geometry",
                           poly_id_col: str = "poly_id") -> ray.data.Dataset:
    """Large-large spatial join: both sides keyed by coarse cell (partition
    key = parent cell at `coarse_res`, SURVEY §7.3), cogrouped per cell,
    exact PIP locally.  Polygons are replicated to every coarse cell their
    bbox overlaps (cheap: polygon count >> replication factor)."""
    from ..config import dgselect
    from ..stages.encode import CellEncoder
    from ..pipelines.highlevel import _clip_from

    dggs = dgselect("IGEO7", resolution=coarse_res)
    pts = points.map_batches(CellEncoder(dggs, lon_col=lon_col, lat_col=lat_col,
                                         out_col="_ccell"),
                             batch_format="pyarrow")

    def poly_cells(batch: pa.Table) -> pa.Table:
        """Coarse-cell cover of every polygon's bbox in ONE batched encode:
        probe points for all polygons are concatenated (bounded per polygon),
        encoded together, then deduped per (polygon, cell) — no per-polygon
        Python encode calls."""
        from ..stages.encode import grid_for
        grid = grid_for(dggs)
        ids = batch[poly_id_col].to_numpy(zero_copy_only=False)
        wkbs = batch[wkb_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        step_deg = np.degrees(grid.cell_spacing_rad(coarse_res)) / 2.0
        MAXP = 64  # probe-raster side cap per polygon (margin widens instead)
        plon, plat, pidx = [], [], []
        for k, wkb in enumerate(wkbs):     # cheap per-poly bbox math only
            minx, miny, maxx, maxy = PolygonSet.from_wkb([wkb]).bounds
            sx = max(step_deg, (maxx - minx) / MAXP)
            sy = max(step_deg, (maxy - miny) / MAXP)
            gx = np.arange(minx, maxx + sx, sx)
            gy = np.arange(miny, maxy + sy, sy)
            gg0, gg1 = np.meshgrid(gx, gy)
            plon.append(gg0.ravel())
            plat.append(gg1.ravel())
            pidx.append(np.full(gg0.size, k, dtype=np.int64))
        lon = np.concatenate(plon) if plon else np.zeros(0)
        lat = np.clip(np.concatenate(plat) if plat else np.zeros(0), -90, 90)
        pidx = np.concatenate(pidx) if pidx else np.zeros(0, dtype=np.int64)
        cells = grid.encode(lon, lat, coarse_res)
        pair = np.unique(np.column_stack([pidx, cells]), axis=0)
        return pa.table({"_ccell": pa.array(pair[:, 1], type=pa.int64()),
                         poly_id_col: pa.array(ids[pair[:, 0]]),
                         wkb_col: pa.array([bytes(wkbs[k]) for k in pair[:, 0]],
                                           type=pa.binary())})

    polys = polygons.map_batches(poly_cells, batch_format="pyarrow")

    # hash join on the coarse cell, then the exact predicate locally
    joined = pts.join(polys, join_type="inner",
                      num_partitions=_join_partitions(), on=("_ccell",))

    def exact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.drop_columns([wkb_col, "_ccell"])
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        # group the joined rows by polygon and run ONE vectorized contains
        # per polygon over all its points (the PointInPolygonJoin shape) —
        # the polygon id is the grouping key, so each WKB parses once
        pids = batch[poly_id_col].to_numpy(zero_copy_only=False)
        wkbs = batch[wkb_col].to_numpy(zero_copy_only=False)
        keep = np.zeros(batch.num_rows, dtype=bool)
        order = np.argsort(pids, kind="stable")
        bounds = np.nonzero(np.diff(pids[order]))[0] + 1
        for seg in np.split(order, bounds):
            ps = PolygonSet.from_wkb([bytes(wkbs[seg[0]])])
            keep[seg] = ps.contains(lon[seg], lat[seg])
        return batch.filter(pa.array(keep)).drop_columns([wkb_col, "_ccell"])

    return joined.map_batches(exact, batch_format="pyarrow")
