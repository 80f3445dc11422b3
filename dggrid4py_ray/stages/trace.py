"""Geodesic cell tracing: the cells a great-circle path crosses (the H3
``gridPathCells`` analog on IGEO7 — beyond the reference, which has no
line operator; cf. reference igeo7_ext neighbor algebra used for the
adjacency law this operator is tested against).

Scale shape: a pure ``map_batches`` stage — each (lon1,lat1)->(lon2,lat2)
segment is sampled along the great circle at ``step_frac`` x CLS(res)
spacing (vectorized slerp over a flat ragged expansion, one encode call
per batch, consecutive-duplicate collapse per segment).  Segments never
shuffle; output is (segment id, seq, cell_id).

Sampling at <=0.3 x CLS cannot skip a cell of the hex tiling along the
path's interior (hex min width ~0.87 x CLS, and hex tilings have no
4-corner vertices: any two cells meeting at a vertex share an edge), so
consecutive trace cells are edge-neighbors — property-tested against
``IGeo7Grid.neighbors`` in tests/test_trace.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import Dggs


def _unit(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lam, phi = np.radians(lon), np.radians(lat)
    return np.stack([np.cos(phi) * np.cos(lam),
                     np.cos(phi) * np.sin(lam),
                     np.sin(phi)], axis=-1)


def _lonlat(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (np.degrees(np.arctan2(v[:, 1], v[:, 0])),
            np.degrees(np.arcsin(np.clip(v[:, 2], -1.0, 1.0))))


class GeodesicTracer:
    """map_batches actor: (id, lon1, lat1, lon2, lat2) rows ->
    (id, seq, cell_id) trace rows."""

    def __init__(self, dggs: Dggs, resolution: int | None = None,
                 id_col: str = "seg_id", step_frac: float = 0.25,
                 cols=("lon1", "lat1", "lon2", "lat2")):
        from ..dggs.stats import cls_km

        self.dggs = dggs
        self.res = resolution if resolution is not None else dggs.resolution
        self.id_col = id_col
        self.cols = cols
        # sample spacing in radians on the unit sphere
        R = 6371.0072
        self.step_rad = step_frac * cls_km(self.res) / R

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .encode import grid_for

        if batch.num_rows == 0:
            return pa.table({self.id_col: batch[self.id_col],
                             "seq": pa.array([], pa.int64()),
                             "cell_id": pa.array([], pa.int64())})
        g = grid_for(self.dggs)
        c = [batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in self.cols]
        a, b = _unit(c[0], c[1]), _unit(c[2], c[3])
        dot = np.clip(np.einsum("ij,ij->i", a, b), -1.0, 1.0)
        theta = np.arccos(dot)
        if (theta > np.pi - 1e-6).any():
            raise ValueError(
                "cells_along_geodesics: (near-)antipodal segment — the "
                "great circle is ambiguous; split it with an explicit "
                "intermediate waypoint")
        n = np.maximum(np.ceil(theta / self.step_rad).astype(np.int64) + 1, 2)
        # ragged flat expansion: sample j/(n_i-1) for j in 0..n_i-1
        offs = np.concatenate([[0], np.cumsum(n)])
        total = int(offs[-1])
        seg = np.repeat(np.arange(len(n), dtype=np.int64), n)
        j = np.arange(total, dtype=np.int64) - offs[seg]
        t = j / (n[seg] - 1)
        # slerp (antipodal pairs would need an intermediate waypoint;
        # sin(theta)=0 also at theta=0, where t*theta=0 handles it)
        st = np.sin(theta[seg])
        safe = st > 1e-12
        w1 = np.where(safe, np.sin((1.0 - t) * theta[seg]) / np.where(safe, st, 1.0), 1.0 - t)
        w2 = np.where(safe, np.sin(t * theta[seg]) / np.where(safe, st, 1.0), t)
        p = w1[:, None] * a[seg] + w2[:, None] * b[seg]
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        lon, lat = _lonlat(p)
        cells = np.asarray(g.encode(lon, lat, self.res), dtype=np.int64)
        # collapse consecutive duplicates within each segment
        first = np.r_[True, (cells[1:] != cells[:-1]) | (seg[1:] != seg[:-1])]
        keep_seg, keep_cell = seg[first], cells[first]
        # seq within segment
        new_seg = np.r_[True, keep_seg[1:] != keep_seg[:-1]]
        starts = np.flatnonzero(new_seg)
        start_rep = np.repeat(starts, np.diff(np.append(starts, len(keep_seg))))
        seq = np.arange(len(keep_seg), dtype=np.int64) - start_rep
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({self.id_col: pa.array(ids[keep_seg]),
                         "seq": pa.array(seq),
                         "cell_id": pa.array(keep_cell)})


def cells_along_geodesics(ds, dggs: Dggs, resolution: int | None = None,
                          id_col: str = "seg_id", step_frac: float = 0.25,
                          cols=("lon1", "lat1", "lon2", "lat2"),
                          concurrency=None):
    """Trace each row's great-circle segment into an ordered cell path:
    (id_col, seq, cell_id).  Pure map — segments never shuffle.

    The tracer ships as a tiny picklable instance into a TASK pool (no
    actor-pool cap — the measured 2-3x loss of capped pools on this box);
    the grid engine itself is per-process cached by ``grid_for``."""
    tracer = GeodesicTracer(dggs, resolution, id_col, step_frac, cols)
    return ds.map_batches(tracer, batch_format="pyarrow",
                          concurrency=concurrency)
