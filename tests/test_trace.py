"""Geodesic cell tracing (stages/trace.py): adjacency law + endpoints."""

import numpy as np
import pyarrow as pa

from dggrid4py_ray.config import dgselect


def _trace(pairs, res, step_frac=0.25):
    import ray.data
    from dggrid4py_ray.stages.trace import cells_along_geodesics

    t = pa.table({
        "seg_id": pa.array(np.arange(len(pairs), dtype=np.int64)),
        "lon1": pa.array([p[0] for p in pairs], pa.float64()),
        "lat1": pa.array([p[1] for p in pairs], pa.float64()),
        "lon2": pa.array([p[2] for p in pairs], pa.float64()),
        "lat2": pa.array([p[3] for p in pairs], pa.float64()),
    })
    dggs = dgselect("IGEO7", resolution=res)
    out = cells_along_geodesics(ray.data.from_arrow(t), dggs, res,
                                step_frac=step_frac).to_pandas()
    return out.sort_values(["seg_id", "seq"], ignore_index=True)


def test_trace_endpoints_and_adjacency(ray_session):
    from dggrid4py_ray.dggs.igeo7 import IGeo7Grid, INVALID_ID

    rng = np.random.default_rng(5)
    n = 40
    lon1 = rng.uniform(-180, 180, n)
    lat1 = np.degrees(np.arcsin(rng.uniform(-0.99, 0.99, n)))
    # mid-range segments (300-3000 km-ish): offset in lon/lat
    lon2 = ((lon1 + rng.uniform(-25, 25, n) + 180) % 360) - 180
    lat2 = np.clip(lat1 + rng.uniform(-20, 20, n), -89, 89)
    pairs = list(zip(lon1, lat1, lon2, lat2))
    res = 4
    out = _trace(pairs, res)
    g = IGeo7Grid()
    enc1 = g.encode(lon1, lat1, res)
    enc2 = g.encode(lon2, lat2, res)
    for i in range(n):
        path = out[out.seg_id == i]["cell_id"].to_numpy()
        assert path[0] == enc1[i] and path[-1] == enc2[i]
        assert len(np.unique(path)) >= 1
        # no immediate repeats
        assert (path[1:] != path[:-1]).all()
        # adjacency law: consecutive trace cells are edge neighbors
        nb = g.neighbors(path[:-1].astype(np.int64))
        ok = (nb == path[1:][:, None]).any(axis=1)
        assert ok.all(), (i, np.flatnonzero(~ok))


def test_trace_zero_length_segment(ray_session):
    out = _trace([(24.75, 59.44, 24.75, 59.44)], 5)
    assert len(out) == 1 and out["seq"].iloc[0] == 0


def test_trace_antipodal_raises(ray_session):
    import pytest
    with pytest.raises(Exception, match="antipodal"):
        _trace([(0.0, 0.0, 180.0, 0.0)], 3)
