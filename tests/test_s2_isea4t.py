"""S2 and ISEA4T/4D grid engines."""

import numpy as np
import pytest

from dggrid4py_ray.dggs import isea4t, s2


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(21)
    n = 5000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    return lon, lat


def test_s2_roundtrip(pts):
    lon, lat = pts
    for lvl in [2, 10, 20, 30]:
        cid = s2.encode(lon, lat, lvl)
        assert np.all(s2.level_of(cid) == lvl)
        clon, clat = s2.decode_center(cid)
        assert np.array_equal(s2.encode(clon, clat, lvl), cid)


def test_s2_hierarchy(pts):
    lon, lat = pts
    cid = s2.encode(lon, lat, 12)
    par = s2.parent(cid)
    # quadtrees nest exactly: parent == encode at coarser level
    assert np.array_equal(par, s2.encode(lon, lat, 11))
    ch = s2.children(par)
    assert ((ch == cid[:, None]).any(axis=1)).all()
    assert np.array_equal(s2.parent(cid, 5), s2.encode(lon, lat, 5))


def test_s2_face_partition(pts):
    lon, lat = pts
    cid = s2.encode(lon, lat, 0)
    assert len(np.unique(cid)) == 6
    counts = np.bincount((np.asarray(cid) >> 61) & 0x7, minlength=6)
    assert counts.min() > 0.1 * len(lon)  # roughly even faces


def test_isea4t_roundtrip(pts):
    lon, lat = pts
    g = isea4t.ISEA4TGrid()
    for res in [0, 4, 8]:
        t = g.encode(lon, lat, res)
        lo, la = g.decode(t, res)
        assert (g.encode(lo, la, res) == t).all()
        assert len(np.unique(t)) <= isea4t.ISEA4TGrid.num_cells(res)


def test_isea4t_nesting(pts):
    lon, lat = pts
    g = isea4t.ISEA4TGrid()
    t = g.encode(lon, lat, 7)
    assert np.array_equal(g.parent(t), g.encode(lon, lat, 6))
    ch = g.children(g.parent(t))
    assert ((ch == t[:, None]).any(axis=1)).all()


def test_isea4t_equal_area(pts):
    # 20*4^2 = 320 cells; uniform points -> near-uniform occupancy (Snyder)
    lon, lat = pts
    g = isea4t.ISEA4TGrid()
    t = g.encode(lon, lat, 2)
    counts = np.bincount(np.unique(t, return_inverse=True)[1])
    exp = len(lon) / 320
    assert counts.std() < 3 * np.sqrt(exp)


def test_isea4d(pts):
    lon, lat = pts
    g = isea4t.ISEA4DGrid()
    d = g.encode(lon, lat, 3)
    assert len(np.unique(d)) == isea4t.ISEA4DGrid.num_cells(3)
    lo, la = g.decode(d, 3)
    assert np.array_equal(g.encode(lo, la, 3), d)
    assert np.array_equal(g.parent(d), g.encode(lon, lat, 2))


def test_isea4h(pts):
    from dggrid4py_ray.dggs.isea4h import ISEA4HGrid
    lon, lat = pts
    g = ISEA4HGrid()
    for res in [0, 2, 4]:
        ids = g.encode(lon, lat, res)
        lo, la = g.decode(ids, res)
        assert np.array_equal(g.encode(lo, la, res), ids)
    # exact cell-count law at res 2 (10*4^r + 2)
    ids = g.encode(lon, lat, 2)
    assert len(np.unique(ids)) == ISEA4HGrid.num_cells(2) == 162


def test_binning_all_grids(ray_session):
    import pyarrow as pa
    import ray.data
    from dggrid4py_ray.pipelines.binning import bin_point_vals
    rng = np.random.default_rng(1)
    n = 4000
    tbl = pa.table({"lon": rng.uniform(-30, 30, n), "lat": rng.uniform(-20, 20, n),
                    "value": rng.normal(5, 1, n)})
    for t in ["IGEO7", "ISEA4H", "ISEA4T", "ISEA4D"]:
        out = bin_point_vals(ray.data.from_arrow(tbl), t, resolution=3,
                             value_col="value").to_pandas()
        assert out["count_value"].sum() == n, t


def test_isea3h(pts):
    from dggrid4py_ray.dggs.isea4h import ISEA3HGrid
    lon, lat = pts
    g = ISEA3HGrid()
    for res in [0, 1, 2, 3, 4]:
        ids = g.encode(lon, lat, res)
        lo, la = g.decode(ids, res)
        assert np.array_equal(g.encode(lo, la, res), ids), res
    # exact aperture-3 cell-count law (alternating vertex/centroid lattices)
    for res in [1, 2, 3]:
        ids = g.encode(lon, lat, res)
        assert len(np.unique(ids)) == ISEA3HGrid.num_cells(res) == 10 * 3**res + 2


def test_isea7h_flat(pts):
    """Projection-exact aperture-7 grid (the position model the IGEO7 tree
    engine adopts next round): exact counts, exact roundtrip, regular
    geometry (no seam drift)."""
    from dggrid4py_ray.dggs.isea7h_flat import ISEA7HFlatGrid
    from dggrid4py_ray.dggs.sphere import lonlat_to_unit, angle_between
    lon, lat = pts
    g = ISEA7HFlatGrid()
    for res in [0, 1, 2]:   # 5000 sample points saturate <= 492 cells
        ids = g.encode(lon, lat, res)
        assert len(np.unique(ids)) == ISEA7HFlatGrid.num_cells(res) == 10 * 7**res + 2
    for res in [0, 2, 3, 5]:
        ids = g.encode(lon, lat, res)
        lo, la = g.decode(ids, res)
        assert np.array_equal(g.encode(lo, la, res), ids)
    # geometric regularity: every point within one nominal spacing of its center
    res = 5
    ids = g.encode(lon, lat, res)
    lo, la = g.decode(ids, res)
    d = angle_between(lonlat_to_unit(lon, lat), lonlat_to_unit(lo, la))
    assert (d < 1.1071 / 7.0 ** (res / 2)).all()
