"""ISEA43H mixed-aperture, FULLER projection family, Z3 codecs, and the
PLANE/VERTEX2DD output address types."""

import numpy as np
import pytest

from dggrid4py_ray.config import dgselect
from dggrid4py_ray.stages.encode import make_grid


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 1500)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 1500)))
    return lon, lat


def test_isea43h_counts_and_roundtrip(pts):
    from dggrid4py_ray.dggs.isea4h import ISEA43HGrid
    lon, lat = pts
    g = ISEA43HGrid(ap4_levels=2)
    # cells law: 10 * 4^min(r,a) * 3^max(r-a,0) + 2
    assert g.num_cells_mixed(1) == 42
    assert g.num_cells_mixed(2) == 162
    assert g.num_cells_mixed(3) == 482
    assert g.num_cells_mixed(4) == 1442
    for res in [1, 2, 3, 4, 5]:
        z = g.encode(lon, lat, res)
        clon, clat = g.decode(z, res)
        assert np.array_equal(g.encode(clon, clat, res), z)


def test_planetrisk_superfund_presets(pts):
    lon, lat = pts
    for preset in ["PLANETRISK", "SUPERFUND", "ISEA43H", "FULLER43H"]:
        dggs = dgselect(preset, resolution=4)
        assert dggs.aperture == 43 and dggs.mixed_aperture_level
        g = make_grid(dggs)
        z = g.encode(lon, lat, 4)
        clon, clat = g.decode(z)
        assert np.array_equal(g.encode(clon, clat, 4), z)


def test_fuller_presets_roundtrip(pts):
    lon, lat = pts
    for preset, res in [("FULLER4H", 4), ("FULLER3H", 4), ("FULLER4T", 5),
                        ("FULLER4D", 5)]:
        dggs = dgselect(preset, resolution=res)
        assert dggs.projection == "FULLER"
        g = make_grid(dggs)
        z = g.encode(lon, lat, res)
        clon, clat = g.decode(z)
        assert np.array_equal(g.encode(clon, clat, res), z)


def test_fuller_projection_exact_inverse():
    from dggrid4py_ray.dggs.snyder import FullerProjection
    from dggrid4py_ray.dggs.sphere import lonlat_to_unit
    proj = FullerProjection()
    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 2000)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 2000)))
    p = lonlat_to_unit(lon, lat)
    face, x, y = proj.forward_unit(p)
    back = proj.inverse_unit(face, x, y)
    assert np.max(np.abs(back - p)) < 1e-12


def test_z3_codec_full_universe():
    from dggrid4py_ray.dggs.isea4h import (ISEA3HGrid, z3_pack, z3_unpack,
                                           z3_to_string, z3_from_string)
    g = ISEA3HGrid()
    for res in [0, 1, 2, 3, 4]:
        ids = g.enumerate_cells(res)
        assert len(ids) == 10 * 3**res + 2
        z3 = z3_pack(ids, res)
        assert len(np.unique(z3)) == len(ids)
        assert np.array_equal(z3_unpack(z3, res), ids)
        s = z3_to_string(z3, res)
        assert np.array_equal(z3_from_string(s, res), z3)


def test_plane_and_vertex2dd(grid):
    from dggrid4py_ray.dggs.codecs import AddressCodec
    codec = AddressCodec(grid, 4)
    z = grid.encode(np.array([10.0, -120.0, 30.0]), np.array([50.0, -30.0, 0.0]), 4)
    x, y = codec.emit(z, "PLANE")
    assert np.isfinite(x).all() and np.isfinite(y).all()
    arr = codec._as_arrow((x, y), "PLANE")
    assert arr.type.num_fields == 2
    verts = codec.emit(z, "VERTEX2DD")
    va = codec._as_arrow(verts, "VERTEX2DD")
    assert all(len(v) in (6, 7) for v in va.to_pylist())
    # output-only, like the reference
    with pytest.raises(ValueError):
        codec.parse((x, y), "PLANE")


def test_h3_layout_roundtrip(grid, pts):
    from dggrid4py_ray.dggs.h3like import z7_to_h3layout, h3layout_to_z7
    lon, lat = pts
    for res in [0, 4, 9, 15]:
        z7 = grid.encode(lon, lat, res)
        h3 = z7_to_h3layout(z7)
        # layout fields per the published H3 spec
        h = h3.view("uint64")
        assert ((h >> 59) & 0xF == 1).all()            # mode = cell
        assert ((h >> 52) & 0xF == res).all()          # resolution field
        assert (h >> 63 == 0).all()                    # reserved high bit
        assert np.array_equal(h3layout_to_z7(h3), z7)


def test_h3_layout_encoder_stage(ray_session, pts):
    import pyarrow as pa
    import ray.data
    from dggrid4py_ray.dggs.h3like import H3LayoutEncoder, h3layout_to_z7
    lon, lat = pts
    ds = ray.data.from_arrow(pa.table({"lon": lon, "lat": lat}))
    out = ds.map_batches(H3LayoutEncoder(resolution=7),
                         batch_format="pyarrow").take_batch(2000, batch_format="pyarrow")
    z7 = h3layout_to_z7(out["h3_id"].to_numpy())
    from dggrid4py_ray.dggs import igeo7 as ig
    assert (ig.z7_resolution(z7) == 7).all()
