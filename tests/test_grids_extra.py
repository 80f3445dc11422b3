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


class TestGrayFullerChart:
    """Gray 1995 arc-equalized Fuller chart (the DGGRID `dggs_proj FULLER`
    construction).  No golden FULLER output exists offline, so correctness
    is pinned by the chart's defining properties instead: exact edge
    arc-proportionality (the property the gnomonic chart lacks) and lower
    corner-vs-center area distortion."""

    @pytest.fixture(scope="class")
    def charts(self):
        from dggrid4py_ray.dggs.snyder import FullerProjection, GrayFullerProjection
        return FullerProjection(), GrayFullerProjection()

    def test_roundtrip_exact(self, charts):
        from dggrid4py_ray.dggs.sphere import lonlat_to_unit
        _, gr = charts
        rng = np.random.default_rng(3)
        p = lonlat_to_unit(rng.uniform(-180, 180, 5000),
                           np.degrees(np.arcsin(rng.uniform(-1, 1, 5000))))
        face, x, y = gr.forward_unit(p)
        back = gr.inverse_unit(face, x, y)
        assert np.max(np.abs(back - p)) < 1e-12

    def test_edge_arc_proportionality(self, charts):
        gn, gr = charts
        ic = gr.icosa
        for fi in [0, 7, 13, 19]:
            v = ic.vertices[ic.face_vertices[fi]]
            ts = np.linspace(0.05, 0.95, 19)
            theta = np.arccos(np.clip(v[0] @ v[1], -1, 1))
            pts = (np.sin((1 - ts)[:, None] * theta) * v[0]
                   + np.sin(ts[:, None] * theta) * v[1]) / np.sin(theta)
            faces = np.full(len(ts), fi, dtype=np.int64)
            _, ex, ey = gr._forward_on(pts, faces)
            _, x0, y0 = gr._forward_on(v[0][None], faces[:1])
            _, x1, y1 = gr._forward_on(v[1][None], faces[:1])
            frac = np.hypot(ex - x0, ey - y0) / np.hypot(x1 - x0, y1 - y0)
            assert np.max(np.abs(frac - ts)) < 1e-9      # gray: exact
            _, gx, gy = gn._forward_on(pts, faces)
            _, gx0, gy0 = gn._forward_on(v[0][None], faces[:1])
            _, gx1, gy1 = gn._forward_on(v[1][None], faces[:1])
            gfrac = np.hypot(gx - gx0, gy - gy0) / np.hypot(gx1 - gx0, gy1 - gy0)
            assert np.max(np.abs(gfrac - ts)) > 1e-2     # gnomonic: isn't

    def test_area_distortion_below_gnomonic(self, charts):
        gn, gr = charts
        ic = gr.icosa

        def area_scale(proj, p0, face, h=1e-5):
            n = p0
            a = np.array([1.0, 0, 0]) if abs(p0[0]) < 0.9 else np.array([0, 1.0, 0])
            a = a - n * (a @ n); a /= np.linalg.norm(a)
            b = np.cross(n, a)
            pts = np.stack([p0, p0 + h * a, p0 + h * b])
            pts /= np.linalg.norm(pts, axis=1, keepdims=True)
            _, xs, ys = proj._forward_on(pts, np.full(3, face, dtype=np.int64))
            ja = np.array([xs[1] - xs[0], ys[1] - ys[0]]) / h
            jb = np.array([xs[2] - xs[0], ys[2] - ys[0]]) / h
            return abs(ja[0] * jb[1] - ja[1] * jb[0])

        for fi in [0, 9, 16]:
            c = ic.face_centers[fi]
            v0 = ic.vertices[ic.face_vertices[fi, 0]]
            corner = 0.9 * v0 + 0.1 * c
            corner /= np.linalg.norm(corner)
            ratios = {}
            for proj, name in [(gn, "gn"), (gr, "gray")]:
                sc, sco = area_scale(proj, c, fi), area_scale(proj, corner, fi)
                ratios[name] = max(sc, sco) / min(sc, sco)
            assert ratios["gray"] < 0.75 * ratios["gn"]

    def test_vertices_map_to_corners(self, charts):
        _, gr = charts
        ic = gr.icosa
        for fi in range(20):
            fv = ic.vertices[ic.face_vertices[fi]]
            _, vx, vy = gr._forward_on(fv, np.full(3, fi, dtype=np.int64))
            d = np.max(np.hypot(vx - gr._corners[fi, :, 0], vy - gr._corners[fi, :, 1]))
            assert d < 1e-9

    def test_charts_differ_midface(self, charts):
        gn, gr = charts
        ic = gr.icosa
        c, v0 = ic.face_centers[0], ic.vertices[ic.face_vertices[0, 0]]
        p = 0.5 * c + 0.5 * v0; p /= np.linalg.norm(p)
        _, gx, gy = gn._forward_on(p[None], np.array([0]))
        _, rx, ry = gr._forward_on(p[None], np.array([0]))
        assert np.hypot(gx - rx, gy - ry)[0] > 1e-3

    def test_chart_for_selection(self):
        from dggrid4py_ray.dggs.snyder import (chart_for, FullerProjection,
                                               GrayFullerProjection, SnyderProjection)
        assert type(chart_for("FULLER")) is GrayFullerProjection
        assert type(chart_for("FULLER_GNOMONIC")) is FullerProjection
        assert type(chart_for("ISEA")) is SnyderProjection

    def test_fuller_gnomonic_grid_roundtrip(self, pts):
        # the opt-out chart still drives every face-lattice engine
        from dggrid4py_ray.dggs.isea4h import ISEA4HGrid
        lon, lat = pts
        g = ISEA4HGrid(projection="FULLER_GNOMONIC")
        z = g.encode(lon, lat, 4)
        clon, clat = g.decode(z, 4)
        assert np.array_equal(g.encode(clon, clat, 4), z)
