"""Grid engine: encode/decode/neighbors/boundary invariants."""

import numpy as np
import pytest

from dggrid4py_ray.dggs import igeo7 as ig
from dggrid4py_ray.dggs.sphere import lonlat_to_unit, angle_between


def test_encode_decode_roundtrip(grid, random_points):
    lon, lat = random_points
    for res in [0, 2, 5, 8]:
        z = grid.encode(lon, lat, res)
        assert np.all(ig.z7_resolution(z) == res)
        clon, clat = grid.decode(z)
        z2 = grid.encode(clon, clat, res)
        assert np.array_equal(z, z2), f"center-of-cell must encode to itself (res {res})"


def test_fast_encode_equals_spherical(grid, random_points):
    lon, lat = random_points
    for res in [5, 8]:
        zf = grid.encode(lon, lat, res)
        zs = grid.encode_sph(lon, lat, res)
        mism = int((zf != zs).sum())
        assert mism == 0, f"{mism} mismatches at res {res}"


def test_encode_near_bruteforce_res3(grid, random_points):
    """encode is DGGRID-style PLANAR rounding, not a spherical Voronoi: it
    may differ from the 3D-nearest center in the sliver between the planar
    hex boundary and the spherical bisector (a few % of points), but the
    assigned center must always be nearly as close as the true nearest."""
    lon, lat = random_points
    res = 3
    n = ig.num_cells(res)
    allz = grid.from_seqnum(np.arange(1, n + 1, dtype=np.int64), res)
    centers, _, _ = grid.decode_state(allz)
    pts = lonlat_to_unit(lon, lat)
    best = np.argmax(pts @ centers.T, axis=1)
    bf = allz[best]
    d_best = np.arccos(np.clip((pts * centers[best]).sum(axis=1), -1, 1))
    z = grid.encode(lon, lat, res)
    frac_diff = (z != bf).mean()
    assert frac_diff < 0.06, f"{frac_diff:.3f} differ from 3D-nearest"
    clon, clat = grid.decode(z)
    d_asn = angle_between(pts, lonlat_to_unit(clon, clat))
    assert np.all(d_asn <= d_best + 0.25 * ig._D[res])


def test_neighbors_symmetric(grid):
    res = 3
    z = grid.from_seqnum(np.arange(1, ig.num_cells(res) + 1, dtype=np.int64), res)
    nb = grid.neighbors(z)
    counts = (nb != ig.INVALID_ID).sum(axis=1)
    pent = ig.z7_is_pentagon(z)
    # projection-exact lattice: pentagons have exactly 5 neighbors, every
    # hexagon exactly 6, adjacency perfectly symmetric
    assert np.all(counts[pent] == 5)
    assert np.all(counts[~pent] == 6)
    idx = {int(v): i for i, v in enumerate(z)}
    total = bad = 0
    for i in range(len(z)):
        for v in nb[i]:
            if v != ig.INVALID_ID:
                total += 1
                if int(z[i]) not in nb[idx[int(v)]].tolist():
                    bad += 1
    assert bad == 0, f"{bad}/{total} asymmetric adjacencies"


def test_boundary_contains_center(grid, random_points):
    from dggrid4py_ray.geometry import PolygonSet
    lon, lat = random_points
    z = np.unique(grid.encode(lon[:500], lat[:500], 5))
    verts = grid.boundary(z)
    clon, clat = grid.decode(z)
    for i in range(0, len(z), 11):
        ring = verts[i][~np.isnan(verts[i, :, 0])]
        if np.abs(np.diff(ring[:, 0])).max() > 180:
            continue  # dateline-crossing ring; covered by dateline tests
        ps = PolygonSet([[ring]])
        assert ps.contains(np.array([clon[i]]), np.array([clat[i]]))[0]


def test_vertex_radius(grid, random_points):
    # projection-exact lattice: cell circumradius is tightly bounded at every
    # resolution (no pentagon-seam stretch), incl. fine res
    lon, lat = random_points
    for res in [3, 6]:
        z = np.unique(grid.encode(lon[:800], lat[:800], res))
        verts = grid.boundary(z)
        c = lonlat_to_unit(*grid.decode(z))
        v0 = lonlat_to_unit(verts[:, 0, 0], verts[:, 0, 1])
        r = angle_between(c, v0) / ig._D[res]
        # regular hex circumradius = d/sqrt(3) ~ 0.577; Snyder area-preserving
        # distortion stretches it to <= ~0.70
        assert 0.5 < np.median(r) < 0.7
        assert r.max() < 0.75, f"res {res}: max vertex radius {r.max():.3f}"


def test_encode_distance_bound(grid, random_points):
    """Every point lands within one cell spacing of its assigned center —
    the geometric-regularity property the round-1 tree model violated in
    pentagon-seam bands (p90 ~75 spacings at res 9)."""
    lon, lat = random_points
    for res in [6, 9]:
        z = grid.encode(lon, lat, res)
        clon, clat = grid.decode(z)
        d = angle_between(lonlat_to_unit(lon, lat),
                          lonlat_to_unit(clon, clat)) / ig._D[res]
        assert d.max() < 0.75, f"res {res}: max dist {d.max():.3f} spacings"


def test_k_ring(grid):
    z = grid.encode(np.array([12.3]), np.array([45.6]), 5)
    rings = grid.k_ring(z, 2)
    # k=2 ring of a hexagon: 1 + 6 + 12 = 19 cells
    assert len(rings[0]) == 19


def test_encode_rejects_non_finite(grid):
    with pytest.raises(ValueError, match="non-finite"):
        grid.encode(np.array([np.nan]), np.array([0.0]), 5)
    with pytest.raises(ValueError, match="non-finite"):
        grid.encode(np.array([0.0]), np.array([np.inf]), 5)
