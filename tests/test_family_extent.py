"""Extent generation for the non-aperture-7 families (round 5): the
reference demo's ISEA4T/ISEA3H grid_cell_polygons_for_extent /
grid_cellids_for_extent calls, served by the enumeration path with exact
triangle/diamond corner clipping."""

import numpy as np
import pytest

from dggrid4py_ray.geometry import PolygonSet, box, parse_wkb

EST = (20.2, 57.0, 28.4, 60.0)


def test_isea4t_whole_earth_count(ray_session):
    from dggrid4py_ray.pipelines.highlevel import grid_cellids_for_extent
    n = grid_cellids_for_extent("ISEA4T", 3).count()
    assert n == 20 * 4**3


def test_isea4d_whole_earth_count(ray_session):
    from dggrid4py_ray.pipelines.highlevel import grid_cellids_for_extent
    n = grid_cellids_for_extent("ISEA4D", 3).count()
    assert n == 10 * 4**3


def test_isea4t_clipped_polygons_exact(ray_session):
    from dggrid4py_ray.config import dgselect
    from dggrid4py_ray.pipelines.highlevel import (
        grid_cell_polygons_for_extent)
    from dggrid4py_ray.stages.encode import grid_for

    out = grid_cell_polygons_for_extent("ISEA4T", 5,
                                        clip_bbox=EST).to_pandas()
    assert len(out) > 10
    clip = box(*EST)
    grid = grid_for(dgselect("ISEA4T", resolution=5))
    for cid, wkb in zip(out["cell_id"], out["geometry"]):
        rings = parse_wkb(wkb)[1]
        ring = rings[0]
        # every kept cell really intersects the clip box
        assert clip.intersects_ring(ring[:-1])
    # completeness: every cell whose centroid is inside the box is kept
    ids = grid.inner.enumerate_cells(5)
    lon, lat = grid.inner.decode(ids, 5)
    inside = clip.contains(lon, lat)
    assert set(ids[inside]).issubset(set(out["cell_id"]))


def test_isea4t_centroids_consistent(ray_session):
    from dggrid4py_ray.pipelines.highlevel import (
        grid_cell_centroids_for_extent)
    out = grid_cell_centroids_for_extent("ISEA4T", 4,
                                         clip_bbox=EST).to_pandas()
    assert len(out) > 0
    assert out["lon"].between(EST[0] - 15, EST[2] + 15).all()
    assert out["lat"].between(EST[1] - 15, EST[3] + 15).all()


def test_isea3h_ids_centroid_semantics(ray_session):
    from dggrid4py_ray.config import dgselect
    from dggrid4py_ray.pipelines.highlevel import grid_cellids_for_extent
    from dggrid4py_ray.stages.encode import grid_for

    out = grid_cellids_for_extent("ISEA3H", 6, clip_bbox=EST).to_pandas()
    assert len(out) > 0
    grid = grid_for(dgselect("ISEA3H", resolution=6))
    lon, lat = grid.inner.decode(
        out["cell_id"].to_numpy().astype(np.int64), 6)
    clip = box(*EST)
    assert clip.contains(lon, lat).all()


def test_hex_family_polygons_not_implemented(ray_session):
    from dggrid4py_ray.pipelines.highlevel import (
        grid_cell_polygons_for_extent)
    with pytest.raises(NotImplementedError, match="hex lattices"):
        grid_cell_polygons_for_extent("ISEA3H", 5, clip_bbox=EST)


def test_isea4d_polygons_cover_box(ray_session):
    from dggrid4py_ray.pipelines.highlevel import (
        grid_cell_polygons_for_extent)
    out = grid_cell_polygons_for_extent("ISEA4D", 5,
                                        clip_bbox=EST).to_pandas()
    assert len(out) > 5
    # the union of kept diamonds must contain interior probe points
    ps = PolygonSet.from_wkb(list(out["geometry"]))
    probes_lon = np.linspace(EST[0] + 0.5, EST[2] - 0.5, 7)
    probes_lat = np.linspace(EST[1] + 0.5, EST[3] - 0.5, 5)
    LON, LAT = np.meshgrid(probes_lon, probes_lat)
    assert ps.contains(LON.ravel(), LAT.ravel()).mean() > 0.95
