"""GeoPackage sink: write cell polygons, read back through the in-repo
GPKG reader and raw sqlite, and check the 1.3 core metadata QGIS/ogr
require."""

import sqlite3

import numpy as np
import pytest
import ray.data

from dggrid4py_ray.sources.clipfiles import read_gpkg_polygons
from dggrid4py_ray.sources.gpkg import write_gpkg


def test_cells_roundtrip(ray_session, tmp_path):
    from dggrid4py_ray.geometry import PolygonSet
    from dggrid4py_ray.pipelines.highlevel import (
        grid_cell_polygons_for_extent)

    ds = grid_cell_polygons_for_extent(
        "IGEO7", 5, clip_bbox=(27.2, 57.5, 29.3, 59.2))
    p = str(tmp_path / "cells.gpkg")
    n = write_gpkg(ds, p, table="cells")
    assert n == 16

    # metadata QGIS requires
    con = sqlite3.connect(p)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == 0x47504B47
    row = con.execute("SELECT table_name, data_type, srs_id "
                      "FROM gpkg_contents").fetchone()
    assert row == ("cells", "features", 4326)
    assert con.execute("SELECT COUNT(*) FROM gpkg_spatial_ref_sys "
                       "WHERE srs_id=4326").fetchone()[0] == 1
    got_ids = sorted(r[0] for r in con.execute(
        'SELECT cell_id FROM "cells"'))
    con.close()
    want_ids = sorted(ds.to_pandas()["cell_id"])
    assert got_ids == want_ids

    # geometry survives the GP wrapper: reader returns parseable WKB
    wkbs = read_gpkg_polygons(p)
    assert len(wkbs) == 16
    ps = PolygonSet.from_wkb(wkbs)
    lo = ps.bounds
    assert lo[0] < 29.3 and lo[3] > 57.5


def test_arrow_table_input_and_attr_types(tmp_path):
    import pyarrow as pa

    from dggrid4py_ray.geometry import wkb_polygon

    ring = np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], float)
    t = pa.table({
        "cell_id": pa.array([7], pa.int64()),
        "name": pa.array(["a"]),
        "score": pa.array([0.5]),
        "geometry": pa.array([wkb_polygon([ring])], pa.binary())})
    p = str(tmp_path / "one.gpkg")
    assert write_gpkg(t, p) == 1
    con = sqlite3.connect(p)
    row = con.execute('SELECT cell_id, name, score FROM "cells"') \
        .fetchone()
    con.close()
    assert row == (7, "a", 0.5)


def test_empty_input_raises(tmp_path):
    import pyarrow as pa
    with pytest.raises(ValueError, match="empty input"):
        write_gpkg(pa.table({"geometry": pa.array([], pa.binary())}),
                   str(tmp_path / "e.gpkg"))
