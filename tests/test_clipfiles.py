"""Clip-file inputs (Shapefile / GeoJSON / GeoPackage) — the reference's
file-based clip regions (dggrid_runner.py:1328-1335) without GDAL.

Each test synthesizes the format's bytes from its PUBLIC spec, reads it
back through sources/clipfiles, and checks polyfill parity against the
same box passed as clip_bbox (the reference-conformance box that pins 16
res-5 cells)."""

import json
import sqlite3
import struct

import numpy as np
import pytest

from dggrid4py_ray.geometry import PolygonSet, wkb_polygon
from dggrid4py_ray.sources.clipfiles import (read_clip_file,
                                             read_geojson_polygons,
                                             read_gpkg_polygons,
                                             read_shapefile_polygons)

BOX = (27.2, 57.5, 29.3, 59.2)          # reference conformance box
RING = [(27.2, 57.5), (29.3, 57.5), (29.3, 59.2), (27.2, 59.2),
        (27.2, 57.5)]


def _write_shp(path, rings_list):
    """Minimal ESRI .shp writer (header + type-5 records), per the
    public whitepaper layout — test-local, writes only what the reader
    must parse."""
    records = b""
    for recno, rings in enumerate(rings_list, 1):
        pts = np.vstack(rings)
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
        body = struct.pack("<i", 5)
        body += struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                            pts[:, 0].max(), pts[:, 1].max())
        body += struct.pack("<ii", len(rings), len(pts))
        body += parts.tobytes()
        body += pts.astype("<f8").tobytes()
        records += struct.pack(">ii", recno, len(body) // 2) + body
    total_words = (100 + len(records)) // 2
    allpts = np.vstack([np.vstack(r) for r in rings_list])
    header = struct.pack(">i", 9994) + b"\x00" * 20 \
        + struct.pack(">i", total_words) \
        + struct.pack("<ii", 1000, 5) \
        + struct.pack("<4d", allpts[:, 0].min(), allpts[:, 1].min(),
                      allpts[:, 0].max(), allpts[:, 1].max()) \
        + struct.pack("<4d", 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + records)


def _write_gpkg(path, wkbs):
    """Minimal GeoPackage writer: gpkg_contents + gpkg_geometry_columns
    + one feature table whose geometry blobs carry the GP header."""
    con = sqlite3.connect(path)
    con.executescript("""
        CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT,
                                    identifier TEXT, srs_id INTEGER);
        CREATE TABLE gpkg_geometry_columns (table_name TEXT,
            column_name TEXT, geometry_type_name TEXT, srs_id INTEGER);
        CREATE TABLE clip_region (fid INTEGER PRIMARY KEY, geom BLOB);
        INSERT INTO gpkg_contents VALUES
            ('clip_region', 'features', 'clip_region', 4326);
        INSERT INTO gpkg_geometry_columns VALUES
            ('clip_region', 'geom', 'POLYGON', 4326);
    """)
    for w in wkbs:
        # GP magic, version 0, flags 0b00000001 (little-endian, no
        # envelope), srs_id 4326
        blob = b"GP" + bytes([0, 0b00000001]) \
            + struct.pack("<i", 4326) + w
        con.execute("INSERT INTO clip_region (geom) VALUES (?)", (blob,))
    con.commit()
    con.close()


@pytest.fixture()
def box_wkb():
    return wkb_polygon([np.array(RING)])


def _expected_cells(ray_session):
    from dggrid4py_ray.pipelines.highlevel import grid_cellids_for_extent
    return sorted(grid_cellids_for_extent(
        "IGEO7", 5, clip_bbox=BOX).to_pandas()["cell_id"])


class TestShapefile:
    def test_roundtrip_box(self, tmp_path, box_wkb):
        p = str(tmp_path / "clip.shp")
        _write_shp(p, [[np.array(RING)]])
        wkbs = read_shapefile_polygons(p)
        assert len(wkbs) == 1
        ps = PolygonSet.from_wkb(wkbs)
        assert ps.contains(np.array([28.0]), np.array([58.0]))[0]
        assert not ps.contains(np.array([20.0]), np.array([58.0]))[0]

    def test_polyfill_parity_with_bbox(self, ray_session, tmp_path):
        from dggrid4py_ray.pipelines.highlevel import (
            grid_cellids_for_extent)
        p = str(tmp_path / "clip.shp")
        _write_shp(p, [[np.array(RING)]])
        got = sorted(grid_cellids_for_extent(
            "IGEO7", 5, clip_geom=p).to_pandas()["cell_id"])
        assert got == _expected_cells(ray_session)
        assert len(got) == 16               # pinned conformance count

    def test_hole_excluded(self, tmp_path):
        outer = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                         dtype=float)
        hole = np.array([(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)],
                        dtype=float)
        p = str(tmp_path / "holes.shp")
        _write_shp(p, [[outer, hole]])
        ps = PolygonSet.from_wkb(read_shapefile_polygons(p))
        assert ps.contains(np.array([2.0]), np.array([2.0]))[0]
        assert not ps.contains(np.array([5.0]), np.array([5.0]))[0]

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.shp")
        open(p, "wb").write(b"\x00" * 50)
        with pytest.raises(ValueError, match="shorter than header"):
            read_shapefile_polygons(p)


class TestGeoJSON:
    def test_feature_collection(self, tmp_path):
        p = str(tmp_path / "clip.geojson")
        json.dump({"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Polygon",
                          "coordinates": [list(map(list, RING))]}}]},
                  open(p, "w"))
        wkbs = read_geojson_polygons(p)
        ps = PolygonSet.from_wkb(wkbs)
        assert ps.contains(np.array([28.0]), np.array([58.0]))[0]

    def test_multipolygon_and_parity(self, ray_session, tmp_path):
        from dggrid4py_ray.pipelines.highlevel import (
            grid_cellids_for_extent)
        p = str(tmp_path / "clip.json")
        json.dump({"type": "MultiPolygon",
                   "coordinates": [[list(map(list, RING))]]},
                  open(p, "w"))
        got = sorted(grid_cellids_for_extent(
            "IGEO7", 5, clip_geom=p).to_pandas()["cell_id"])
        assert got == _expected_cells(ray_session) and len(got) == 16


class TestGPKG:
    def test_roundtrip_and_parity(self, ray_session, tmp_path, box_wkb):
        from dggrid4py_ray.pipelines.highlevel import (
            grid_cellids_for_extent)
        p = str(tmp_path / "clip.gpkg")
        _write_gpkg(p, [box_wkb])
        wkbs = read_gpkg_polygons(p)
        assert wkbs == [box_wkb]
        got = sorted(grid_cellids_for_extent(
            "IGEO7", 5, clip_geom=p).to_pandas()["cell_id"])
        assert got == _expected_cells(ray_session) and len(got) == 16

    def test_envelope_flag_variants(self, tmp_path, box_wkb):
        # envelope indicator 1 => 32 envelope bytes before the WKB
        p = str(tmp_path / "env.gpkg")
        con = sqlite3.connect(p)
        con.executescript("""
            CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT,
                                        identifier TEXT, srs_id INTEGER);
            CREATE TABLE gpkg_geometry_columns (table_name TEXT,
                column_name TEXT, geometry_type_name TEXT,
                srs_id INTEGER);
            CREATE TABLE t (fid INTEGER PRIMARY KEY, geom BLOB);
            INSERT INTO gpkg_contents VALUES ('t','features','t',4326);
            INSERT INTO gpkg_geometry_columns VALUES ('t','geom',
                'POLYGON',4326);
        """)
        blob = b"GP" + bytes([0, 0b00000011]) + struct.pack("<i", 4326) \
            + struct.pack("<4d", *[27.2, 29.3, 57.5, 59.2]) + box_wkb
        con.execute("INSERT INTO t (geom) VALUES (?)", (blob,))
        con.commit()
        con.close()
        assert read_gpkg_polygons(p) == [box_wkb]


def test_dispatch_unknown_extension(tmp_path):
    p = str(tmp_path / "clip.fgb")
    open(p, "wb").write(b"x")
    with pytest.raises(ValueError, match="unsupported clip file"):
        read_clip_file(p)


class TestRealGdalGpkg:
    """The reference ships a REAL GDAL-written GeoPackage
    (examples/igeo7_res_9.gpkg, 551 DGGRID res-9 cells) — golden
    validation that the no-GDAL reader parses production GPKG bytes,
    not just our own writer's."""

    PATH = "/root/reference/examples/igeo7_res_9.gpkg"

    def test_reads_all_551_polygons(self):
        wkbs = read_gpkg_polygons(self.PATH)
        assert len(wkbs) == 551
        ps = PolygonSet.from_wkb(wkbs[:10])
        # the example region is around (27E, 59N)
        assert 26.5 < ps.bounds[0] < 28.0
        assert 58.5 < ps.bounds[3] < 59.5

    def test_geometries_encode_to_their_own_ids(self, ray_session):
        import sqlite3

        from dggrid4py_ray.config import dgselect
        from dggrid4py_ray.geometry import parse_wkb
        from dggrid4py_ray.stages.encode import grid_for

        con = sqlite3.connect(self.PATH)
        # the example's `name` column is the Z7 id as 16-char hex
        want = [int(r[0], 16) for r in con.execute(
            "SELECT name FROM alutag_igeo7_res_9 ORDER BY fid")]
        con.close()
        wkbs = read_gpkg_polygons(self.PATH)
        cent = np.array([parse_wkb(w)[1][0][:-1].mean(axis=0)
                         for w in wkbs])
        grid = grid_for(dgselect("IGEO7", resolution=9))
        z = grid.encode(cent[:, 0], cent[:, 1], 9)
        got = [int(np.uint64(np.int64(v))) for v in z]
        assert got == want
