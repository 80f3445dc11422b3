"""Clip-geometry FILE inputs — Shapefile / GeoJSON / GeoPackage.

The reference hands user clip files straight to GDAL
(``dggrid_runner.py:1328-1335`` reads Shapefile/FlatGeobuf/GPKG clip
regions via ``gpd.read_file`` before forking DGGRID; ``igeo7_ext.py:
204-240`` likewise).  GDAL is not available in this environment, but two
of the three formats need no GDAL at all:

* **ESRI Shapefile** — a fixed public binary layout (ESRI whitepaper,
  1998): 100-byte header, then records of (big-endian record header,
  little-endian shape body).  Only Polygon (type 5) and PolygonZ/M
  (15/25, Z/M values ignored) matter for clip input.
* **GeoPackage** — sqlite (Python stdlib) + the GeoPackage binary
  geometry header (magic ``GP``, flags byte with an envelope-size
  indicator) wrapped around standard WKB, which ``geometry.parse_wkb``
  already reads.
* **GeoJSON** — plain json.

Each reader returns ``list[bytes]`` of polygon WKB (one entry per
polygon record/feature), ready for ``PolygonSet.from_wkb`` /
``pipelines.highlevel`` clip args — so
``grid_cellids_for_extent(..., clip_geom="region.shp")`` now works like
the reference's file-based clip.  Holes and multi-ring records are
handled by the engine's even-odd containment, orientation-independent.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from ..geometry import wkb_polygon

_SHP_POLYGON_TYPES = {5, 15, 25}        # Polygon, PolygonZ, PolygonM
_SHP_NULL = 0


def read_shapefile_polygons(path: str) -> list[bytes]:
    """Parse the polygon records of a ``.shp`` file into WKB (no GDAL).

    Every record's rings go into ONE WKB polygon — ESRI encodes
    exterior rings clockwise and holes counter-clockwise in the same
    record, and even-odd containment makes the distinction irrelevant
    for clipping."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 100:
        raise ValueError(f"{path}: not a shapefile (shorter than header)")
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError(f"{path}: bad shapefile magic {code} (want 9994)")
    (flen_words,) = struct.unpack_from(">i", buf, 24)
    end = min(len(buf), flen_words * 2)
    (shp_type,) = struct.unpack_from("<i", buf, 32)
    if shp_type not in _SHP_POLYGON_TYPES and shp_type != _SHP_NULL:
        raise ValueError(f"{path}: shapefile type {shp_type} is not "
                         f"polygonal (want one of {_SHP_POLYGON_TYPES})")
    out: list[bytes] = []
    off = 100
    while off + 8 <= end:
        (_recno, clen_words) = struct.unpack_from(">ii", buf, off)
        off += 8
        body_end = off + clen_words * 2
        (rtype,) = struct.unpack_from("<i", buf, off)
        if rtype == _SHP_NULL:
            off = body_end
            continue
        if rtype not in _SHP_POLYGON_TYPES:
            raise ValueError(f"{path}: record {_recno} has type {rtype}, "
                             "expected polygon")
        # box(4 doubles) + numParts + numPoints
        nparts, npoints = struct.unpack_from("<ii", buf, off + 36)
        parts = np.frombuffer(buf, dtype="<i4", count=nparts,
                              offset=off + 44)
        pts = np.frombuffer(buf, dtype="<f8", count=npoints * 2,
                            offset=off + 44 + 4 * nparts) \
            .reshape(npoints, 2)
        bounds = np.r_[parts.astype(np.int64), npoints]
        rings = [pts[bounds[i]:bounds[i + 1]].copy()
                 for i in range(nparts) if bounds[i + 1] - bounds[i] >= 3]
        if rings:
            out.append(wkb_polygon(rings))
        off = body_end            # skips trailing Z/M arrays of 15/25
    return out


def read_geojson_polygons(path: str) -> list[bytes]:
    """GeoJSON file -> polygon WKB list (Feature / FeatureCollection /
    bare geometry; Polygon, MultiPolygon, GeometryCollection)."""
    with open(path) as f:
        doc = json.load(f)
    out: list[bytes] = []

    def geom(g):
        if g is None:
            return
        t = g.get("type")
        if t == "Polygon":
            out.append(wkb_polygon(
                [np.asarray(r, dtype=np.float64) for r in
                 g["coordinates"]]))
        elif t == "MultiPolygon":
            for poly in g["coordinates"]:
                out.append(wkb_polygon(
                    [np.asarray(r, dtype=np.float64) for r in poly]))
        elif t == "GeometryCollection":
            for sub in g.get("geometries", []):
                geom(sub)
        elif t == "Feature":
            geom(g.get("geometry"))
        elif t == "FeatureCollection":
            for feat in g.get("features", []):
                geom(feat)
        else:
            raise ValueError(f"{path}: non-polygonal GeoJSON type {t!r}")

    geom(doc)
    return out


def _strip_gpkg_header(blob: bytes) -> bytes:
    """GeoPackage binary geometry -> the embedded standard WKB."""
    if len(blob) < 8 or blob[0:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob (no GP magic)")
    flags = blob[3]
    env_indicator = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_indicator)
    if env_len is None:
        raise ValueError(f"invalid GPKG envelope indicator {env_indicator}")
    return blob[8 + env_len:]


def read_gpkg_polygons(path: str, table: str | None = None,
                       geom_col: str | None = None) -> list[bytes]:
    """GeoPackage feature table -> polygon WKB list via stdlib sqlite3.

    ``table`` defaults to the first ``data_type='features'`` row of
    ``gpkg_contents``; ``geom_col`` from ``gpkg_geometry_columns``."""
    import sqlite3

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    con = sqlite3.connect(path)
    try:
        if table is None:
            row = con.execute(
                "SELECT table_name FROM gpkg_contents "
                "WHERE data_type='features' ORDER BY table_name LIMIT 1"
            ).fetchone()
            if row is None:
                raise ValueError(f"{path}: no feature table in "
                                 "gpkg_contents")
            table = row[0]
        if geom_col is None:
            row = con.execute(
                "SELECT column_name FROM gpkg_geometry_columns "
                "WHERE table_name=?", (table,)).fetchone()
            geom_col = row[0] if row else "geom"
        blobs = con.execute(
            f'SELECT "{geom_col}" FROM "{table}"').fetchall()
    finally:
        con.close()
    return [_strip_gpkg_header(b[0]) for b in blobs if b[0] is not None]


_READERS = {
    ".shp": read_shapefile_polygons,
    ".geojson": read_geojson_polygons,
    ".json": read_geojson_polygons,
    ".gpkg": read_gpkg_polygons,
}


def read_clip_file(path: str) -> list[bytes]:
    """Dispatch on extension -> polygon WKB list (the reference's
    ``gpd.read_file(clip_file)`` equivalent for clip input)."""
    ext = os.path.splitext(path)[1].lower()
    reader = _READERS.get(ext)
    if reader is None:
        raise ValueError(
            f"unsupported clip file type {ext!r} (supported: "
            f"{sorted(_READERS)}; for FlatGeobuf convert to GPKG/GeoJSON)")
    wkbs = reader(path)
    if not wkbs:
        raise ValueError(f"{path}: no polygon geometries found")
    return wkbs
