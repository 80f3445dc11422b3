"""The reference's ``examples/demo_highlevel_api.py``, re-expressed over
this engine — every operation of the reference demo in order, so a
dggrid4py user can diff the two files and switch.

Differences from the reference (by design):
* results are ``ray.data.Dataset`` pipelines (lazy, streaming) instead
  of materialized GeoDataFrames — ``.to_pandas()`` where the demo prints;
* the cell-id column is always ``cell_id`` (+ the requested address-type
  column) instead of the reference's version-dependent
  name/Name/global_id sniffing;
* geometry is a WKB ``geometry`` column (export to GIS via
  ``sources/gpkg.write_gpkg``; no temp shapefiles anywhere);
* no DGGRID subprocess exists, so there is no ``DGGRIDv7(executable=...)``
  instance — functions are imported directly.

Run:  python examples/demo_highlevel_api_ray.py
"""

import os
import sys

import numpy as np  # noqa: F401
import pyarrow as pa

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():  # noqa: C901 — mirrors the reference demo top to bottom
    import ray.data
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from dggrid4py_ray.dggs import igeo7
    from dggrid4py_ray.pipelines.highlevel import (
        address_transform, cells_for_geo_points,
        grid_cell_centroids_for_extent, grid_cell_polygons_for_extent,
        grid_cell_polygons_from_cellids, grid_cellids_for_extent)
    from dggrid4py_ray.dggs.stats import grid_stats_table

    # reference: est_bound = shapely.geometry.box(20.2,57.00, 28.4,60.0)
    est_bound = (20.2, 57.00, 28.4, 60.0)

    # --- grid_cell_polygons_for_extent over several grid families -----
    gdf1 = grid_cell_polygons_for_extent("ISEA4T", 5, clip_bbox=est_bound)
    print("ISEA4T res5:", gdf1.to_pandas().head(3), sep="\n")

    gdf2 = grid_cell_polygons_for_extent("ISEA7H", 5, clip_bbox=est_bound)
    print("ISEA7H res5:", gdf2.to_pandas().head(3), sep="\n")

    gdf2_a = grid_cell_polygons_for_extent("ISEA7H", 6,
                                           clip_bbox=est_bound)
    print("ISEA7H res6 cells:", gdf2_a.count())

    gdf3 = grid_cell_polygons_for_extent("ISEA7H", 8, clip_bbox=est_bound,
                                         output_address_type="Z7")
    print("ISEA7H res8 (Z7) cells:", gdf3.count())

    # hex-lattice families expose ids/centroids for extents (polygon
    # boundaries are implemented for the aperture-7 grids and ISEA4T/4D)
    gdf3_a = grid_cellids_for_extent("ISEA3H", 9, clip_bbox=est_bound)
    print("ISEA3H res9 cell ids:", gdf3_a.to_pandas().head(3), sep="\n")

    cents = grid_cell_centroids_for_extent(dggs_type="ISEA7H",
                                           resolution=4)
    print("ISEA7H res4 centroids:", cents.count())

    # --- grid_stats_table (closed form, no CLI stdout scraping) -------
    df1 = grid_stats_table("ISEA7H", 20).to_pandas()
    print(df1.head(8))

    # --- cell ids for extent, SEQNUM address type ---------------------
    df2 = grid_cellids_for_extent("ISEA7H", 5, clip_bbox=est_bound,
                                  output_address_type="SEQNUM")
    seqnums = df2.to_pandas()["seqnum"].to_numpy()
    print("SEQNUMs:", seqnums[:3], "...", len(seqnums), "cells")

    # --- polygons back from the id list (SEQNUM input) ----------------
    gdf4 = grid_cell_polygons_from_cellids(seqnums, "ISEA7H", 5,
                                           input_address_type="SEQNUM")
    pdf4 = gdf4.to_pandas()
    print("from SEQNUMs:", pdf4.head(3), sep="\n")
    assert len(pdf4) == len(seqnums)

    # --- cells for geo points (the reference's centroid round trip) ---
    from dggrid4py_ray.stages.encode import CentroidDecoder  # noqa: F401
    cent_pdf = grid_cell_centroids_for_extent(
        "ISEA7H", 4, clip_bbox=est_bound).to_pandas()
    pts = ray.data.from_arrow(pa.table({
        "lon": pa.array(cent_pdf["lon"], pa.float64()),
        "lat": pa.array(cent_pdf["lat"], pa.float64())}))
    gdf5 = cells_for_geo_points(pts, dggs_type="ISEA7H", resolution=5)
    print("cells for points:", gdf5.to_pandas().head(3), sep="\n")

    # --- split at the dateline for cartesian GIS tools ----------------
    gdf7 = grid_cell_polygons_for_extent("ISEA7H", 3, split_dateline=True)
    print("global res3 (dateline-split) cells:", gdf7.count())

    # --- IGEO7 + Z7_STRING + per-id resolution ------------------------
    gdf_z1 = grid_cell_polygons_for_extent(
        "IGEO7", 5, clip_bbox=est_bound, output_address_type="Z7_STRING")
    z1 = gdf_z1.to_pandas()
    z1["resolution"] = [len(s) - 2 for s in z1["z7_string"]]
    print(z1.head(3))
    assert (z1["resolution"] == 5).all()

    # --- address transforms: Z7_STRING -> Q2DI / PROJTRI --------------
    df_q2di = address_transform(z1["z7_string"].tolist(), "IGEO7", 5,
                                input_address_type="Z7_STRING",
                                output_address_type="Q2DI")
    print(df_q2di.to_pandas().head(3))

    df_tri = address_transform(z1["z7_string"].tolist(), "IGEO7", 5,
                               input_address_type="Z7_STRING",
                               output_address_type="PROJTRI")
    print(df_tri.to_pandas().head(3))

    # --- COARSE_CELLS: children of a parent cell ----------------------
    children = grid_cell_polygons_from_cellids(
        cell_id_list=["000125023"],
        dggs_type="IGEO7",
        resolution=9,
        clip_subset_type="COARSE_CELLS",
        clip_cell_res=7,
        input_address_type="Z7_STRING",
        output_address_type="Z7_STRING")
    ch = children.to_pandas()
    print("children:", ch.head(3), sep="\n")
    assert len(ch) == 49                     # 7^(9-7) children
    assert all(s.startswith("000125023") for s in ch["z7_string"])

    # --- GIS export (replaces the demo's .to_file(...shp) lines) ------
    import tempfile

    from dggrid4py_ray.sources.gpkg import write_gpkg
    out = tempfile.mkdtemp() + "/est_isea7h_5.gpkg"
    n = write_gpkg(gdf2, out, table="est_isea7h_5")
    print(f"wrote {n} cells to {out} (QGIS-openable)")

    ray.shutdown()
    print("demo complete")


if __name__ == "__main__":
    main()
