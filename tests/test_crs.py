"""Projected-CRS math (dggs/crs.py) + projected raster path (R6).

Validation strategy: roundtrips to < 1e-8 deg, exact structural anchors
(central-meridian easting 500000, the Web Mercator corner constant
20037508.342789244), and an INDEPENDENT check of the transverse-Mercator
forward series against a numeric meridian-arc integral (matches to
< 0.1 mm — catches wrong series coefficients that a roundtrip test alone
would not)."""

import numpy as np

from dggrid4py_ray.dggs import crs


def test_utm_roundtrip():
    rng = np.random.default_rng(0)
    lon = rng.uniform(9, 21, 2000)
    lat = rng.uniform(-80, 84, 2000)
    x, y = crs.lonlat_to_utm(lon, lat, 32633)
    lon2, lat2 = crs.utm_to_lonlat(x, y, 32633)
    assert np.abs(lon2 - lon).max() < 1e-8
    assert np.abs(lat2 - lat).max() < 1e-8


def test_utm_structural_anchors():
    x, y = crs.lonlat_to_utm(np.array([15.0]), np.array([45.0]), 32633)
    assert x[0] == 500000.0                      # central meridian
    # independent meridian-arc integral (k0 * M(45 deg))
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    t = np.linspace(0, np.deg2rad(45.0), 200001)
    M = a * np.trapz((1 - e2) / np.power(1 - e2 * np.sin(t) ** 2, 1.5), t)
    assert abs(y[0] - 0.9996 * M) < 1e-3         # < 1 mm
    # southern false northing
    _, ys = crs.lonlat_to_utm(np.array([15.0]), np.array([-30.0]), 32733)
    assert 0 < ys[0] < 10_000_000.0


def test_webmercator_exact_corner():
    x, y = crs.lonlat_to_webmercator(np.array([180.0]),
                                     np.array([85.05112877980659]))
    assert abs(x[0] - 20037508.342789244) < 1e-6
    assert abs(y[0] - 20037508.342789244) < 1e-6
    lon, lat = crs.webmercator_to_lonlat(x, y)
    assert abs(lon[0] - 180.0) < 1e-12 * 180 + 1e-9
    assert abs(lat[0] - 85.05112877980659) < 1e-9


def test_crs_info():
    assert crs.crs_info("EPSG:4326") == ("geographic", "degree")
    assert crs.crs_info("EPSG:3857") == ("projected", "metre")
    assert crs.crs_info("EPSG:32633") == ("projected", "metre")
    assert crs.crs_info("32733") == ("projected", "metre")


def test_projected_raster_zonal(ray_session):
    """Projected (UTM) raster -> windows -> lon/lat points -> zonal mean:
    the R6 pipeline end-to-end on a synthetic grid."""
    from dggrid4py_ray.sources import raster as R
    meta = R.ProjectedRasterMeta(width=200, height=120,
                                 x0=400_000.0, y0=5_100_000.0,
                                 px=500.0, py=500.0, crs="EPSG:32633",
                                 nodata=-1.0)
    assert R.pixel_edge_len_m(meta) == 500.0
    ds = R.windows_dataset(meta, R.synthetic_raster(meta), max_mb=4.0)
    df = ds.to_pandas()
    assert len(df) > 20000
    # all pixel centers land inside the zone's geographic neighborhood
    assert df["lon"].between(12.5, 17.5).all()
    assert df["lat"].between(45.5, 46.5).all()
    out = R.zonal_from_raster(meta, R.synthetic_raster(meta),
                              resolution=7).to_pandas()
    assert len(out) > 50
    assert np.isfinite(out["mean_value"]).all()
