"""meta_from_rasterio adapter: gated on the (absent) rasterio package —
the adapter logic is exercised with a minimal fake rasterio module so
the plumbing (transform -> meta mapping, per-task reopen, CRS routing)
is tested for the deployment that has the real library."""

import sys
import types

import numpy as np
import pytest


def _fake_rasterio(width=8, height=6, epsg=4326, grid=None):
    rio = types.ModuleType("rasterio")
    windows = types.ModuleType("rasterio.windows")

    class Window:
        def __init__(self, col0, row0, w, h):
            self.col0, self.row0, self.w, self.h = col0, row0, w, h

    windows.Window = Window
    data = grid if grid is not None else \
        np.arange(width * height, dtype=np.float64).reshape(height, width)

    class _Transform:
        a, b, c = 0.5, 0.0, 10.0      # px, rot, west edge
        d, e, f = 0.0, -0.5, 55.0     # rot, -py, north edge

    class _CRS:
        def __init__(self, code):
            self._code = code

        def to_epsg(self):
            return self._code

    class _Src:
        def __init__(self):
            self.width, self.height = width, height
            self.transform = _Transform()
            self.nodata = -9999.0
            self.crs = _CRS(epsg)

        def read(self, band, window=None):
            assert band == 1
            if window is None:
                return data
            return data[window.row0:window.row0 + window.h]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    rio.open = lambda path: _Src()
    rio.windows = windows
    return rio, windows, data


@pytest.fixture()
def fake_rio(monkeypatch):
    rio, windows, data = _fake_rasterio()
    monkeypatch.setitem(sys.modules, "rasterio", rio)
    monkeypatch.setitem(sys.modules, "rasterio.windows", windows)
    return data


def test_import_error_without_rasterio():
    from dggrid4py_ray.sources.raster import meta_from_rasterio
    assert "rasterio" not in sys.modules
    with pytest.raises(ImportError, match="rasterio"):
        meta_from_rasterio("/tmp/nope.tif")


def test_geographic_meta_and_windows(fake_rio):
    from dggrid4py_ray.sources.raster import (RasterMeta,
                                              meta_from_rasterio)
    meta, read_window = meta_from_rasterio("/tmp/fake.tif")
    assert isinstance(meta, RasterMeta)
    assert (meta.width, meta.height) == (8, 6)
    assert (meta.lon0, meta.lat0, meta.px, meta.py) == (10.0, 55.0, 0.5, 0.5)
    assert meta.nodata == -9999.0
    w = read_window(2, 3)
    np.testing.assert_array_equal(w, fake_rio[2:5])


def test_projected_meta_routing(monkeypatch):
    rio, windows, _ = _fake_rasterio(epsg=3857)
    monkeypatch.setitem(sys.modules, "rasterio", rio)
    monkeypatch.setitem(sys.modules, "rasterio.windows", windows)
    from dggrid4py_ray.sources.raster import (ProjectedRasterMeta,
                                              meta_from_rasterio)
    meta, _ = meta_from_rasterio("/tmp/fake3857.tif")
    assert isinstance(meta, ProjectedRasterMeta)
    assert meta.crs == "EPSG:3857"


def test_window_points_from_adapter_meta(fake_rio):
    # the fake module lives only in this process's sys.modules, so the
    # Ray-task path can't be driven here (workers would import the real
    # rasterio); window_to_points IS the per-task body windows_dataset
    # runs, so drive it directly over the adapter's meta + reader
    import pyarrow as pa

    from dggrid4py_ray.sources.raster import (meta_from_rasterio,
                                              suggest_windows,
                                              window_to_points)
    meta, read_window = meta_from_rasterio("/tmp/fake.tif")
    tables = [window_to_points(meta, r, n, read_window(r, n))
              for r, n in suggest_windows(meta)]
    pts = pa.concat_tables(tables).to_pandas()
    assert len(pts) == 8 * 6
    # first pixel center: west edge + px/2, north edge - py/2
    assert pts["lon"].min() == pytest.approx(10.25)
    assert pts["lat"].max() == pytest.approx(54.75)
