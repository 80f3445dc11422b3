"""DGGRID quad-ij SEQNUM layout (dggs/dggrid_seqnum.py).

Golden anchors: the two ISEA7H res-5 zones of the reference's
cells_for_geo_points test (tests/test_dggrid.py:496-527, orientation
11.20 / 58.282525588538994675786 / az 0).  Structural validation:
bijectivity, roundtrips, pentagon positions (quad origins + poles) at both
res parities, and orientation independence.
"""

import numpy as np
import pytest

from dggrid4py_ray.dggs import igeo7 as ig
from dggrid4py_ray.dggs.igeo7 import IGeo7Grid


@pytest.fixture(scope="module")
def golden_grid():
    g = IGeo7Grid(pole_lon=11.20, pole_lat=58.282525588538994675786, azimuth=0.0)
    g._ensure_anchor_table()
    return g


def test_golden_zones(golden_grid):
    z = golden_grid.encode(np.array([20.5, 21.0]), np.array([57.5, 58.0]), 5)
    assert golden_grid.to_seqnum_dggrid(z, 5).tolist() == [51548, 51695]
    # and back
    back = golden_grid.from_seqnum_dggrid(np.array([51548, 51695]), 5)
    assert back.tolist() == z.tolist()


@pytest.mark.parametrize("res", [0, 1, 2, 3, 4])
def test_bijection_roundtrip_pentagons(golden_grid, res):
    g = golden_grid
    n = ig.num_cells(res)
    allz = g.from_seqnum(np.arange(1, n + 1, dtype=np.int64), res)
    s = g.to_seqnum_dggrid(allz, res)
    assert len(np.unique(s)) == n and s.min() == 1 and s.max() == n
    assert (g.from_seqnum_dggrid(s, res) == allz).all()
    # pentagons: north pole 1, south pole N, quad origins at 2 + (q-1)*7^r
    pents = allz[ig.z7_is_pentagon(allz)]
    per = 7 ** res
    expect = sorted([1, 10 * per + 2] + [2 + (q - 1) * per for q in range(1, 11)])
    assert sorted(g.to_seqnum_dggrid(pents, res).tolist()) == expect


def test_default_orientation_bijection():
    g = IGeo7Grid()
    g._ensure_anchor_table()
    n = ig.num_cells(3)
    allz = g.from_seqnum(np.arange(1, n + 1, dtype=np.int64), 3)
    s = g.to_seqnum_dggrid(allz, 3)
    assert len(np.unique(s)) == n and s.min() == 1 and s.max() == n
    assert (g.from_seqnum_dggrid(s, 3) == allz).all()


def test_address_codec_seqnum_is_dggrid_order(golden_grid):
    from dggrid4py_ray.dggs.codecs import AddressCodec
    codec = AddressCodec(golden_grid, 5)
    z = golden_grid.encode(np.array([20.5, 21.0]), np.array([57.5, 58.0]), 5)
    assert codec.emit(z, "SEQNUM").tolist() == [51548, 51695]
    assert codec.parse(np.array([51548, 51695]), "SEQNUM").tolist() == z.tolist()
