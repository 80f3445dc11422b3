"""Golden literals from the reference test suite.

The reference pins exact DGGRID-binary outputs
(/root/reference/tests/test_dggrid.py:159-212 — Oregon cities presence
binning at IGEO7 res 4; :496-527 — two points at ISEA7H res 5 with SEQNUM
zones 51695/51548 and exact 7-vertex polygons).

Our engine is a from-scratch construction: its Z7 digit conventions and
SEQNUM ordering are internally exact (bijective, tested) but NOT bit-equal
to the DGGRID binary's undocumented conventions, so the literal-id asserts
are tracked as xfail.  The *semantic* golden properties that do not depend on
those conventions (cell counts, equal ids for equal inputs, geometric
containment, nearest-cell consistency) are asserted strictly below.
"""

import numpy as np
import pytest

from dggrid4py_ray.dggs import igeo7 as ig
from dggrid4py_ray.dggs.igeo7 import IGeo7Grid

OREGON = [
    (-123.28, 44.57, 49900, "Corvallis"), (-122.87, 45.49, 42300, "Aloha"),
    (-122.77, 45.43, 41700, "Tigard"), (-123.09, 44.62, 41400, "Albany"),
    (-122.70, 45.41, 35700, "LakeOswego"), (-123.02, 45.00, 32600, "Keizer"),
    (-123.19, 45.21, 26800, "MacMinnville"), (-122.60, 45.34, 26100, "OregonCity"),
    (-123.32, 42.44, 23300, "GrantsPass"), (-122.77, 45.38, 23100, "Tualatin"),
    (-122.64, 45.37, 22500, "WestLinn"), (-122.62, 45.44, 20700, "Milwaukie"),
    (-121.17, 45.60, 20600, "CitrusPark"), (-122.86, 45.15, 20400, "Woodburn"),
    (-123.36, 43.22, 20300, "Roseburg"),
]  # reference tests/test_dggrid.py:159-175

GOLDEN_PRESENCE = {"021114", "021116", "014626"}  # reference :177-182

TWO_POINTS = [(20.5, 57.5), (21.0, 58.0)]
GOLDEN_ZONES = {51695, 51548}  # reference :496-527


@pytest.fixture(scope="module")
def oregon_grid():
    # pole from the golden test: lon 11.20, lat 58.282525588538994675786, az 0
    g = IGeo7Grid(pole_lon=11.20, pole_lat=58.282525588538994675786, azimuth=0.0)
    return g


def test_oregon_semantic(oregon_grid):
    lon = np.array([r[0] for r in OREGON])
    lat = np.array([r[1] for r in OREGON])
    z = oregon_grid.encode(lon, lat, 4)
    s = ig.z7_to_string(z)
    # structural: res-4 strings are base(2)+4 digits; 15 points collapse into
    # few occupied cells (DGGRID produced 3); geometry scale matches
    assert all(len(x) == 6 for x in s)
    occupied = set(s.tolist())
    assert 1 <= len(occupied) <= 6
    # all cities except the 3 southern ones sit within ~200km -> same/adjacent cells
    clon, clat = oregon_grid.decode(z)
    from dggrid4py_ray.dggs.sphere import haversine_km
    d = haversine_km(lon, lat, clon, clat)
    from dggrid4py_ray.dggs.stats import cls_km
    assert d.max() < 1.6 * cls_km(4)


def test_oregon_golden_literals(oregon_grid):
    """Bit-exact DGGRID Z7 parity: the reference's golden presence-binning
    cells (tests/test_dggrid.py:177-182) — the lattice (alternating Class
    I/II substitution), digit convention (CPI inherited frames) and base
    numbering are all calibrated to the DGGRID binary's output."""
    lon = np.array([r[0] for r in OREGON])
    lat = np.array([r[1] for r in OREGON])
    s = set(ig.z7_to_string(oregon_grid.encode(lon, lat, 4)).tolist())
    assert s == GOLDEN_PRESENCE


def test_two_points_semantic(oregon_grid):
    g = oregon_grid  # golden orientation (11.20, 58.2825255885…)
    lon = np.array([p[0] for p in TWO_POINTS])
    lat = np.array([p[1] for p in TWO_POINTS])
    z = g.encode(lon, lat, 5)
    seq = ig.z7_to_seqnum(z)
    # two distinct adjacent-area cells with valid seqnums
    assert len(set(seq.tolist())) == 2
    assert all(1 <= s <= ig.num_cells(5) for s in seq)
    # each point inside its cell polygon (same containment the golden rings assert)
    from dggrid4py_ray.geometry import PolygonSet
    verts = g.boundary(z)
    for i in range(2):
        ring = verts[i][~np.isnan(verts[i, :, 0])]
        assert PolygonSet([[ring]]).contains(lon[i:i + 1], lat[i:i + 1])[0]
    # golden polygons are ~62km cells; ours must be the same scale
    from dggrid4py_ray.dggs.stats import cls_km
    from dggrid4py_ray.dggs.sphere import haversine_km
    clon, clat = g.decode(z)
    assert haversine_km(lon, lat, clon, clat).max() < cls_km(5)


def test_two_points_golden_literals(oregon_grid):
    """DGGRID quad-ij SEQNUM order (round-3 calibration, dggs/dggrid_seqnum):
    the two golden zones from the reference's cells_for_geo_points test.
    The zone<->cell pairing follows the pinned POLYGONS (which come from the
    same grid-gen call as the zone ids): zone 51548 is the ring containing
    (20.5, 57.5) and 51695 the ring containing (21.0, 58.0)."""
    lon = np.array([p[0] for p in TWO_POINTS])
    lat = np.array([p[1] for p in TWO_POINTS])
    z = oregon_grid.encode(lon, lat, 5)
    seq = oregon_grid.to_seqnum_dggrid(z, 5)
    assert seq.tolist() == [51548, 51695]
    assert set(seq.tolist()) == GOLDEN_ZONES
