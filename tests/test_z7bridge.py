"""Flat<->Z7 bridge: the position-model swap's correctness core.

The bridge defines the hierarchy geometrically (parent = nearest coarse
center, digit = angular rank in the parent ring) and must be (a) a perfect
bijection, (b) identical between the Eisenstein-residue fast path and the
geometric slow path, (c) exactly invertible at every resolution.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bridge():
    from dggrid4py_ray.dggs.isea7h_z7bridge import Z7Bridge
    br = Z7Bridge()
    br.ensure_tables()
    return br


def test_tables_bijection(bridge):
    from dggrid4py_ray.dggs import igeo7 as ig
    for res in range(0, 5):
        t = bridge._tables[res]
        n = 10 * 7**res + 2
        assert len(t["flat"]) == n
        assert len(np.unique(t["z7"])) == n
        seq = ig.z7_to_seqnum(t["z7"])
        assert seq.min() == 1 and seq.max() == n and len(np.unique(seq)) == n


def test_fast_path_equals_geometric(bridge):
    rng = np.random.default_rng(11)
    n = 4000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    for res in [6, 8]:
        uniq = np.unique(bridge.g.encode(lon, lat, res))
        pf, df = bridge.level_digits(uniq, res)
        ps, ds = bridge._slow_digits(uniq, res)
        assert np.array_equal(pf, ps)
        assert np.array_equal(df, ds)
        # top-down inverse of bottom-up
        back = bridge.level_children(pf, df, res)
        assert np.array_equal(back, uniq)


def test_conversion_roundtrip_high_res(bridge):
    rng = np.random.default_rng(12)
    n = 8000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    for res in [5, 7, 10]:
        flat = bridge.g.encode(lon, lat, res)
        z7 = bridge.z7_of_flat(flat, res)
        assert len(np.unique(z7)) == len(np.unique(flat))
        assert np.array_equal(bridge.flat_of_z7(z7, res), flat)


def test_children_complete(bridge):
    """Every parent's algebraic children exist as cells: expanding all res-2
    cells by (digit-set) reproduces exactly the res-3 cell universe."""
    from dggrid4py_ray.dggs import igeo7 as ig
    t2 = bridge._tables[2]
    z = t2["z7"]
    ch = ig.z7_children(z)
    ch = ch[ch != ig.INVALID_ID]
    t3 = bridge._tables[3]
    assert np.array_equal(np.sort(ch), np.sort(t3["z7"]))
