"""Z7 codec algebra: round-trips and invariants (mirrors the reference's own
unit surface, /root/reference/dggrid4py/igeo7.py and FIXTURES.md F2)."""

import numpy as np
import pytest

from dggrid4py_ray.dggs import igeo7 as ig


def test_cells_law():
    for r in range(8):
        assert ig.num_cells(r) == 10 * 7**r + 2


def test_seqnum_bijection():
    for res in [0, 1, 2, 3]:
        n = ig.num_cells(res)
        seq = np.arange(1, n + 1, dtype=np.int64)
        z = ig.seqnum_to_z7(seq, res)
        assert len(np.unique(z)) == n
        assert np.array_equal(ig.z7_to_seqnum(z), seq)
        assert np.all(ig.z7_resolution(z) == res)


def test_string_hex_roundtrip(grid, random_points):
    lon, lat = random_points
    z = grid.encode(lon[:300], lat[:300], 6)
    s = ig.z7_to_string(z)
    assert np.array_equal(ig.z7_from_string(s), z)
    # resolution = len - 2  (reference igeo7.py:88-95)
    assert all(len(x) - 2 == 6 for x in s)
    h = ig.z7_to_hex(z)
    assert np.array_equal(ig.z7_from_hex(h), z)
    assert all(len(x) == 16 for x in h)


def test_parent_child():
    res = 4
    n = ig.num_cells(res)
    z = ig.seqnum_to_z7(np.arange(1, n + 1, dtype=np.int64), res)
    ch = ig.z7_children(z)
    flat = ch[ch != ig.INVALID_ID]
    # children partition the next level exactly
    assert len(flat) == ig.num_cells(res + 1)
    assert len(np.unique(flat)) == len(flat)
    # parent(child) == cell for every child
    par = ig.z7_parent(flat)
    exp = np.repeat(z, np.where(ig.z7_is_pentagon(z), 6, 7))
    assert np.array_equal(np.sort(par), np.sort(exp))


def test_pentagons():
    res = 3
    z = ig.seqnum_to_z7(np.arange(1, ig.num_cells(res) + 1, dtype=np.int64), res)
    pent = ig.z7_is_pentagon(z)
    assert pent.sum() == 12  # exactly 12 pentagons at every res
    ch = ig.z7_children(z[pent])
    assert np.all(ch[:, 6] == ig.INVALID_ID)  # 6 children (digit 2 skipped)
    digs = ig.z7_digits(ch[:, :6].reshape(-1), res + 1)
    assert set(np.unique(digs[:, res])) <= {0, 1, 3, 4, 5, 6}


def test_negative_ids_are_valid():
    # base cells >= 8 produce negative int64 ids; they must round-trip
    z = ig.seqnum_to_z7(np.array([ig.num_cells(2)], dtype=np.int64), 2)
    assert z[0] < 0
    assert ig.z7_base_cell(z)[0] == 11
    assert ig.z7_to_seqnum(z)[0] == ig.num_cells(2)
