"""Property-based fuzzing (hypothesis) over the codec / hierarchy algebra —
the reference has no randomized tests (SURVEY §5); these pin the invariants
that must hold for EVERY cell, not just golden samples.

Hypothesis drives the sampling; each property is checked on vectorized
batches (one grid build per module via the session fixtures)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from dggrid4py_ray.dggs import igeo7 as ig


RES = 5


def _cells(grid, seqs):
    seqs = np.asarray(sorted(set(seqs)), dtype=np.int64)
    return grid.from_seqnum(seqs, RES)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(1, ig.num_cells(RES)), min_size=1, max_size=64))
def test_seqnum_bijection_fuzz(grid, seqs):
    z = _cells(grid, seqs)
    back = grid.to_seqnum(z)
    assert sorted(back.tolist()) == sorted(set(seqs))
    # DGGRID-order seqnum also roundtrips on the same cells
    s2 = grid.to_seqnum_dggrid(z, RES)
    assert (grid.from_seqnum_dggrid(s2, RES) == z).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(1, ig.num_cells(RES)), min_size=1, max_size=64))
def test_string_hex_roundtrip_fuzz(grid, seqs):
    z = _cells(grid, seqs)
    assert (ig.z7_from_string(ig.z7_to_string(z)) == z).all()
    assert (ig.z7_from_hex(ig.z7_to_hex(z)) == z).all()
    assert (ig.z7_resolution(z) == RES).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(1, ig.num_cells(RES - 1)), min_size=1, max_size=32))
def test_parent_child_inverse_fuzz(grid, seqs):
    seqs = np.asarray(sorted(set(seqs)), dtype=np.int64)
    parents = grid.from_seqnum(seqs, RES - 1)
    kids = grid.children(parents) if hasattr(grid, "children") \
        else ig.z7_children(parents, pent_digits=grid.pent_digits)
    for p, row in zip(parents, np.atleast_2d(kids)):
        row = row[row != ig.INVALID_ID]
        assert len(row) in (6, 7)
        assert (ig.z7_parent(row) == p).all()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.floats(-179.99, 179.99), st.floats(-89.9, 89.9)),
                min_size=1, max_size=64))
def test_encode_decode_idempotent_fuzz(grid, pts):
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    z = grid.encode(lon, lat, RES)
    clon, clat = grid.decode(z)
    # re-encoding the center returns the same cell (centers are interior)
    assert (grid.encode(clon, clat, RES) == z).all()
    assert (ig.z7_resolution(z) == RES).all()
