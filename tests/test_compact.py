"""compact_cells / uncompact_cells (the H3 compact analog on the Z7 tree).

Reference parity target: igeo7 parent/children algebra
(reference igeo7_ext.py) — compaction itself is beyond-reference
(H3's compact/uncompact contract, mass-conserving cover minimization).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dggrid4py_ray.dggs.igeo7 import (
    z7_children, z7_from_string, z7_is_pentagon, z7_resolution, INVALID_ID,
)
from dggrid4py_ray.stages.encode import compact_cells, uncompact_cells


def _ids(ds) -> np.ndarray:
    out = ds.to_pandas()["cell_id"].to_numpy().astype(np.int64)
    return np.sort(out)


def _full_descendants(z: np.ndarray, to_res: int) -> np.ndarray:
    work = z
    while True:
        res = z7_resolution(work)
        if (res >= to_res).all():
            return work
        fine = work[res < to_res]
        done = work[res >= to_res]
        ch = z7_children(fine).ravel()
        work = np.concatenate([done, ch[ch != INVALID_ID]])


def test_compact_full_children_set_promotes_to_parents():
    base = z7_from_string(np.array(["0001002", "0001020", "2003104"]))
    fine = _full_descendants(base, 7)
    ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(fine)}))
    got = _ids(compact_cells(ds.repartition(8)))
    assert np.array_equal(got, np.sort(base))


def test_compact_uncompact_roundtrip_mixed_res():
    # a set that is already compact: one res-4 cell, plus 6 of the 7
    # children of an unrelated res-4 cell (incomplete group stays)
    a = z7_from_string(np.array(["00010"]))
    b_kids = z7_children(z7_from_string(np.array(["20031"]))).ravel()
    b_kids = b_kids[b_kids != INVALID_ID][:6]
    cells = np.concatenate([a, b_kids])
    ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(cells)}))
    got = _ids(compact_cells(ds.repartition(5)))
    assert np.array_equal(got, np.sort(cells))
    # uncompact to res 6 then compact returns the same compact set
    exp = uncompact_cells(ds, 6)
    rt = _ids(compact_cells(exp))
    assert np.array_equal(rt, np.sort(cells))


def test_compact_pentagon_parent_needs_six():
    # a pentagon res-3 cell (base cell + all-zero digits) has 6 children
    p = z7_from_string(np.array(["1000"]))
    assert z7_is_pentagon(p).all()
    kids = z7_children(p).ravel()
    kids = kids[kids != INVALID_ID]
    assert len(kids) == 6
    ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(kids)}))
    got = _ids(compact_cells(ds.repartition(3)))
    assert np.array_equal(got, np.sort(p))
    # drop one child -> no promotion
    ds5 = ray.data.from_arrow(pa.table({"cell_id": pa.array(kids[:5])}))
    got5 = _ids(compact_cells(ds5))
    assert np.array_equal(got5, np.sort(kids[:5]))


def test_compact_cascades_multiple_levels_distributed():
    # full descendant set of ONE res-2 cell down at res 5 compacts all
    # the way back to the res-2 cell, across many blocks; threshold=0
    # forces the per-level distributed loop (not the local kernel)
    seed = z7_from_string(np.array(["000"]))
    fine = _full_descendants(seed, 5)
    ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(fine)}))
    got = _ids(compact_cells(ds.repartition(16), local_threshold=0))
    assert np.array_equal(got, seed)


def test_compact_boundary_groups_across_blocks():
    # siblings deliberately split across blocks: sorted input in tiny
    # blocks so every group straddles a boundary; promotion must still
    # happen via the coalesced boundary pass (threshold=0 = distributed)
    par = z7_from_string(np.array(["0001002", "0001020"]))
    kids = z7_children(par).ravel()
    kids = np.sort(kids[kids != INVALID_ID])
    ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(kids)}))
    got = _ids(compact_cells(ds.repartition(7), local_threshold=0))
    assert np.array_equal(got, np.sort(par))
    # and the local kernel agrees
    got_l = _ids(compact_cells(ds.repartition(7)))
    assert np.array_equal(got_l, np.sort(par))


def test_uncompact_counts_and_resolution():
    seed = z7_from_string(np.array(["0001002", "1000"]))  # res 5 hex + res 3 pent
    ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(seed)}))
    out = _ids(uncompact_cells(ds, 6))
    assert (z7_resolution(out) == 6).all()
    # hex res5 -> 7 children at 6; pentagon res3 -> 6*7*7 minus dead-digit
    # pruning: pentagon subtree loses one child per pentagon-center node
    hex_n = 7
    pent_n = len(_full_descendants(z7_from_string(np.array(["1000"])), 6))
    assert len(out) == hex_n + pent_n
    assert len(np.unique(out)) == len(out)


def test_uncompact_rejects_finer_input():
    seed = z7_from_string(np.array(["0001002"]))
    ds = ray.data.from_arrow(pa.table({"cell_id": pa.array(seed)}))
    with pytest.raises(Exception):
        uncompact_cells(ds, 3).materialize()
