"""Guard the round-2 integration recipe: aperture-7 parent/child structure
and digit bijection on the projection-exact flat lattice (low res; the full
sweep lives in experiments/z7_bijection_check.py)."""

import collections
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def test_flat_lattice_z7_bijection():
    from experiments.z7_bijection_check import enumerate_cells
    from dggrid4py_ray.dggs.isea7h_flat import ISEA7HFlatGrid

    g = ISEA7HFlatGrid()
    for res in [1, 2]:
        ids = enumerate_cells(g, res)
        assert len(ids) == ISEA7HFlatGrid.num_cells(res)
        lo, la = g.decode(ids, res)
        parents = g.encode(lo, la, res - 1)
        counts = collections.Counter(collections.Counter(parents.tolist()).values())
        # exactly 12 pentagon parents with 6 children; all others 7
        assert counts[6] == 12
        assert set(counts) <= {6, 7}


def test_z7_bridge_bijection():
    """Flat cells -> Z7 ids: perfect bijection with per-base subtree sizes
    matching the pentagon law p(res) (the seqnum codec's assumption)."""
    import collections
    from experiments.z7_bijection_check import enumerate_cells
    from dggrid4py_ray.dggs.isea7h_z7bridge import Z7Bridge
    from dggrid4py_ray.dggs import igeo7 as ig

    br = Z7Bridge()
    for res in [1, 2]:
        ids = enumerate_cells(br.g, res)
        z7 = br.z7_of_flat(ids, res)
        assert len(np.unique(z7)) == len(ids) == ig.num_cells(res)
        bases = collections.Counter(ig.z7_base_cell(z7).tolist())
        p = ig._p_sizes(res)[res]
        assert all(bases[b] == p for b in range(12))
        assert ig.z7_is_pentagon(z7).sum() == 12
        # seqnum codec works unchanged on bridge ids
        seq = ig.z7_to_seqnum(z7, pent_digits=br.pentagon_ring_digits)
        assert len(np.unique(seq)) == len(ids)
        assert seq.min() == 1 and seq.max() == ig.num_cells(res)
