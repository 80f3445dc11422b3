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
