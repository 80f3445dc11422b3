

import numpy as np


def test_seqnum_order_opt_out(grid):
    """ADVICE r3: `seqnum_order="native"` opts out of the (southern-quads
    uncalibrated) DGGRID quad-ij numbering to the engine-native order; both
    orders are exact bijections over the full res-2 universe."""
    from dggrid4py_ray.dggs.codecs import AddressCodec
    import dggrid4py_ray.dggs.igeo7 as ig
    import pytest as _pytest

    res = 2
    n = ig.num_cells(res)
    z = grid.from_seqnum(np.arange(1, n + 1, dtype=np.int64), res)
    dg = AddressCodec(grid, res)                       # default: dggrid order
    nat = AddressCodec(grid, res, seqnum_order="native")
    s_dg = dg.emit(z, "SEQNUM")
    s_nat = nat.emit(z, "SEQNUM")
    for s in (s_dg, s_nat):
        assert sorted(s.tolist()) == list(range(1, n + 1))
    assert np.array_equal(dg.parse(s_dg, "SEQNUM"), z)
    assert np.array_equal(nat.parse(s_nat, "SEQNUM"), z)
    assert not np.array_equal(s_dg, s_nat)             # genuinely different orders
    with _pytest.raises(ValueError):
        AddressCodec(grid, res, seqnum_order="bogus")
