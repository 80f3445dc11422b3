"""zonemap_merge_join: exchange-free join of two clustered layouts."""

import shutil

import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("seed", [0, 1])
def test_zonemap_join_equals_plain_join(ray_session, tmp_path, seed):
    import ray.data
    from dggrid4py_ray.stages.join import zonemap_merge_join
    from dggrid4py_ray.state.checkpoint import write_clustered

    rng = np.random.default_rng(seed)
    # heavy key duplication so equal keys straddle file boundaries on
    # BOTH sides after the cluster sort
    na, nb = 6000, 4000
    a = pd.DataFrame({"k": rng.integers(0, 300, na).astype(np.int64),
                      "va": rng.integers(0, 100, na).astype(np.int64)})
    b = pd.DataFrame({"k": rng.integers(0, 300, nb).astype(np.int64),
                      "vb": rng.integers(0, 100, nb).astype(np.int64)})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_clustered(ray.data.from_pandas(a).repartition(7), da, "k",
                    ["k"], rows_per_file=512)
    write_clustered(ray.data.from_pandas(b).repartition(5), db, "k",
                    ["k"], rows_per_file=512)

    got = zonemap_merge_join(da, db, "k").to_pandas()
    want = a.merge(b, on="k", how="inner")
    assert len(got) == len(want)
    gs = got.groupby("k").agg(n=("va", "size"), sa=("va", "sum"),
                              sb=("vb", "sum"))
    ws = want.groupby("k").agg(n=("va", "size"), sa=("va", "sum"),
                               sb=("vb", "sum"))
    pd.testing.assert_frame_equal(gs, ws)
    shutil.rmtree(da, ignore_errors=True)
    shutil.rmtree(db, ignore_errors=True)


def test_zonemap_join_disjoint_ranges_is_empty(ray_session, tmp_path):
    import ray.data
    from dggrid4py_ray.stages.join import zonemap_merge_join
    from dggrid4py_ray.state.checkpoint import write_clustered

    a = pd.DataFrame({"k": np.arange(0, 100, dtype=np.int64),
                      "va": np.ones(100, np.int64)})
    b = pd.DataFrame({"k": np.arange(1000, 1100, dtype=np.int64),
                      "vb": np.ones(100, np.int64)})
    da, db = str(tmp_path / "a2"), str(tmp_path / "b2")
    write_clustered(ray.data.from_pandas(a), da, "k", ["k"],
                    rows_per_file=32)
    write_clustered(ray.data.from_pandas(b), db, "k", ["k"],
                    rows_per_file=32)
    got = zonemap_merge_join(da, db, "k")
    assert got.count() == 0


def test_hilbert_bbox_ranges_cover_exactly_the_bbox(ray_session):
    import numpy as np
    from dggrid4py_ray.stages.sfc import (hilbert_bbox_ranges,
                                          hilbert_decode)

    ranges = hilbert_bbox_ranges(5, 12, 3, 9)
    keys = np.concatenate([np.arange(lo, hi, dtype=np.uint64)
                           for lo, hi in ranges])
    assert len(keys) == len(set(keys.tolist())) == 8 * 7
    gx, gy = hilbert_decode(keys)
    assert gx.min() == 5 and gx.max() == 12
    assert gy.min() == 3 and gy.max() == 9
    assert ((gx >= 5) & (gx <= 12) & (gy >= 3) & (gy <= 9)).all()
    # maximality: adjacent ranges are separated by a real gap
    los = [lo for lo, _ in ranges]
    his = [hi for _, hi in ranges]
    assert all(h < l for h, l in zip(his[:-1], los[1:]))
