"""Zone-map clustered sink/pruned source, HLL intersection estimation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dggrid4py_ray.stages.sampling import hll_intersection_estimate
from dggrid4py_ray.state.checkpoint import (read_zonemap_pruned,
                                            write_clustered)


def test_write_clustered_prunes_and_is_lossless(tmp_path):
    rng = np.random.default_rng(2)
    n = 20000
    df = pd.DataFrame({"k": rng.permutation(n).astype(np.int64),
                       "v": rng.integers(0, 100, n).astype(np.int64)})
    out = str(tmp_path / "zm")
    man = write_clustered(ray.data.from_pandas(df).repartition(8),
                          out, "k", ["k"], rows_per_file=2048)
    assert len(man["files"]) >= 8
    lo, hi = 3000, 4000
    ds, n_read, n_total = read_zonemap_pruned(out, "k", lo, hi)
    # after the cluster sort, a 5% range must not read most files
    assert n_read < n_total / 2
    got = ds.to_pandas().sort_values("k", ignore_index=True)
    want = df[(df.k >= lo) & (df.k < hi)].sort_values(
        "k", ignore_index=True)
    pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])


def test_read_zonemap_empty_range(tmp_path):
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                       "v": np.ones(100, dtype=np.int64)})
    out = str(tmp_path / "zm2")
    write_clustered(ray.data.from_pandas(df), out, "k", rows_per_file=32)
    ds, n_read, n_total = read_zonemap_pruned(out, "k", 10_000, 20_000)
    # round 5: a fully-pruned range returns a TYPED empty dataset (the
    # old None return broke every downstream caller on empty ranges)
    assert n_read == 0 and n_total >= 1
    got = ds.to_pandas()
    assert len(got) == 0
    assert {"k", "v"} <= set(got.columns)


def test_write_clustered_rejects_unknown_zone_col(tmp_path):
    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    out = str(tmp_path / "zm3")
    write_clustered(ray.data.from_pandas(df), out, "k")
    import pytest
    with pytest.raises(ValueError):
        read_zonemap_pruned(out, "nope", 0, 1)


def test_hll_intersection_overlap_regimes():
    a = pd.DataFrame({"k": np.arange(0, 4000, dtype=np.int64)})
    b = pd.DataFrame({"k": np.arange(3000, 7000, dtype=np.int64)})
    r = hll_intersection_estimate(
        ray.data.from_pandas(a).repartition(4), "k",
        ray.data.from_pandas(b).repartition(3), "k", p=12)
    # true: |A|=4000 |B|=4000 |A∪B|=7000 |A∩B|=1000; HLL at p=12 is ~2%
    assert abs(r["est_a"] - 4000) < 300
    assert abs(r["est_b"] - 4000) < 300
    assert abs(r["est_union"] - 7000) < 500
    assert abs(r["est_intersection"] - 1000) < 600

    # disjoint sets: clamped at >= 0 and small relative to the sets
    c = pd.DataFrame({"k": np.arange(100000, 104000, dtype=np.int64)})
    r2 = hll_intersection_estimate(
        ray.data.from_pandas(a), "k", ray.data.from_pandas(c), "k", p=12)
    assert 0 <= r2["est_intersection"] < 400


def test_hll_intersection_parallelism_invariant():
    a = pd.DataFrame({"k": np.arange(0, 2000, dtype=np.int64)})
    b = pd.DataFrame({"k": np.arange(1000, 3000, dtype=np.int64)})
    r1 = hll_intersection_estimate(ray.data.from_pandas(a), "k",
                                   ray.data.from_pandas(b), "k")
    r2 = hll_intersection_estimate(
        ray.data.from_pandas(a).repartition(7), "k",
        ray.data.from_pandas(b).repartition(5), "k")
    assert r1 == r2
