"""Count-Min sketch laws: one-sided error, parallelism invariance,
exactness in the wide regime, error bound in the approximate regime."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dggrid4py_ray.stages.sampling import (cms_counts, cms_merge,
                                           cms_partials, cms_query)


def _zipf_keys(n=20000, n_keys=3000, seed=7):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n) % n_keys
    return pd.DataFrame({"k": [f"key_{r}" for r in ranks]})


def test_cms_never_undercounts_and_bounds_overcount():
    df = _zipf_keys()
    exact = df["k"].value_counts()
    ds = ray.data.from_pandas(df).repartition(8)
    depth, width = 4, 512  # width << 3000 distinct: approximate regime
    sk = cms_merge(cms_partials(ds, "k", depth, width), depth, width)
    keys = pa.array(exact.index.to_numpy())
    est = cms_query(sk, keys, depth, width)
    true = exact.to_numpy()
    assert (est >= true).all()  # one-sided
    # standard bound: overcount <= e*N/width with prob 1-exp(-depth);
    # assert a loose deterministic multiple of N/width over ALL keys
    assert (est - true).max() <= 8 * len(df) / width


def test_cms_parallelism_invariance():
    df = _zipf_keys(n=5000, n_keys=500)
    depth, width = 3, 1024
    sks = []
    for parts in [1, 3, 9]:
        ds = ray.data.from_pandas(df).repartition(parts)
        sks.append(cms_merge(cms_partials(ds, "k", depth, width),
                             depth, width))
    assert np.array_equal(sks[0], sks[1])
    assert np.array_equal(sks[1], sks[2])
    # total mass per row == N
    assert (sks[0].sum(axis=1) == len(df)).all()


def test_cms_exact_in_wide_regime():
    df = _zipf_keys(n=8000, n_keys=120)
    exact = df["k"].value_counts()
    ds = ray.data.from_pandas(df).repartition(4)
    t = cms_counts(ds, "k", depth=4, width=8192).to_pandas() \
        .set_index("k")["est_cnt"]
    for k, v in exact.items():
        assert t[k] == v


def test_cms_null_keys_count_in_sentinel_lane():
    """NULL keys hash to the dedicated sentinel (not '' / 'None'):
    the sketch's total mass still equals N and non-null estimates are
    unaffected by the null rows."""
    df = pd.DataFrame({"k": ["a", None, "a", None, "b"]})
    ds = ray.data.from_pandas(df).repartition(2)
    depth, width = 3, 64
    sk = cms_merge(cms_partials(ds, "k", depth, width), depth, width)
    assert (sk.sum(axis=1) == 5).all()
    est = cms_query(sk, pa.array(["a", "b"]), depth, width)
    assert est[0] >= 2 and est[1] >= 1
