"""Hilbert curve key tests: bijection, unit-step adjacency (the property
Morton lacks), roundtrip, and the dataset stage."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from dggrid4py_ray.stages.sfc import (add_hilbert_key, hilbert_decode,
                                      hilbert_encode)


@pytest.mark.parametrize("order", [2, 4, 6])
def test_bijection_and_unit_steps(order):
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_encode(xs.ravel(), ys.ravel(), order=order)
    assert sorted(d.tolist()) == list(range(n * n))
    idx = np.argsort(d)
    steps = (np.abs(np.diff(xs.ravel()[idx]))
             + np.abs(np.diff(ys.ravel()[idx])))
    assert (steps == 1).all()          # consecutive keys are neighbors


def test_roundtrip_order16_random():
    rng = np.random.default_rng(7)
    gx = rng.integers(0, 1 << 16, 50000)
    gy = rng.integers(0, 1 << 16, 50000)
    k = hilbert_encode(gx, gy)
    rx, ry = hilbert_decode(k)
    assert (rx == gx).all() and (ry == gy).all()
    assert k.min() >= 0 and k.max() < 1 << 32


def test_out_of_range_raises():
    with pytest.raises(ValueError):
        hilbert_encode(np.array([1 << 16]), np.array([0]))


def test_add_hilbert_key_stage():
    df = pd.DataFrame({"x": np.arange(100, dtype=np.int64),
                       "y": (np.arange(100, dtype=np.int64) * 3) % 97})
    out = add_hilbert_key(ray.data.from_pandas(df).repartition(4),
                          "x", "y").to_pandas()
    exp = hilbert_encode(df["x"].to_numpy(), df["y"].to_numpy())
    got = out.sort_values("x")["hilbert_key"].to_numpy()
    assert (got == exp).all()
