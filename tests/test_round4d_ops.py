"""Round-4d operators: bounded-frame windows (LAG / rolling mean),
grouped moments, cube/pivot relational ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _events(n=20_000, users=300, seed=7):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "g": rng.integers(0, users, n),
        "o": rng.permutation(n),          # unique order key
        "v": np.round(rng.uniform(0, 100, n), 2),
    })
    return df


def test_group_shift_matches_pandas_multiblock():
    from dggrid4py_ray.stages.window import group_shift

    df = _events()
    ds = ray.data.from_pandas(df).repartition(13)
    for k in (1, 3):
        out = (group_shift(ds, "g", ["o"], "v", k=k, out_col="lag")
               .to_pandas().sort_values(["g", "o"], ignore_index=True))
        ref = df.sort_values(["g", "o"], ignore_index=True)
        exp = ref.groupby("g")["v"].shift(k)
        got = out["lag"]
        assert got.isna().equals(exp.isna())
        m = ~exp.isna()
        assert np.allclose(got[m], exp[m])


def test_group_rolling_mean_matches_pandas_multiblock():
    from dggrid4py_ray.stages.window import group_rolling_mean

    df = _events(seed=11)
    ds = ray.data.from_pandas(df).repartition(17)
    for w in (1, 4):
        out = (group_rolling_mean(ds, "g", ["o"], "v", window=w,
                                  out_col="m")
               .to_pandas().sort_values(["g", "o"], ignore_index=True))
        ref = df.sort_values(["g", "o"], ignore_index=True)
        exp = (ref.groupby("g")["v"]
               .rolling(w, min_periods=1).mean()
               .reset_index(level=0, drop=True).sort_index())
        assert np.allclose(out["m"].to_numpy(), exp.to_numpy())


def test_group_shift_single_giant_group():
    """One group spanning every block exercises the multi-hop tail carry."""
    from dggrid4py_ray.stages.window import group_shift

    n = 5_000
    df = pd.DataFrame({"g": np.zeros(n, np.int64),
                       "o": np.arange(n), "v": np.arange(n, dtype=float)})
    ds = ray.data.from_pandas(df).repartition(23)
    out = (group_shift(ds, "g", ["o"], "v", k=2, out_col="lag")
           .to_pandas().sort_values("o", ignore_index=True))
    assert out["lag"].isna().sum() == 2
    assert np.allclose(out["lag"][2:], np.arange(n - 2, dtype=float))
