"""Round-4f operator tests: Getis-Ord Gi* hotspot statistic and
integer-category pivot (the Mann-Kendall trend building block)."""

import numpy as np
import pandas as pd
import pytest
import ray.data


def _brute_gi(df: pd.DataFrame, radius: int):
    """Reference Gi* over occupied cells (binary weights incl. self)."""
    n = len(df)
    xbar = df["n"].sum() / n
    S = np.sqrt((df["n"] ** 2).sum() / n - xbar * xbar)
    pos = {(x, y): v for x, y, v in zip(df["x"], df["y"], df["n"])}
    rows = []
    for x, y in zip(df["x"], df["y"]):
        G = W = 0
        for dx in range(-radius, radius + 1):
            for dy in range(-radius, radius + 1):
                v = pos.get((x + dx, y + dy))
                if v is not None:
                    G += v
                    W += 1
        z = (G - xbar * W) / (S * np.sqrt((n * W - W * W) / (n - 1.0)))
        rows.append({"x": x, "y": y, "focal_sum": G,
                     "n_neighbors": W, "z": z})
    return pd.DataFrame(rows).sort_values(["x", "y"], ignore_index=True)


def test_gi_star_matches_bruteforce():
    from dggrid4py_ray.stages.interp import gi_star

    rng = np.random.default_rng(11)
    xs, ys = np.meshgrid(np.arange(30), np.arange(20))
    keep = rng.random(xs.size) < 0.45
    df = pd.DataFrame({
        "x": xs.ravel()[keep].astype(np.int64),
        "y": ys.ravel()[keep].astype(np.int64),
        "n": rng.integers(1, 50, keep.sum()).astype(np.int64)})
    out = (gi_star(ray.data.from_pandas(df).repartition(9), "x", "y", "n")
           .to_pandas().sort_values(["x", "y"], ignore_index=True))
    exp = _brute_gi(df, 1)
    assert len(out) == len(df)
    np.testing.assert_array_equal(out["focal_sum"], exp["focal_sum"])
    np.testing.assert_array_equal(out["n_neighbors"], exp["n_neighbors"])
    np.testing.assert_allclose(out["z"], exp["z"], rtol=1e-12)
    # a hotspot (cluster of high counts) must have a larger z than an
    # isolated low-count edge cell: check global consistency instead —
    # the max-z cell has an above-average focal mean per neighbor
    hot = out.loc[out["z"].idxmax()]
    assert hot["focal_sum"] / hot["n_neighbors"] > df["n"].mean()


def test_gi_star_needs_two_cells():
    from dggrid4py_ray.stages.interp import gi_star

    df = pd.DataFrame({"x": [0], "y": [0], "n": [5]})
    with pytest.raises(ValueError):
        gi_star(ray.data.from_pandas(df), "x", "y", "n")


def test_pivot_counts_int_categories_value_sums():
    from dggrid4py_ray.stages.relational import pivot_counts

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"k": rng.integers(0, 40, 5000),
                       "wk": rng.integers(100, 104, 5000).astype(np.int64),
                       "v": rng.integers(1, 9, 5000).astype(np.int64)})
    weeks = [100, 101, 102, 103]
    out = (pivot_counts(ray.data.from_pandas(df).repartition(7),
                        "k", "wk", weeks, value_col="v", prefix="w_")
           .to_pandas().sort_values("k", ignore_index=True))
    ref = df.pivot_table(index="k", columns="wk", values="v",
                         aggfunc="sum", fill_value=0).reset_index()
    for w in weeks:
        np.testing.assert_array_equal(out[f"w_{w}"].to_numpy(),
                                      ref[w].to_numpy())
