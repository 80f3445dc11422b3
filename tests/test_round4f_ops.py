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


def _brute_moran(df: pd.DataFrame):
    n = len(df)
    xbar = df["n"].sum() / n
    m2 = (df["n"] ** 2).sum() / n - xbar * xbar
    pos = {(x, y): v for x, y, v in zip(df["x"], df["y"], df["n"])}
    rows = []
    for x, y, v in zip(df["x"], df["y"], df["n"]):
        lag = sum(pos.get((x + dx, y + dy), 0) - 0
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  if not (dx == 0 and dy == 0)
                  and (x + dx, y + dy) in pos)
        w = sum(1 for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if not (dx == 0 and dy == 0) and (x + dx, y + dy) in pos)
        i = (v - xbar) * (lag - xbar * w) / m2
        rows.append({"x": x, "y": y, "lag_sum": lag,
                     "n_neighbors": w, "moran_i": i})
    return pd.DataFrame(rows).sort_values(["x", "y"], ignore_index=True)


def test_local_moran_matches_bruteforce():
    from dggrid4py_ray.stages.interp import local_moran

    rng = np.random.default_rng(17)
    xs, ys = np.meshgrid(np.arange(25), np.arange(18))
    keep = rng.random(xs.size) < 0.5
    df = pd.DataFrame({
        "x": xs.ravel()[keep].astype(np.int64),
        "y": ys.ravel()[keep].astype(np.int64),
        "n": rng.integers(1, 40, keep.sum()).astype(np.int64)})
    out = (local_moran(ray.data.from_pandas(df).repartition(7),
                       "x", "y", "n")
           .to_pandas().sort_values(["x", "y"], ignore_index=True))
    exp = _brute_moran(df)
    np.testing.assert_array_equal(out["lag_sum"], exp["lag_sum"])
    np.testing.assert_array_equal(out["n_neighbors"], exp["n_neighbors"])
    np.testing.assert_allclose(out["moran_i"], exp["moran_i"], rtol=1e-11)


def test_morton_roundtrip_and_locality():
    from dggrid4py_ray.stages.sfc import morton_decode, morton_encode

    rng = np.random.default_rng(23)
    gx = rng.integers(0, 1 << 16, 50000)
    gy = rng.integers(0, 1 << 16, 50000)
    key = morton_encode(gx, gy)
    rx, ry = morton_decode(key)
    np.testing.assert_array_equal(rx, gx)
    np.testing.assert_array_equal(ry, gy)
    # keys are unique per cell and bounded by 32 bits
    assert key.min() >= 0 and key.max() < (1 << 32)
    # locality: a 2x2 aligned block is contiguous in key space
    for bx, by in [(0, 0), (10, 4), (100, 200)]:
        block = morton_encode(
            np.array([2 * bx, 2 * bx + 1, 2 * bx, 2 * bx + 1]),
            np.array([2 * by, 2 * by, 2 * by + 1, 2 * by + 1]))
        assert sorted(block) == list(range(block.min(), block.min() + 4))
    with pytest.raises(ValueError):
        morton_encode(np.array([1 << 16]), np.array([0]))


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
