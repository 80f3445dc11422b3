"""Geostatistics operator tests: semivariogram vs numpy all-pairs brute
force, radius of gyration vs the direct per-key formula."""

import numpy as np
import pandas as pd
import ray.data

from dggrid4py_ray.dggs.sphere import haversine_km


def _points(n, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-85, 85, n),
        "value": rng.normal(0, 10, n)})


def test_semivariogram_matches_bruteforce():
    from dggrid4py_ray.stages.geostats import semivariogram

    df = _points(400, seed=3)
    lag, nbins = 500.0, 8
    i, j = np.triu_indices(len(df), k=1)
    d = haversine_km(df["lon"].to_numpy()[i], df["lat"].to_numpy()[i],
                     df["lon"].to_numpy()[j], df["lat"].to_numpy()[j])
    keep = d <= lag * nbins
    b = np.minimum((d[keep] / lag).astype(np.int64), nbins - 1)
    dz2 = (df["value"].to_numpy()[i] - df["value"].to_numpy()[j])[keep] ** 2
    exp = pd.DataFrame({"bin": b, "ss": dz2, "one": 1}).groupby("bin").agg(
        n_pairs=("one", "sum"), ss=("ss", "sum")).reset_index()
    exp["gamma"] = exp["ss"] / (2 * exp["n_pairs"])

    ds = ray.data.from_pandas(df).repartition(7)
    got = semivariogram(ds, lag_width_km=lag, n_bins=nbins).to_pandas()
    merged = got.merge(exp[["bin", "n_pairs", "gamma"]], on="bin",
                       suffixes=("", "_exp"))
    assert len(merged) == len(exp) == len(got)
    assert (merged["n_pairs"] == merged["n_pairs_exp"]).all()
    assert np.allclose(merged["gamma"], merged["gamma_exp"], rtol=1e-10)


def test_radius_of_gyration_matches_direct():
    from dggrid4py_ray.stages.geostats import radius_of_gyration

    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame({
        "user": rng.integers(0, 37, n).astype(np.int64),
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-85, 85, n)})

    def direct(g):
        clat, clon = g["lat"].mean(), g["lon"].mean()
        d = haversine_km(g["lon"].to_numpy(), g["lat"].to_numpy(),
                         clon, clat)
        return pd.Series({"n_points": len(g),
                          "rog_km": float(np.sqrt((d * d).mean()))})

    exp = df.groupby("user").apply(direct, include_groups=False) \
        .reset_index()
    ds = ray.data.from_pandas(df).repartition(9)
    got = radius_of_gyration(ds, key="user", lon_col="lon",
                             lat_col="lat").to_pandas() \
        .sort_values("user", ignore_index=True)
    assert (got["user"] == exp["user"]).all()
    assert (got["n_points"].to_numpy() ==
            exp["n_points"].to_numpy()).all()
    assert np.allclose(got["rog_km"], exp["rog_km"], rtol=1e-9)


def test_semivariogram_single_bin_and_empty_far_bins():
    from dggrid4py_ray.stages.geostats import semivariogram

    # two antipodal-ish clusters: all close pairs in bin 0, cross-cluster
    # pairs far beyond max_lag -> absent
    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "lon": [0.0, 0.1, 0.05, 179.0, 179.1, 179.05],
        "lat": [0.0, 0.05, 0.1, 0.0, 0.05, 0.1],
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]})
    got = semivariogram(ray.data.from_pandas(df), lag_width_km=50.0,
                        n_bins=4).to_pandas()
    assert got["bin"].tolist() == [0]
    assert got["n_pairs"].tolist() == [6]  # 2 x C(3,2)
