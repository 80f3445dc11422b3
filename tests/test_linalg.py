"""Distributed covariance / PCA and grouped autocorrelation tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _emb_ds(x: np.ndarray, parts: int = 6):
    t = pa.table({"vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
                  "embedding": pa.array(list(x.astype(np.float32)))})
    return ray.data.from_arrow(t).repartition(parts)


def test_covariance_matches_numpy():
    from dggrid4py_ray.stages.linalg import covariance_stats

    rng = np.random.default_rng(4)
    x = rng.normal(size=(800, 12)) @ rng.normal(size=(12, 12))
    n, mean, cov = covariance_stats(_emb_ds(x), "embedding")
    x64 = x.astype(np.float32).astype(np.float64)
    assert n == 800
    assert np.allclose(mean, x64.mean(axis=0), atol=1e-12)
    assert np.allclose(cov, np.cov(x64, rowvar=False), atol=1e-10)


def test_pca_projection_matches_full_numpy():
    from dggrid4py_ray.stages.linalg import pca_components, pca_project

    rng = np.random.default_rng(8)
    # anisotropic cloud: strong first axis
    base = rng.normal(size=(500, 8)) * np.array([10, 5, 2, 1, 1, 1, 1, 1])
    q, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    x = base @ q
    ds = _emb_ds(x)
    mean, comps, evals = pca_components(ds, k=3)
    assert evals[0] > evals[1] > evals[2] > 0

    scores = pca_project(ds, mean, comps).to_pandas()
    s = np.vstack(scores.sort_values("vec_id")["pc"].to_numpy())
    # score variances equal the eigenvalues; scores are uncorrelated
    got_cov = np.cov(s, rowvar=False)
    assert np.allclose(np.diag(got_cov), evals, rtol=1e-8)
    off = got_cov - np.diag(np.diag(got_cov))
    assert np.abs(off).max() < 1e-8 * evals[0]
    # matches numpy eigh on the same covariance up to the sign rule
    x64 = x.astype(np.float32).astype(np.float64)
    w, v = np.linalg.eigh(np.cov(x64, rowvar=False))
    exp = (x64 - x64.mean(axis=0)) @ v[:, ::-1][:, :3]
    for c in range(3):
        assert (np.allclose(s[:, c], exp[:, c], atol=1e-8)
                or np.allclose(s[:, c], -exp[:, c], atol=1e-8))


def test_covariance_empty_raises():
    from dggrid4py_ray.stages.linalg import covariance_stats

    ds = _emb_ds(np.zeros((4, 3))).filter(lambda r: False)
    with pytest.raises(ValueError):
        covariance_stats(ds, "embedding")


def test_grouped_autocorr_matches_pandas():
    from dggrid4py_ray.stages.normalize import grouped_autocorr

    rng = np.random.default_rng(12)
    n = 4000
    df = pd.DataFrame({
        "g": rng.integers(0, 25, n).astype(np.int64),
        "ord": np.arange(n, dtype=np.int64),
        "v": rng.normal(size=n).cumsum()})   # random walk: real ACF
    got = grouped_autocorr(ray.data.from_pandas(df).repartition(7),
                           "g", ["ord"], "v", k=3).to_pandas() \
        .sort_values("g", ignore_index=True)

    rows = []
    for g, sub in df.sort_values("ord").groupby("g"):
        v = sub["v"].to_numpy()
        if len(v) > 3:
            a, b = v[3:], v[:-3]
            rows.append((g, len(a), np.corrcoef(a, b)[0, 1]))
    exp = pd.DataFrame(rows, columns=["g", "n", "acf"])
    assert (got["g"].to_numpy() == exp["g"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert np.allclose(got["acf"], exp["acf"], atol=1e-12)
