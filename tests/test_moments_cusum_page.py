"""Grouped higher moments, CUSUM change-point, and pagination tests."""

import numpy as np
import pandas as pd
import ray.data


def test_higher_moments_match_scipy_style_formulas():
    from dggrid4py_ray.stages.normalize import grouped_higher_moments

    rng = np.random.default_rng(2)
    n = 5000
    df = pd.DataFrame({"g": rng.integers(0, 8, n).astype(np.int64),
                       "v": rng.gamma(2.0, 3.0, n)})   # skewed
    got = grouped_higher_moments(
        ray.data.from_pandas(df).repartition(6), "g", "v").to_pandas() \
        .sort_values("g", ignore_index=True)

    for _, row in got.iterrows():
        v = df.loc[df["g"] == row["g"], "v"].to_numpy()
        nn = len(v)
        m = v.mean()
        m2 = ((v - m) ** 2).mean()
        m3 = ((v - m) ** 3).mean()
        m4 = ((v - m) ** 4).mean()
        g1 = m3 / m2 ** 1.5
        g2 = m4 / m2 ** 2 - 3
        assert row["n"] == nn
        assert np.isclose(row["stddev"], v.std(ddof=1), rtol=1e-10)
        assert np.isclose(row["skewness"],
                          g1 * np.sqrt(nn * (nn - 1)) / (nn - 2), rtol=1e-8)
        assert np.isclose(row["kurtosis"],
                          ((nn + 1) * g2 + 6) * (nn - 1)
                          / ((nn - 2) * (nn - 3)), rtol=1e-8)


def test_higher_moments_small_groups_null():
    from dggrid4py_ray.stages.normalize import grouped_higher_moments

    df = pd.DataFrame({"g": np.array([0, 1, 1, 2, 2, 2], dtype=np.int64),
                       "v": [5.0, 1.0, 2.0, 1.0, 2.0, 4.0]})
    got = grouped_higher_moments(ray.data.from_pandas(df), "g", "v") \
        .to_pandas().sort_values("g", ignore_index=True)
    assert got.loc[0, ["stddev", "skewness", "kurtosis"]].isna().all()
    assert np.isfinite(got.loc[1, "stddev"])
    assert got.loc[1, ["skewness", "kurtosis"]].isna().all()
    assert np.isfinite(got.loc[2, "skewness"])
    assert np.isnan(got.loc[2, "kurtosis"])


def test_cusum_changepoint_finds_planted_shift():
    from dggrid4py_ray.stages.temporal import cusum_changepoint

    rng = np.random.default_rng(3)
    rows = []
    for g in range(12):
        shift_at = 30 + 5 * g
        v = np.concatenate([rng.normal(0, 0.3, shift_at),
                            rng.normal(4.0, 0.3, 100 - shift_at)])
        for i, x in enumerate(v):
            rows.append((g, i, x))
    df = pd.DataFrame(rows, columns=["g", "i", "v"])
    got = cusum_changepoint(ray.data.from_pandas(df).repartition(7),
                            "g", ["i"], "v").to_pandas() \
        .sort_values("g", ignore_index=True)
    # the max-|CUSUM| position of a clean level shift is the last
    # pre-shift index
    for g in range(12):
        assert got.loc[g, "i"] == 30 + 5 * g - 1
        assert got.loc[g, "n"] == 100


def test_paginate_matches_sorted_slice():
    from dggrid4py_ray.stages.relational import paginate

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": np.arange(2000, dtype=np.int64),
                       "v": rng.normal(size=2000)})
    got = paginate(ray.data.from_pandas(df).repartition(9),
                   ["v", "k"], offset=700, limit=25,
                   descending=[True, False]).to_pandas() \
        .sort_values(["v", "k"], ascending=[False, True],
                     ignore_index=True)
    exp = df.sort_values(["v", "k"], ascending=[False, True],
                         ignore_index=True).iloc[700:725] \
        .reset_index(drop=True)
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()


def test_paginate_page_past_end_and_empty():
    from dggrid4py_ray.stages.relational import paginate

    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    got = paginate(ray.data.from_pandas(df).repartition(3),
                   ["k"], offset=8, limit=10).to_pandas()
    assert sorted(got["k"]) == [8, 9]
    got2 = paginate(ray.data.from_pandas(df), ["k"], offset=50,
                    limit=5).to_pandas()
    assert len(got2) == 0
