"""group_running_max carry chain + gaps-and-islands merge_intervals."""

import numpy as np
import pandas as pd
import pytest


def _ref_islands(df):
    rows = []
    for u, g in df.groupby("u"):
        g = g.sort_values(["s", "e", "id"], ignore_index=True)
        isl, cur_s, cur_e, cnt = 0, None, None, 0
        for _, r in g.iterrows():
            if cur_e is None or r["s"] > cur_e:
                if cur_e is not None:
                    rows.append((u, isl, cur_s, cur_e, cnt))
                isl += 1
                cur_s, cur_e, cnt = r["s"], r["e"], 1
            else:
                cur_e = max(cur_e, r["e"])
                cnt += 1
        rows.append((u, isl, cur_s, cur_e, cnt))
    return sorted(rows)


@pytest.mark.parametrize("blocks", [1, 11])
def test_running_max_matches_pandas(ray_session, blocks):
    import ray.data
    from dggrid4py_ray.stages.window import group_running_max

    rng = np.random.default_rng(2)
    n = 2000
    df = pd.DataFrame({
        "g": rng.integers(0, 7, n),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = group_running_max(ds, "g", ["o"], "v", out_col="pm") \
        .to_pandas().sort_values(["g", "o"], ignore_index=True)
    want = df.sort_values(["g", "o"], ignore_index=True)
    ref = want.groupby("g")["v"].apply(
        lambda s: s.cummax().shift(1)).reset_index(drop=True)
    got_pm = got["pm"].to_numpy()
    assert np.isnan(got_pm[ref.isna().to_numpy()]).all()
    ok = ~ref.isna().to_numpy()
    np.testing.assert_array_equal(got_pm[ok], ref.to_numpy()[ok])


@pytest.mark.parametrize("blocks", [1, 9])
def test_merge_intervals_matches_reference(ray_session, blocks):
    import ray.data
    from dggrid4py_ray.stages.temporal import merge_intervals

    rng = np.random.default_rng(4)
    n = 800
    s = rng.integers(0, 5000, n).astype(np.int64)
    df = pd.DataFrame({
        "u": rng.integers(0, 10, n),
        "id": np.arange(n, dtype=np.int64),
        "s": s,
        "e": s + rng.integers(1, 80, n)})
    # plant one giant interval per user that swallows many others —
    # the carry must propagate its end across many blocks
    giant = df.groupby("u").head(1).index
    df.loc[giant, "e"] = 4000
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = merge_intervals(ds, "u", "s", "e", "id").to_pandas()
    got_t = sorted(zip(got["u"], got["island"].astype(int), got["s"],
                       got["e"], got["n_intervals"].astype(int)))
    assert got_t == _ref_islands(df)


def test_merge_intervals_touching_intervals_merge(ray_session):
    import ray.data
    from dggrid4py_ray.stages.temporal import merge_intervals

    df = pd.DataFrame({"u": [1, 1, 1], "id": [0, 1, 2],
                       "s": np.array([0, 10, 21], np.int64),
                       "e": np.array([10, 20, 30], np.int64)})
    got = merge_intervals(ray.data.from_pandas(df), "u", "s", "e", "id") \
        .to_pandas().sort_values("island", ignore_index=True)
    # [0,10] and [10,20] touch (s == pmax, not >) -> merge; 21 > 20 gaps
    assert len(got) == 2
    assert got["s"].tolist() == [0, 21] and got["e"].tolist() == [20, 30]
