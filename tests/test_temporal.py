"""sliding_window_daily / sessionize / asof_join_broadcast
(stages/temporal.py) vs in-memory pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(n=4000, seed=9):
    rng = np.random.default_rng(seed)
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 30 * 86400, n) * np.timedelta64(1_000_000, "us"))
    return pd.DataFrame({"ts": ts, "key": rng.integers(0, 3, n).astype(str),
                         "v": rng.uniform(0, 10, n),
                         "uid": rng.integers(0, 40, n),
                         "eid": np.arange(n)})


def _ds(ray_session, df):
    import ray.data
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)


def test_sliding_window_daily(ray_session):
    from dggrid4py_ray.stages.temporal import sliding_window_daily
    df = _events()
    t = sliding_window_daily(_ds(ray_session, df), "ts", "key", "v",
                             window_days=7).to_pandas()
    # oracle: daily agg + trailing 7-day sum
    d = df.copy()
    d["day"] = d["ts"].to_numpy(dtype="datetime64[us]").astype("datetime64[D]")
    daily = d.groupby(["key", "day"]).agg(n=("v", "size"),
                                          s=("v", "sum")).reset_index()
    for _, row in t.sample(frac=0.3, random_state=0).iterrows():
        day = np.datetime64(row["day"], "D")
        sub = daily[(daily["key"] == row["key"])
                    & (daily["day"] > day - 7) & (daily["day"] <= day)]
        assert row["n_window"] == sub["n"].sum()
        assert abs(row["sum_window"] - sub["s"].sum()) < 1e-9


def test_sessionize(ray_session):
    from dggrid4py_ray.stages.temporal import sessionize
    df = _events(1500)
    out = sessionize(_ds(ray_session, df), "uid", "ts", gap_seconds=3600.0,
                     order_col="eid").to_pandas().set_index("uid")
    for uid, sub in df.groupby("uid"):
        ts = np.sort(sub["ts"].to_numpy(dtype="datetime64[us]"))
        gaps = np.diff(ts) > np.timedelta64(3600 * 1_000_000, "us")
        assert out.loc[uid, "n_sessions"] == gaps.sum() + 1
        assert out.loc[uid, "n_events"] == len(sub)


def test_asof_join_broadcast(ray_session):
    from dggrid4py_ray.stages.temporal import asof_join_broadcast
    df = _events(2000)
    markers = [(k, np.datetime64("2024-01-01") + np.timedelta64(7 * k, "D"))
               for k in range(5)]
    out = asof_join_broadcast(_ds(ray_session, df), markers, "ts").to_pandas()
    assert len(out) == len(df)   # all events at/after the first marker
    mts = np.array([m[1] for m in markers], dtype="datetime64[us]")
    expect = (np.searchsorted(mts, df.sort_values("eid")["ts"]
                              .to_numpy(dtype="datetime64[us]"), side="right") - 1)
    got = out.sort_values("eid")["marker_id"].to_numpy()
    assert (got == expect).all()
