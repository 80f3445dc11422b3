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


def test_sessionize_scale_100k_users(ray_session):
    """VERDICT r3 #2 done-criterion: the sort+block-local sessionize must
    handle >=100k users with per-user work in vectorized numpy (only the
    <=2-per-block boundary users see a Python merge call), agree with a
    pandas oracle exactly, and emit each user exactly once."""
    import time
    from dggrid4py_ray.stages.temporal import sessionize
    rng = np.random.default_rng(3)
    n, nusers = 400_000, 120_000
    uid = rng.integers(0, nusers, n)
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 7 * 86400, n) * np.timedelta64(1_000_000, "us"))
    df = pd.DataFrame({"uid": uid, "ts": ts, "eid": np.arange(n)})
    t0 = time.time()
    out = sessionize(_ds(ray_session, df), "uid", "ts", gap_seconds=3600,
                     order_col="eid").to_pandas()
    dt = time.time() - t0
    # oracle: vectorized global sort + per-user segmented gap count
    d = df.sort_values(["uid", "ts", "eid"])
    u = d["uid"].to_numpy()
    tsv = d["ts"].to_numpy(dtype="datetime64[us]").view(np.int64)
    change = np.empty(n, dtype=bool); change[0] = True
    change[1:] = u[1:] != u[:-1]
    isgap = (np.diff(tsv) > 3600_000_000) & ~change[1:]
    seg_id = np.cumsum(change) - 1
    nseg = int(seg_id[-1]) + 1
    exp = pd.DataFrame({
        "uid": u[np.flatnonzero(change)],
        "n_events": np.diff(np.append(np.flatnonzero(change), n)),
        "n_sessions": np.bincount(seg_id[1:][isgap], minlength=nseg) + 1})
    assert len(out) == nseg == out["uid"].nunique()
    got = out.sort_values("uid").reset_index(drop=True)
    exps = exp.sort_values("uid").reset_index(drop=True)
    assert (got["uid"].to_numpy() == exps["uid"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == exps["n_events"].to_numpy()).all()
    assert (got["n_sessions"].to_numpy() == exps["n_sessions"].to_numpy()).all()
    assert dt < 240, dt   # guard vs per-group Python blowup; box has 3-8x timing noise


def test_asof_join_via_buckets_matches_broadcast(ray_session):
    """Large-large as-of (bucket cogroup + carry table) must agree row-for-
    row with the broadcast as-of on the same marker set — including events
    whose bucket holds no marker (carry-in) and events before all markers
    (dropped / -1)."""
    from dggrid4py_ray.stages.temporal import (asof_join_broadcast,
                                               asof_join_via_buckets)
    import ray.data
    df = _events(n=6000, seed=31)
    # markers clustered in a few hours so many daily buckets are empty ->
    # carry-table path exercised; first marker after some events -> drops
    markers = [(k, np.datetime64("2024-01-03T06:00:00", "us")
                + np.timedelta64(int(k * 19 + k * k), "h")) for k in range(12)]
    ds = _ds(ray_session, df)
    bc = asof_join_broadcast(ds, markers, "ts").to_pandas()
    mtbl = pa.table({
        "marker_id": pa.array([m[0] for m in markers], type=pa.int64()),
        "ts": pa.array([m[1] for m in markers],
                       type=pa.timestamp("us"))})
    bk = asof_join_via_buckets(ds, ray.data.from_arrow(mtbl).repartition(2),
                               "ts", bucket_seconds=86400.0).to_pandas()
    a = bc.sort_values("eid").reset_index(drop=True)
    b = bk.sort_values("eid").reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["eid"].to_numpy() == b["eid"].to_numpy()).all()
    assert (a["marker_id"].to_numpy() == b["marker_id"].to_numpy()).all()
    assert list(b.dtypes[["uid", "eid"]]) == [np.int64, np.int64]


def test_funnel_stages_hand_case(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from dggrid4py_ray.stages.temporal import funnel_stages

    T = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(3600_000_000, "us")
    rows = [
        # u1: full funnel inside window
        (1, T + 0 * H, "view"), (1, T + 1 * H, "click"), (1, T + 2 * H, "purchase"),
        # u2: click too late (window 2h)
        (2, T + 0 * H, "view"), (2, T + 5 * H, "click"),
        # u3: purchase BEFORE click -> stage 2
        (3, T + 0 * H, "view"), (3, T + 1 * H, "purchase"), (3, T + 2 * H, "click"),
        # u4: never viewed -> absent
        (4, T + 0 * H, "click"), (4, T + 1 * H, "purchase"),
        # u5: click at exactly anchor ts (not strictly after) -> stage 1
        (5, T + 0 * H, "view"), (5, T + 0 * H, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ds = ray.data.from_pandas(df).repartition(4)
    out = funnel_stages(ds, ["view", "click", "purchase"],
                        window_us=2 * 3600 * 1_000_000) \
        .to_pandas().sort_values("user_id", ignore_index=True)
    assert list(out["user_id"]) == [1, 2, 3, 5]
    assert list(out["stage"]) == [3, 1, 2, 1]


def test_cohort_retention_hand_case(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from dggrid4py_ray.stages.temporal import cohort_retention

    D = np.timedelta64(86_400_000_000, "us")
    T = np.datetime64("2024-03-10T08:00:00", "us")
    rows = [
        (1, T), (1, T + D), (1, T + D),          # same day dup deduped
        (2, T), (2, T + 2 * D),
        (3, T + D),                               # later cohort
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = cohort_retention(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values(["d0", "day_offset"], ignore_index=True)
    got = [(str(r.d0), int(r.day_offset), int(r.active_users))
           for r in out.itertuples()]
    assert got == [("2024-03-10", 0, 2), ("2024-03-10", 1, 1),
                   ("2024-03-10", 2, 1), ("2024-03-11", 0, 1)]


def test_funnel_stages_empty_step_returns_partial(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from dggrid4py_ray.stages.temporal import funnel_stages

    T = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(3600_000_000, "us")
    # views exist, but no click ever -> step 2 and 3 are empty
    df = pd.DataFrame([(1, T, "view"), (2, T + H, "view")],
                      columns=["user_id", "ts", "event_type"])
    out = funnel_stages(ray.data.from_pandas(df),
                        ["view", "click", "purchase"]) \
        .to_pandas().sort_values("user_id", ignore_index=True)
    assert list(out["user_id"]) == [1, 2]
    assert list(out["stage"]) == [1, 1]
    # and a funnel nobody enters -> empty typed result
    out2 = funnel_stages(ray.data.from_pandas(df), ["purchase", "click"])
    # Ray drops schema on fully-empty datasets in to_pandas (documented
    # sandbox pitfall) — assert emptiness via the dataset itself
    assert out2.count() == 0


def test_rolling_distinct_daily_hand_case(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data
    from dggrid4py_ray.stages.temporal import rolling_distinct_daily

    D = np.timedelta64(86_400_000_000, "us")
    T = np.datetime64("2024-05-01T10:00:00", "us")
    rows = [
        (1, T), (2, T),                  # day 0: users 1,2
        (1, T + D), (1, T + D),          # day 1: user 1 (dup within day)
        (3, T + 3 * D),                  # day 3: user 3
        (1, T + 9 * D),                  # day 9: user 1 (window resets)
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = rolling_distinct_daily(ray.data.from_pandas(df).repartition(3),
                                 "ts", "user_id", window_days=3) \
        .to_pandas().sort_values("_wday", ignore_index=True)
    base = int(T.astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
    got = {int(w) - base: int(a)
           for w, a in zip(out["_wday"], out["active"])}
    # only days with actual activity are emitted: 0,1,3,9
    # day 0: {1,2}; day 1: {1,2} (window 0-1); day 3: {1,3} (days 1-3);
    # day 9: {1}
    assert got == {0: 2, 1: 2, 3: 2, 9: 1}
