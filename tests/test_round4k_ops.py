"""Round-4k operator tests: cross-group quantile normalization, Benford
leading-digit audit, FK referential audit, minimum-gap debounce."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


# ------------------------------------------------------ quantile_normalize

def test_quantile_normalize_bruteforce_unequal_groups():
    from dggrid4py_ray.stages.normalize import quantile_normalize

    rng = np.random.default_rng(13)
    sizes = {"a": 500, "b": 350, "c": 801}
    rows = []
    i = 0
    for g, n in sizes.items():
        for v in rng.integers(0, 40, n):     # heavy ties
            rows.append((i, g, int(v)))
            i += 1
    df = pd.DataFrame(rows, columns=["id", "g", "v"])
    ds = ray.data.from_pandas(df).repartition(7)
    got = quantile_normalize(ds, "g", "v", "id").to_pandas() \
        .sort_values("id", ignore_index=True)

    want = df.sort_values(["g", "v", "id"])
    want["rank"] = want.groupby("g").cumcount() + 1
    m = want.groupby("rank")["v"].agg(rank_sum="sum", rank_n="size")
    want = want.join(m, on="rank").sort_values("id", ignore_index=True)
    for col in ["rank", "rank_sum", "rank_n"]:
        np.testing.assert_array_equal(got[col].to_numpy(),
                                      want[col].to_numpy(), err_msg=col)


# ---------------------------------------------------------- benford_counts

def test_benford_counts_bruteforce():
    from dggrid4py_ray.stages.validate import benford_counts

    rng = np.random.default_rng(17)
    g = rng.choice(np.array(["x", "y"]), 4000)
    v = rng.integers(-50, 10 ** 9, 4000)     # negatives + zeros excluded
    ds = ray.data.from_pandas(pd.DataFrame({"g": g, "v": v})).repartition(5)
    got = benford_counts(ds, "g", "v").to_pandas() \
        .set_index(["g", "digit"])["n"]

    keep = v > 0
    digits = np.array([int(str(x)[0]) for x in v[keep]])
    want = pd.DataFrame({"g": g[keep], "d": digits}) \
        .groupby(["g", "d"]).size()
    assert got.sum() == keep.sum()
    for (gg, d), n in want.items():
        assert got[(gg, d)] == n, (gg, d)


# ------------------------------------------------------- referential_audit

def test_referential_audit_planted_orphans():
    from dggrid4py_ray.stages.validate import referential_audit

    child = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 2, 3, 99, 99, 100]}))
    parent = ray.data.from_pandas(pd.DataFrame({"p": [1, 2, 3, 4]}))
    out = referential_audit(child, "k", parent, "p", "t").to_pandas()
    assert out.iloc[0]["n_rows"] == 7
    assert out.iloc[0]["n_orphans"] == 3       # 99, 99, 100
    assert out.iloc[0]["n_orphan_keys"] == 2   # {99, 100}


def test_referential_audit_clean_relation():
    from dggrid4py_ray.stages.validate import referential_audit

    child = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
    parent = ray.data.from_pandas(pd.DataFrame({"p": [1, 2, 3, 4]}))
    out = referential_audit(child, "k", parent, "p", "t").to_pandas()
    assert out.iloc[0]["n_orphans"] == 0
    assert out.iloc[0]["n_orphan_keys"] == 0


# -------------------------------------------------------- debounce_events

def test_debounce_events_bruteforce():
    from dggrid4py_ray.stages.temporal import debounce_events

    rng = np.random.default_rng(19)
    n = 2500
    users = rng.integers(0, 30, n)
    secs = rng.integers(0, 2000, n)
    ts = (np.datetime64("2024-05-01", "us")
          + secs.astype("timedelta64[s]").astype("timedelta64[us]"))
    df = pd.DataFrame({"id": np.arange(n), "user_id": users, "ts": ts})
    ds = ray.data.from_pandas(df).repartition(8)
    got = set(debounce_events(ds, "user_id", "ts", "id", 30)
              .to_pandas()["id"])

    srt = df.sort_values(["user_id", "ts", "id"])
    prev = srt.groupby("user_id")["ts"].shift(1)
    keep = prev.isna() | ((srt["ts"] - prev)
                          > pd.Timedelta(seconds=30))
    want = set(srt.loc[keep, "id"])
    assert got == want
