"""Round-4j operator tests: per-group Gini (distinct-value rank-sum fold),
longest consecutive-day streaks, windowed event co-occurrence via the
composite-key bucketed range join, and BPE adjacent-pair counts."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


# ------------------------------------------------------------- group_gini

def _gini_pair(vals: np.ndarray):
    x = np.sort(vals.astype(np.int64))
    n = len(x)
    i = np.arange(1, n + 1)
    num = 2 * int((i * x).sum()) - (n + 1) * int(x.sum())
    den = n * int(x.sum())
    return num, den


def test_group_gini_matches_bruteforce_with_ties():
    from dggrid4py_ray.stages.relational import group_gini

    rng = np.random.default_rng(7)
    g = rng.integers(0, 50, 8000)
    # heavy ties: only 30 distinct values
    v = rng.integers(1, 31, 8000).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"g": g, "v": v})).repartition(9)
    got = group_gini(ds, "g", "v").to_pandas() \
        .sort_values("g", ignore_index=True)

    for _, row in got.iterrows():
        num, den = _gini_pair(v[g == row["g"]])
        assert row["gini_num"] == num and row["gini_den"] == den


def test_group_gini_constant_group_is_zero():
    from dggrid4py_ray.stages.relational import group_gini

    ds = ray.data.from_pandas(pd.DataFrame(
        {"g": ["a"] * 5 + ["b"] * 3, "v": [7] * 5 + [1, 2, 3]}))
    out = group_gini(ds, "g", "v").to_pandas().set_index("g")
    # constant group: numerator 2*sum(i*7) - 6*35 = 2*105 - 210 = 0
    assert out.loc["a", "gini_num"] == 0
    assert out.loc["a", "gini_den"] == 5 * 35
    num, den = _gini_pair(np.array([1, 2, 3]))
    assert out.loc["b", "gini_num"] == num
    assert out.loc["b", "gini_den"] == den


# --------------------------------------------------------- longest_streak

def test_longest_streak_bruteforce():
    from dggrid4py_ray.stages.temporal import longest_streak

    rng = np.random.default_rng(3)
    rows = []
    want = {}
    for u in range(40):
        days = np.unique(rng.integers(0, 60, rng.integers(1, 40)))
        # brute force: longest consecutive run
        best = cur = 1
        for a, b in zip(days[:-1], days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        want[u] = best
        for d in days:
            # multiple events on the same day must not inflate streaks
            for rep in range(rng.integers(1, 3)):
                rows.append((u, np.datetime64("2024-01-01", "us")
                             + np.timedelta64(int(d) * 86_400_000_000
                                              + rep * 123_456, "us")))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    ds = ray.data.from_pandas(df).repartition(7)
    got = longest_streak(ds, "user_id", "ts").to_pandas() \
        .set_index("user_id")["max_streak"]
    for u, best in want.items():
        assert got[u] == best, u


# ----------------------------------------------------- event_cooccurrence

def test_event_cooccurrence_bruteforce_and_user_isolation():
    from dggrid4py_ray.stages.temporal import event_cooccurrence

    rng = np.random.default_rng(5)
    n = 3000
    users = rng.integers(0, 25, n)
    secs = rng.integers(0, 5000, n)
    types = rng.choice(np.array(["x", "y", "z"]), n)
    ts = (np.datetime64("2024-03-01", "us")
          + secs.astype("timedelta64[s]").astype("timedelta64[us]"))
    df = pd.DataFrame({"user_id": users, "ts": ts, "event_type": types})
    ds = ray.data.from_pandas(df).repartition(8)
    got = event_cooccurrence(ds, "user_id", "ts", "event_type",
                             window_s=60).to_pandas() \
        .set_index(["type_a", "type_b"])["n"]

    want = Counter()
    order = np.lexsort((secs, users))
    u, s, t = users[order], secs[order], types[order]
    for i in range(len(u)):
        j = i + 1
        while j < len(u) and u[j] == u[i] and s[j] <= s[i] + 60:
            if s[j] > s[i]:
                want[(t[i], t[j])] += 1
            j += 1
        # ties within a user: s[j] == s[i] rows are skipped above but later
        # rows within the window must still be counted — handled because
        # the scan continues past ties (s[j] <= s[i] + 60 keeps advancing)
    assert got.sum() == sum(want.values())
    for k, v in want.items():
        assert got[k] == v, k


def test_event_cooccurrence_guard_raises_on_huge_users():
    from dggrid4py_ray.stages.temporal import event_cooccurrence

    df = pd.DataFrame({
        "user_id": [2 ** 52, 0],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        "event_type": ["a", "b"]})
    with pytest.raises(ValueError, match="float64-exact"):
        event_cooccurrence(ray.data.from_pandas(df), "user_id", "ts",
                           "event_type", window_s=10)


# --------------------------------------------------- adjacent_pair_counts

def test_adjacent_pair_counts_bruteforce():
    from dggrid4py_ray.stages.text import adjacent_pair_counts

    rng = np.random.default_rng(9)
    vocab = np.array(["aa", "bb", "cc", "dd", "ee"])
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 12)))
            for _ in range(400)]
    docs += ["solo", "", "x y"]          # 1-token, empty, minimal pair
    ds = ray.data.from_items([{"text": d} for d in docs]).repartition(6)
    got = adjacent_pair_counts(ds).to_pandas() \
        .set_index(["tok_l", "tok_r"])["n"]

    want = Counter()
    for d in docs:
        toks = d.split(" ")
        for a, b in zip(toks[:-1], toks[1:]):
            want[(a, b)] += 1
    assert got.sum() == sum(want.values())
    for k, v in want.items():
        assert got[k] == v, k
