"""Interval-overlap join and blocked edit-distance join tests."""

import numpy as np
import pandas as pd
import ray.data

from dggrid4py_ray.stages.relational import interval_overlap_join
from dggrid4py_ray.stages.text import blocked_edit_join, levenshtein


def _brute_overlap(l, r):
    out = []
    for _, a in l.iterrows():
        for _, b in r.iterrows():
            if a["ls"] <= b["re"] and b["rs"] <= a["le"]:
                out.append((a["lid"], b["rid"]))
    return sorted(out)


def test_overlap_join_matches_bruteforce_exactly_once():
    rng = np.random.default_rng(5)
    nl, nr = 300, 250
    ls = rng.integers(0, 100000, nl)
    rs = rng.integers(0, 100000, nr)
    l = pd.DataFrame({"lid": np.arange(nl, dtype=np.int64), "ls": ls,
                      "le": ls + rng.integers(0, 5000, nl)})
    r = pd.DataFrame({"rid": np.arange(nr, dtype=np.int64), "rs": rs,
                      "re": rs + rng.integers(0, 5000, nr)})
    got = interval_overlap_join(
        ray.data.from_pandas(l).repartition(5),
        ray.data.from_pandas(r).repartition(4),
        l_start="ls", l_end="le", r_start="rs", r_end="re",
        bucket_width=1700).to_pandas()
    pairs = sorted(zip(got["lid"], got["rid"]))
    assert len(pairs) == len(set(pairs))          # exactly once
    assert pairs == _brute_overlap(l, r)


def test_overlap_join_fat_interval_and_defaults():
    # one interval covering everything must match every right row once
    l = pd.DataFrame({"lid": np.array([0], dtype=np.int64),
                      "ls": np.array([0], dtype=np.int64),
                      "le": np.array([10**9], dtype=np.int64)})
    r = pd.DataFrame({"rid": np.arange(50, dtype=np.int64),
                      "rs": np.arange(50, dtype=np.int64) * 10**7,
                      "re": np.arange(50, dtype=np.int64) * 10**7 + 5})
    got = interval_overlap_join(ray.data.from_pandas(l),
                                ray.data.from_pandas(r),
                                l_start="ls", l_end="le",
                                r_start="rs", r_end="re").to_pandas()
    assert sorted(got["rid"]) == list(range(50))


def test_levenshtein_basics_and_blocked_join():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2

    df = pd.DataFrame({
        "bk": ["x", "x", "x", "y", "y", "z"],
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["hello world", "hello wurld", "goodbye",
                 "alpha beta", "alpha bXta", "lonely"]})
    got = blocked_edit_join(ray.data.from_pandas(df), "bk",
                            max_dist=3).to_pandas() \
        .sort_values(["id_a", "id_b"], ignore_index=True)
    assert list(zip(got["id_a"], got["id_b"], got["dist"])) == [
        (0, 1, 1), (3, 4, 1)]


def test_blocked_join_max_block_cap():
    # oversize block truncated to its max_block smallest ids
    df = pd.DataFrame({"bk": ["h"] * 10,
                       "doc_id": np.arange(10, dtype=np.int64),
                       "text": ["same"] * 10})
    got = blocked_edit_join(ray.data.from_pandas(df), "bk",
                            max_dist=0, max_block=4).to_pandas()
    assert len(got) == 6                      # C(4,2)
    assert got["id_b"].max() == 3
