"""Shared mutable dedup index (state/dedup_index.py — the raw-actor case)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dggrid4py_ray.state.dedup_index import DedupIndex, streaming_dedup


def test_streaming_dedup_exactly_once(ray_session):
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 700, 20000)          # heavy duplication
    df = pd.DataFrame({"k": keys.astype(str), "row": np.arange(20000)})
    ds = ray.data.from_pandas(df).repartition(11)
    out, idx = streaming_dedup(ds, "k", n_shards=4)
    got = out.to_pandas()
    # admitted key set == distinct key set, each exactly once
    assert sorted(got["k"].tolist()) == sorted(set(df["k"])) \
        and got["k"].is_unique
    assert idx.size() == df["k"].nunique()


def test_streaming_dedup_index_outlives_dataset(ray_session):
    df1 = pd.DataFrame({"k": ["a", "b", "c", "a"]})
    df2 = pd.DataFrame({"k": ["b", "c", "d"]})
    out1, idx = streaming_dedup(ray.data.from_pandas(df1), "k")
    assert sorted(out1.to_pandas()["k"]) == ["a", "b", "c"]
    # second stream through the SAME index: only the new key survives
    out2, _ = streaming_dedup(ray.data.from_pandas(df2), "k", index=idx)
    assert sorted(out2.to_pandas()["k"]) == ["d"]
    assert idx.size() == 4
