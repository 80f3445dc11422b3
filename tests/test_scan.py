"""Distributed prefix scan + sequence packing (stages/scan.py)."""

import numpy as np
import pandas as pd


def test_prefix_sum_matches_serial(ray_session):
    import ray.data
    from dggrid4py_ray.stages.scan import prefix_sum

    rng = np.random.default_rng(5)
    n = 3000
    keys = rng.permutation(n)              # arrives unsorted
    vals = rng.integers(1, 100, n)
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = ray.data.from_pandas(df).repartition(7)
    out = prefix_sum(ds, "k", "v").to_pandas().sort_values("k")
    want = df.sort_values("k")["v"].cumsum().shift(fill_value=0).to_numpy()
    assert (out["prefix"].to_numpy() == want).all()


def test_pack_sequences_layout(ray_session):
    import ray.data
    from dggrid4py_ray.stages.scan import pack_sequences

    df = pd.DataFrame({"doc_id": np.arange(6),
                       "tokens": [100, 400, 50, 600, 10, 512]})
    ds = ray.data.from_pandas(df).repartition(3)
    out = pack_sequences(ds, "doc_id", "tokens", budget=512) \
        .to_pandas().sort_values("doc_id")
    # prefixes: 0, 100, 500, 550, 1150, 1160
    assert list(out["seq_id"]) == [0, 0, 0, 1, 2, 2]
    assert list(out["seq_offset"]) == [0, 100, 500, 38, 126, 136]
