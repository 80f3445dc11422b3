"""Sorted-neighborhood blocking: window law, exactly-once emission,
partition/bucket invariance."""

import numpy as np
import pandas as pd
import ray.data

from dggrid4py_ray.stages.dedup import snm_pairs


def _ref_pairs(df: pd.DataFrame, keys, id_col, window):
    srt = df.sort_values(keys + [id_col], ignore_index=True)
    rows = []
    for i in range(len(srt)):
        for j in range(i + 1, min(i + window, len(srt))):
            rows.append((srt[id_col][i], srt[id_col][j]))
    return sorted(rows)


def _got_pairs(out: pd.DataFrame):
    return sorted(zip(out["id_a"].tolist(), out["id_b"].tolist()))


def test_snm_matches_reference_quadratic():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "k": rng.integers(0, 40, 300)})
    ref = _ref_pairs(df, ["k"], "doc_id", 5)
    out = snm_pairs(ray.data.from_pandas(df).repartition(4),
                    ["k"], "doc_id", window=5, bucket_rows=64).to_pandas()
    assert _got_pairs(out) == ref
    assert len(out) == len(set(_got_pairs(out)))  # exactly once


def test_snm_invariant_under_partitioning_and_bucket_size():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                       "k": rng.integers(0, 9, 500)})
    base = None
    for parts, bucket in [(1, 1000), (7, 37), (3, 8)]:
        out = snm_pairs(ray.data.from_pandas(df).repartition(parts),
                        ["k"], "doc_id", window=8,
                        bucket_rows=bucket).to_pandas()
        got = _got_pairs(out)
        if base is None:
            base = got
        assert got == base, (parts, bucket)


def test_snm_window_2_is_adjacent_pairs_and_carries_left_key():
    df = pd.DataFrame({"doc_id": np.array([3, 1, 2], dtype=np.int64),
                       "k": np.array([10, 30, 20], dtype=np.int64)})
    out = snm_pairs(ray.data.from_pandas(df), ["k"], "doc_id",
                    window=2).to_pandas().sort_values("id_a",
                                                      ignore_index=True)
    # order by k: (3,k10) (2,k20) (1,k30) -> adjacent pairs (3,2), (2,1)
    assert _got_pairs(out) == [(2, 1), (3, 2)]
    assert out.set_index("id_a")["k_a"].to_dict() == {3: 10, 2: 20}
