"""Regression tests for the round-4p carry-chain review fixes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def test_string_agg_empty_string_carry_across_blocks():
    """A group whose block-tail text is '' must still contribute its
    separator downstream (the old truthiness carry dropped it)."""
    from dggrid4py_ray.stages.groupagg import grouped_string_agg

    df = pd.DataFrame({"k": ["g"] * 4, "o": [1, 2, 3, 4],
                       "t": ["", "", "x", "y"]})
    for parts in [1, 2, 4]:
        out = grouped_string_agg(
            ray.data.from_pandas(df).repartition(parts), "k", "o", "t",
            sep="-").to_pandas()
        assert out.iloc[0]["text"] == "--x-y", parts


def test_string_agg_skips_null_text_like_sql():
    from dggrid4py_ray.stages.groupagg import grouped_string_agg

    df = pd.DataFrame({"k": ["a", "a", "a", "b"], "o": [1, 2, 3, 1],
                       "t": ["x", None, "z", None]})
    out = grouped_string_agg(ray.data.from_pandas(df).repartition(2),
                             "k", "o", "t", sep=",").to_pandas() \
        .set_index("k")
    assert out.loc["a", "text"] == "x,z"
    # all-null group omitted (documented deviation: SQL emits NULL)
    assert "b" not in out.index


def test_null_group_keys_raise_not_drop():
    from dggrid4py_ray.stages.groupagg import grouped_reduce
    from dggrid4py_ray.stages.window import group_row_number

    df = pd.DataFrame({"g": pd.array([1, None, 2], dtype="Int64"),
                       "v": [1, 2, 3], "id": [1, 2, 3]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="null group key"):
        grouped_reduce(ds.select_columns(["g", "v"]), "g",
                       {"v": "s"}, how="sum").to_pandas()
    with pytest.raises(Exception, match="null group keys"):
        group_row_number(ds, "g", ["v", "id"]).to_pandas()


def test_nan_group_keys_raise():
    from dggrid4py_ray.stages.window import group_running_sum

    # a REAL NaN value (not an Arrow null): build the table directly
    t = pa.table({"g": pa.array([1.0, float("nan"), 2.0]),
                  "v": pa.array([1.0, 2.0, 3.0]),
                  "id": pa.array([1, 2, 3])})
    with pytest.raises(Exception, match="NaN group keys"):
        group_running_sum(ray.data.from_arrow(t), "g", ["id"],
                          "v").to_pandas()


def test_bloom_anti_join_exactness_after_prune_dedup():
    from dggrid4py_ray.stages.bloom import bloom_anti_join

    rng = np.random.default_rng(53)
    big = pd.DataFrame({"k": rng.integers(0, 1000, 20000)})
    block = pd.DataFrame({"b": np.arange(0, 1000, 3)})
    out = bloom_anti_join(ray.data.from_pandas(big).repartition(6),
                          ray.data.from_pandas(block), "k", "b",
                          num_bits=1 << 12)    # small filter -> real FPs
    got = sorted(out.to_pandas()["k"])
    want = sorted(big[~big.k.isin(block.b)]["k"])
    assert got == want
