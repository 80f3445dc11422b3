"""Round-4m operator tests: generic table profiler."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def test_profile_table_bruteforce():
    from dggrid4py_ray.stages.validate import profile_table

    rng = np.random.default_rng(37)
    n = 3000
    ints = rng.integers(-100, 10**6, n).astype(float)
    ints[rng.random(n) < 0.1] = np.nan     # nullable int column via float
    df = pd.DataFrame({
        "i": pd.array(np.where(np.isnan(ints), None, ints),
                      dtype="Int64"),
        "s": rng.choice(np.array(["aa", "zz", "mm", None], dtype=object),
                        n),
        "f": np.round(rng.uniform(0, 500, n), 2),
        "t": (np.datetime64("2024-03-01", "us")
              + rng.integers(0, 10**6, n).astype("timedelta64[s]")
              .astype("timedelta64[us]")),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = profile_table(ds, ["i", "s", "f", "t"]).to_pandas() \
        .set_index("column")

    for c in ["i", "s", "f", "t"]:
        col = df[c]
        assert out.loc[c, "n_rows"] == n
        assert out.loc[c, "n_null"] == int(col.isna().sum())
        assert out.loc[c, "n_distinct"] == col.nunique(dropna=True)
    assert out.loc["f", "min_str"] == str(df["f"].min())
    assert out.loc["f", "max_str"] == str(df["f"].max())
    assert out.loc["t", "min_str"] == str(pd.Timestamp(df["t"].min()))
    assert out.loc["s", "max_str"] == "zz"
    assert out.loc["i", "min_str"] == str(int(df["i"].min()))


def test_profile_table_all_null_column():
    from dggrid4py_ray.stages.validate import profile_table

    df = pd.DataFrame({"a": pd.array([None, None, None], dtype="Int64"),
                       "b": [1, 2, 2]})
    out = profile_table(ray.data.from_pandas(df), ["a", "b"]).to_pandas() \
        .set_index("column")
    assert out.loc["a", "n_null"] == 3
    assert out.loc["a", "n_distinct"] == 0
    assert out.loc["a", "min_str"] is None
    assert out.loc["b", "n_distinct"] == 2
