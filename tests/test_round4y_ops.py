"""Round-4y primitives: group_interp_linear (packed-lane gap fill),
group_cume_counts (CUME_DIST numerator), target_encode_loo — each vs a
pandas/DuckDB twin, with multi-block carry-chain spans."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _interp_ref(df):
    """Pandas reference: per-group linear interp, LOCF tail, null head."""
    out = []
    for g, sub in df.groupby("g"):
        sub = sub.sort_values("o").reset_index(drop=True)
        v = sub["v"].astype(float)
        interp = v.interpolate(method="index", limit_area="inside")
        interp = interp.ffill()  # LOCF tail; head stays NaN
        # pandas interpolate uses positional index; redo on the order axis
        s = pd.Series(v.to_numpy(), index=sub["o"].to_numpy())
        li = s.interpolate(method="index", limit_area="inside").ffill()
        sub["want"] = li.to_numpy()
        out.append(sub)
    return pd.concat(out, ignore_index=True)


def test_interp_linear_vs_pandas(ray_session):
    from dggrid4py_ray.stages.window import group_interp_linear

    rng = np.random.default_rng(7)
    rows = []
    for g in range(40):
        days = np.arange(rng.integers(5, 60))
        vals = rng.integers(-500, 500, len(days)).astype(float)
        miss = rng.random(len(days)) < 0.55
        vals[miss] = np.nan
        for o, v in zip(days, vals):
            rows.append((g, int(o), None if np.isnan(v) else int(v)))
    df = pd.DataFrame(rows, columns=["g", "o", "v"])
    ds = ray_session.data.from_pandas(df).repartition(7)
    got = (group_interp_linear(ds, "g", "o", "v", out_col="interp")
           .to_pandas().sort_values(["g", "o"], ignore_index=True))
    want = _interp_ref(df).sort_values(["g", "o"], ignore_index=True)
    np.testing.assert_allclose(got["interp"].to_numpy(dtype=float),
                               want["want"].to_numpy(dtype=float),
                               rtol=0, atol=1e-9)


def test_interp_linear_one_giant_group(ray_session):
    """A group spanning every block exercises both fill carry chains."""
    from dggrid4py_ray.stages.window import group_interp_linear

    n = 4000
    o = np.arange(n)
    v = np.where(o % 10 == 0, o * 3, np.nan).astype(float)
    df = pd.DataFrame({"g": np.zeros(n, np.int64), "o": o,
                       "v": pd.array(np.where(np.isnan(v), None, v),
                                     dtype="Int64")})
    ds = ray_session.data.from_pandas(df).repartition(13)
    got = (group_interp_linear(ds, "g", "o", "v").to_pandas()
           .sort_values("o", ignore_index=True))
    # exact line: every point sits on 3*o except the LOCF tail (none here:
    # last observed o = 3990 -> tail 3991..3999 carries 11970)
    want = np.where(o <= 3990, 3.0 * o, 3.0 * 3990)
    np.testing.assert_allclose(got["interp"].to_numpy(dtype=float), want)


def test_interp_linear_guards(ray_session):
    from dggrid4py_ray.stages.window import group_interp_linear

    df = pd.DataFrame({"g": [1], "o": [1 << 21], "v": [1]})
    ds = ray_session.data.from_pandas(df)
    with pytest.raises(Exception, match="order values"):
        group_interp_linear(ds, "g", "o", "v").to_pandas()
    df2 = pd.DataFrame({"g": [1], "o": [0], "v": [1 << 33]})
    with pytest.raises(Exception, match="value"):
        group_interp_linear(ray_session.data.from_pandas(df2),
                            "g", "o", "v").to_pandas()


def test_cume_counts_vs_duckdb(ray_session):
    from dggrid4py_ray.stages.window import group_cume_counts

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 3000),
                       "v": rng.integers(0, 40, 3000),
                       "rid": np.arange(3000)})
    ds = ray_session.data.from_pandas(df).repartition(9)
    got = (group_cume_counts(ds, "g", "v", out_col="cume")
           .to_pandas().sort_values("rid", ignore_index=True))
    want = duckdb.sql("""
        SELECT rid, COUNT(*) OVER (PARTITION BY g ORDER BY v
                                   RANGE UNBOUNDED PRECEDING) AS cume
        FROM df ORDER BY rid""").fetchdf()
    np.testing.assert_array_equal(got["cume"].to_numpy(),
                                  want["cume"].to_numpy())


def test_cume_counts_null_refused(ray_session):
    from dggrid4py_ray.stages.window import group_cume_counts

    df = pd.DataFrame({"g": ["a", "a"], "v": pd.array([1, None],
                                                      dtype="Int64")})
    with pytest.raises(Exception, match="null values"):
        group_cume_counts(ray_session.data.from_pandas(df),
                          "g", "v").to_pandas()


def test_target_encode_loo_vs_duckdb(ray_session):
    from dggrid4py_ray.stages.normalize import target_encode_loo

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"cat": rng.choice(["x", "y", "z", "solo"],
                                         p=[.4, .4, .1995, .0005],
                                         size=2000),
                       "t": rng.integers(-100, 100, 2000),
                       "rid": np.arange(2000)})
    ds = ray_session.data.from_pandas(df).repartition(6)
    got = (target_encode_loo(ds, "cat", "t").to_pandas()
           .sort_values("rid", ignore_index=True))
    want = duckdb.sql("""
        SELECT rid, SUM(t) OVER (PARTITION BY cat) - t AS num,
               COUNT(*) OVER (PARTITION BY cat) - 1 AS den
        FROM df ORDER BY rid""").fetchdf()
    np.testing.assert_array_equal(got["loo_num"].to_numpy(),
                                  want["num"].to_numpy(dtype=np.int64))
    np.testing.assert_array_equal(got["loo_den"].to_numpy(),
                                  want["den"].to_numpy(dtype=np.int64))
