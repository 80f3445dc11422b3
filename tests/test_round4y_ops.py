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


def test_global_moran_vs_bruteforce(ray_session):
    from dggrid4py_ray.stages.interp import global_moran

    rng = np.random.default_rng(5)
    pts = {(int(x), int(y)) for x, y in zip(rng.integers(0, 12, 60),
                                            rng.integers(0, 12, 60))}
    df = pd.DataFrame({"x": [p[0] for p in pts],
                       "y": [p[1] for p in pts],
                       "n": rng.integers(1, 9, len(pts))})
    got = global_moran(ray_session.data.from_pandas(df).repartition(5),
                       "x", "y", "n").to_pandas().iloc[0]
    # brute force
    xs = df[["x", "y"]].to_numpy()
    v = df["n"].to_numpy(dtype=float)
    m = v.mean()
    num = den = W = 0.0
    for i in range(len(df)):
        den += (v[i] - m) ** 2
        for k in range(len(df)):
            if i != k and max(abs(xs[i, 0] - xs[k, 0]),
                              abs(xs[i, 1] - xs[k, 1])) <= 1:
                num += (v[i] - m) * (v[k] - m)
                W += 1
    want = len(df) / W * num / den
    assert abs(got["moran_i"] - want) < 1e-9


def test_hausdorff_vs_bruteforce(ray_session):
    from dggrid4py_ray.stages.geostats import hausdorff_pairs

    def hav(a, b):
        la1, lo1 = np.radians(a[:, 1]), np.radians(a[:, 0])
        la2, lo2 = np.radians(b[:, 1]), np.radians(b[:, 0])
        s = (np.sin((la2[None] - la1[:, None]) / 2) ** 2
             + np.cos(la1)[:, None] * np.cos(la2)[None]
             * np.sin((lo2[None] - lo1[:, None]) / 2) ** 2)
        return 2 * 6371.0 * np.arcsin(np.sqrt(np.clip(s, 0, 1)))

    rng = np.random.default_rng(9)
    frames = []
    for u in range(6):
        n = rng.integers(3, 30)
        frames.append(pd.DataFrame({
            "u": u, "lon": rng.uniform(-170, 170, n),
            "lat": rng.uniform(-80, 80, n)}))
    df = pd.concat(frames, ignore_index=True)
    got = (hausdorff_pairs(ray_session.data.from_pandas(df)
                           .repartition(7), "u")
           .to_pandas().sort_values(["p1", "p2"], ignore_index=True))
    rows = []
    for a in range(6):
        for b in range(a + 1, 6):
            A = df[df.u == a][["lon", "lat"]].to_numpy()
            B = df[df.u == b][["lon", "lat"]].to_numpy()
            d = hav(A, B)
            rows.append((a, b, max(d.min(axis=1).max(),
                                   d.min(axis=0).max())))
    want = pd.DataFrame(rows, columns=["p1", "p2", "h"])
    np.testing.assert_allclose(got["hausdorff_km"].to_numpy(),
                               want["h"].to_numpy(), rtol=1e-12)


def test_hausdorff_site_guard(ray_session):
    from dggrid4py_ray.stages.geostats import hausdorff_pairs

    df = pd.DataFrame({"u": [0, 1] * 10, "lon": np.zeros(20),
                       "lat": np.zeros(20)})
    with pytest.raises(Exception, match="max_sites"):
        hausdorff_pairs(ray_session.data.from_pandas(df), "u",
                        max_sites=5).to_pandas()
