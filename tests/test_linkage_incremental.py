"""stages/linkage + stages/incremental."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ref_pairs(df, fields, threshold):
    out = []
    for _, g in df.groupby("bk"):
        g = g.sort_values("id", ignore_index=True)
        for i in range(len(g) - 1):
            for j in range(i + 1, len(g)):
                s = sum(w for f, w in fields.items()
                        if pd.notna(g[f][i]) and g[f][i] == g[f][j])
                if s >= threshold:
                    out.append((g["id"][i], g["id"][j], s))
    return sorted(out)


@pytest.mark.parametrize("blocks", [1, 6])
def test_linkage_matches_bruteforce(ray_session, blocks):
    import ray.data
    from dggrid4py_ray.stages.linkage import linkage_score_pairs

    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "bk": rng.integers(0, 12, n).astype(str),
        "a": rng.integers(0, 5, n).astype(str),
        "b": rng.integers(0, 8, n)})
    # plant nulls: null never agrees, even with another null
    df.loc[df.index % 11 == 0, "a"] = None
    fields = {"a": 2, "b": 3}
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = linkage_score_pairs(ds, "bk", "id", fields, threshold=2) \
        .to_pandas()
    got_t = sorted(zip(got["id_a"], got["id_b"], got["score"]))
    assert got_t == _ref_pairs(df, fields, 2)


def test_linkage_max_block_truncates_to_smallest_ids(ray_session):
    import ray.data
    from dggrid4py_ray.stages.linkage import linkage_score_pairs

    n = 50
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "bk": ["x"] * n,
                       "a": ["same"] * n})
    ds = ray.data.from_pandas(df)
    got = linkage_score_pairs(ds, "bk", "id", {"a": 1}, threshold=1,
                              max_block=10).to_pandas()
    assert len(got) == 45  # 10*9/2 pairs among the 10 smallest ids
    assert got["id_a"].max() <= 9 and got["id_b"].max() <= 9


def test_view_refresh_insert_and_retract(ray_session):
    import ray.data
    from dggrid4py_ray.stages.groupagg import grouped_reduce
    from dggrid4py_ray.stages.incremental import (delta_partials,
                                                  refresh_grouped_view)

    rng = np.random.default_rng(9)
    n = 5000
    fact = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "v": rng.integers(1, 100, n).astype(np.int64)})
    base, ins = fact.iloc[: n // 2], fact.iloc[n // 2:]
    # retract ALL rows of group 0 so its count reaches zero
    dels = fact[fact["k"] == 0]

    def view_of(df, blocks=4):
        ds = ray.data.from_pandas(df).repartition(blocks)
        return grouped_reduce(
            delta_partials(ds, ["k"], {"v": "sv"}),
            ["k"], {"sv": "sv", "n": "n"}, how="sum")

    v = view_of(base)
    v1 = refresh_grouped_view(
        v, ray.data.from_pandas(ins).repartition(3), ["k"], {"v": "sv"})
    v2 = refresh_grouped_view(
        v1, ray.data.from_pandas(dels).repartition(2), ["k"], {"v": "sv"},
        sign=-1)
    got = v2.to_pandas().sort_values("k", ignore_index=True)

    want = (fact[fact["k"] != 0].groupby("k")
            .agg(sv=("v", "sum"), n=("v", "size")).reset_index())
    assert got["k"].tolist() == want["k"].tolist()
    assert got["sv"].tolist() == want["sv"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert 0 not in got["k"].values  # fully-retracted group dropped


@pytest.mark.parametrize("blocks", [1, 5])
def test_token_budget_cap_matches_window_sql(ray_session, blocks):
    import hashlib

    import ray.data
    from dggrid4py_ray.stages.sampling import token_budget_cap

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.integers(0, 4, n).astype(str),
        "toks": rng.integers(1, 50, n).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = token_budget_cap(ds, "g", "id", "toks", budget=300).to_pandas()

    df["pri"] = [int.from_bytes(hashlib.md5(str(v).encode())
                                .digest()[:8], "little")
                 for v in df["id"]]
    want_ids = []
    for _, grp in df.groupby("g"):
        grp = grp.sort_values(["pri", "id"])
        keep = grp["toks"].cumsum() <= 300
        want_ids.extend(grp["id"][keep].tolist())
    assert sorted(got["id"].tolist()) == sorted(want_ids)
    # per-group totals never exceed the budget
    assert (got.groupby("g")["toks"].sum() <= 300).all()


def test_logistic_grad_descends_and_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data
    from dggrid4py_ray.stages.linalg import logistic_grad_step

    rng = np.random.default_rng(13)
    n, d = 2000, 8
    X = rng.normal(size=(n, d))
    w_true = rng.normal(size=d)
    y_lab = (X @ w_true + 0.1 * rng.normal(size=n) > 0).astype(np.int32)
    tbl = pa.table({
        "embedding": pa.array(list(X.astype(np.float32))),
        "label": pa.array((1 - y_lab).astype(np.int32))})  # label 0 = pos
    ds = ray.data.from_arrow(tbl).repartition(5)

    X32 = X.astype(np.float32).astype(np.float64)
    w = np.zeros(d)
    losses = []
    for _ in range(10):
        out = logistic_grad_step(ds, w).to_pandas()
        g = out[out["j"] >= 0].sort_values("j")["g"].to_numpy()
        loss = float(out[out["j"] == -1]["g"].iloc[0])
        # exact numpy twin on the float32-stored matrix
        p = 1.0 / (1.0 + np.exp(-(X32 @ w)))
        np.testing.assert_allclose(g, X32.T @ (p - y_lab), rtol=1e-9)
        losses.append(loss)
        w = w - 2.0 * g / len(X)
    assert losses[-1] < losses[0] * 0.9  # descent actually descends
