"""Round-4l operator tests: per-group OLS sufficient statistics,
Spearman rank correlation, sliding-window document chunking."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


# -------------------------------------------------------- group_linear_fit

def test_group_linear_fit_bruteforce():
    from dggrid4py_ray.stages.linalg import group_linear_fit

    rng = np.random.default_rng(23)
    n = 4000
    g = rng.choice(np.array(["a", "b", "c"]), n)
    x = rng.integers(0, 10**6, n)
    y = rng.integers(-500, 50000, n)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"g": g, "x": x, "y": y})).repartition(7)
    got = group_linear_fit(ds, "g", "x", "y").to_pandas() \
        .set_index("g").sort_index()

    df = pd.DataFrame({"g": g, "x": x, "y": y})
    want = df.groupby("g").apply(lambda d: pd.Series({
        "n": len(d), "sum_x": d.x.sum(), "sum_y": d.y.sum(),
        "sum_xx": (d.x * d.x).sum(), "sum_xy": (d.x * d.y).sum()}),
        include_groups=False)
    for col in ["n", "sum_x", "sum_y", "sum_xx", "sum_xy"]:
        np.testing.assert_array_equal(got[col].to_numpy(),
                                      want[col].to_numpy(), err_msg=col)


def test_group_linear_fit_slope_recovery():
    """Statistics recover a planted slope exactly on noise-free data."""
    from dggrid4py_ray.stages.linalg import group_linear_fit

    x = np.arange(100, dtype=np.int64)
    y = 7 * x + 13
    ds = ray.data.from_pandas(pd.DataFrame(
        {"g": ["z"] * 100, "x": x, "y": y})).repartition(3)
    r = group_linear_fit(ds, "g", "x", "y").to_pandas().iloc[0]
    slope = (r.n * r.sum_xy - r.sum_x * r.sum_y) / \
        (r.n * r.sum_xx - r.sum_x ** 2)
    intercept = (r.sum_y - slope * r.sum_x) / r.n
    assert slope == 7.0 and intercept == 13.0


# ---------------------------------------------------------- group_spearman

def test_group_spearman_bruteforce():
    from dggrid4py_ray.stages.linalg import group_spearman

    rng = np.random.default_rng(29)
    n = 3000
    g = rng.choice(np.array(["p", "q"]), n)
    x = rng.integers(0, 50, n)          # heavy ties
    y = rng.integers(0, 40, n)
    df = pd.DataFrame({"id": np.arange(n), "g": g, "x": x, "y": y})
    ds = ray.data.from_pandas(df).repartition(6)
    got = group_spearman(ds, "g", "x", "y", "id").to_pandas() \
        .set_index("g").sort_index()

    for gg, d in df.groupby("g"):
        rx = d.sort_values(["x", "id"]).assign(r=np.arange(1, len(d) + 1)) \
            .sort_index()["r"].to_numpy()
        ry = d.sort_values(["y", "id"]).assign(r=np.arange(1, len(d) + 1)) \
            .sort_index()["r"].to_numpy()
        assert got.loc[gg, "n"] == len(d)
        assert got.loc[gg, "sum_d2"] == int(((rx - ry) ** 2).sum())


def test_group_spearman_perfect_monotone():
    """rho = 1 (sum_d2 = 0) on a perfectly monotone pair, and the exact
    maximal sum_d2 = n(n^2-1)/3 (rho = -1) on a reversed pair."""
    from dggrid4py_ray.stages.linalg import group_spearman

    n = 200
    x = np.arange(n)
    df = pd.DataFrame({"id": np.arange(n), "g": "m", "x": x, "y": x * 3})
    up = group_spearman(ray.data.from_pandas(df).repartition(4),
                        "g", "x", "y", "id").to_pandas().iloc[0]
    assert up.sum_d2 == 0

    df["y"] = -df["x"]
    dn = group_spearman(ray.data.from_pandas(df).repartition(4),
                        "g", "x", "y", "id").to_pandas().iloc[0]
    assert dn.sum_d2 == n * (n * n - 1) // 3


# --------------------------------------------------------- chunk_documents

def test_chunk_documents_bruteforce_unicode():
    from dggrid4py_ray.stages.text import chunk_documents

    rng = np.random.default_rng(31)
    alphabet = list("abcde fghij klmno ü é 漢字 ")
    texts = ["".join(rng.choice(alphabet, rng.integers(0, 300)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120), "text": texts})
    ds = ray.data.from_pandas(df).repartition(5)
    got = chunk_documents(ds, "text", "doc_id", size=50, overlap=10) \
        .to_pandas().sort_values(["doc_id", "chunk_id"],
                                 ignore_index=True)

    rows = []
    stride = 40
    for did, txt in zip(df.doc_id, df.text):
        ln = len(txt)
        nc = 1 if ln <= 50 else -((ln - 50) // -stride) + 1
        for i in range(nc):
            rows.append((did, i, i * stride, txt[i * stride:i * stride + 50]))
    want = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "start",
                                       "chunk_text"])
    assert len(got) == len(want)
    for col in want.columns:
        np.testing.assert_array_equal(got[col].to_numpy(),
                                      want[col].to_numpy(), err_msg=col)


def test_chunk_documents_boundaries():
    """Exact-multiple lengths, empty text, len == size: chunk-count law."""
    from dggrid4py_ray.stages.text import chunk_documents

    texts = ["", "x" * 50, "x" * 51, "x" * 90, "x" * 91]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(5), "text": texts}))
    got = chunk_documents(ds, "text", "doc_id", size=50, overlap=10) \
        .to_pandas()
    counts = got.groupby("doc_id").size()
    assert counts.tolist() == [1, 1, 2, 2, 3]   # stride 40
    # tail chunks are short, never empty beyond the lone empty-doc chunk
    assert (got[got.doc_id == 2].chunk_text.str.len() == [50, 11]).all()

    with pytest.raises(ValueError):
        chunk_documents(ds, "text", "doc_id", size=10, overlap=10)
