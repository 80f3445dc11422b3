"""k-means (stages/cluster), grouped z-score (stages/normalize),
inverted index and blocklist filter — vs numpy/pandas references."""

import numpy as np
import pandas as pd
import pytest


def _emb_df(n=400, dim=8, k=4, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 4
    X = centers[np.arange(n) % k] + rng.normal(size=(n, dim))
    return pd.DataFrame({"vec_id": np.arange(n),
                         "embedding": list(X.astype(np.float32))})


def _lloyd_ref(X, C, iters):
    C = C.copy()
    for _ in range(iters):
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        a = np.argmax(Xn @ Cn.T, axis=1)
        for c in range(len(C)):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    return C, a


def test_kmeans_fit_matches_numpy_lloyd(ray_session):
    from dggrid4py_ray.stages.cluster import kmeans_fit

    df = _emb_df()
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    ds = ray_session.data.from_pandas(df).repartition(6)

    C, counts, it = kmeans_fit(ds, k=4, iters=5)
    refC, refA = _lloyd_ref(X, X[:4].copy(), it)
    np.testing.assert_allclose(C, refC, rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.sort(counts),
                                  np.sort(np.bincount(refA, minlength=4)))
    assert counts.sum() == len(df)


def test_kmeans_deterministic_across_partitioning(ray_session):
    from dggrid4py_ray.stages.cluster import kmeans_step

    df = _emb_df(seed=9)
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    C0 = X[:3]
    a = ray_session.data.from_pandas(df).repartition(2)
    b = ray_session.data.from_pandas(df).repartition(11)
    Ca, na = kmeans_step(a, C0)
    Cb, nb = kmeans_step(b, C0)
    np.testing.assert_allclose(Ca, Cb, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(na, nb)


def test_assign_clusters(ray_session):
    from dggrid4py_ray.stages.cluster import assign_clusters

    df = _emb_df(n=100, seed=2)
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    C = X[:5]
    ds = ray_session.data.from_pandas(df).repartition(3)
    got = (assign_clusters(ds, C).to_pandas()
           .sort_values("vec_id", ignore_index=True))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    np.testing.assert_array_equal(got["cluster"].to_numpy(),
                                  np.argmax(Xn @ Cn.T, axis=1))


def test_group_zscore(ray_session):
    from dggrid4py_ray.stages.normalize import group_zscore

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 500),
                       "x": rng.integers(10, 1000, 500).astype(np.int64)})
    df.loc[df.k == "c", "x"] = 77          # zero-variance group
    ds = ray_session.data.from_pandas(df).repartition(4)
    got = group_zscore(ds, "k", "x").to_pandas()

    st = df.groupby("k")["x"].agg(["mean", lambda s: s.std(ddof=0)])
    st.columns = ["m", "sd"]
    j = got.merge(st, left_on="k", right_index=True)
    want = np.where(j["sd"] > 0, (j["x"] - j["m"]) / j["sd"], 0.0)
    np.testing.assert_allclose(j["z"].to_numpy(), want, rtol=1e-12,
                               atol=1e-12)


def test_inverted_index(ray_session):
    from dggrid4py_ray.stages.text import inverted_index

    docs = pd.DataFrame({
        "doc_id": [0, 1, 150, 151, 320],
        "text": ["a b a", "b c", "a", "c c b", "a b"],
    })
    ds = ray_session.data.from_pandas(docs).repartition(2)
    got = (inverted_index(ds, bucket_docs=100).to_pandas()
           .sort_values(["tok", "bucket"], ignore_index=True))

    want = {("a", 0): "0", ("a", 1): "150", ("a", 3): "320",
            ("b", 0): "0,1", ("b", 1): "151", ("b", 3): "320",
            ("c", 0): "1", ("c", 1): "151"}
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(r.tok, r.bucket)] == r.postings
        assert r.df_bucket == len(r.postings.split(","))


def test_filter_not_in(ray_session):
    from dggrid4py_ray.stages.relational import filter_not_in

    df = pd.DataFrame({"s": ["x", "y", "z", "x", "w"],
                       "v": [1, 2, 3, 4, 5]})
    ds = ray_session.data.from_pandas(df).repartition(2)
    got = filter_not_in(ds, "s", ["x", "w"]).to_pandas()
    assert sorted(got["v"].tolist()) == [2, 3]
    # broadcast path
    got2 = filter_not_in(ds, "s", ["x", "w"],
                         broadcast_threshold=1).to_pandas()
    assert sorted(got2["v"].tolist()) == [2, 3]


def test_assign_clusters_with_empty_blocks(ray_session):
    """Filtered-out blocks reach the assigner as 0-row batches; the
    reshape guard must keep the job alive (review finding)."""
    from dggrid4py_ray.stages.cluster import assign_clusters

    df = _emb_df(n=60, seed=6)
    ds = ray_session.data.from_pandas(df).repartition(6).filter(
        lambda r: r["vec_id"] < 10)     # most blocks end up empty
    X = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    got = assign_clusters(ds, X[:3]).to_pandas()
    assert len(got) == 10 and got["cluster"].between(0, 2).all()
