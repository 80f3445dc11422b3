"""stages/search: reciprocal-rank fusion + hard-negative mining."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rrf_pandas(df, id_col, score_cols, rrf_k, top_n):
    out = df[[id_col]].copy()
    score = np.zeros(len(df))
    for c in score_cols:
        r = df.sort_values([c, id_col], ascending=[False, True])
        rank = pd.Series(np.arange(1, len(df) + 1), index=r.index)
        out[f"rank_{c}"] = rank.sort_index().values
        score = score + 1.0 / (rrf_k + out[f"rank_{c}"].values)
    out["rrf_score"] = score
    out = out.sort_values(["rrf_score", id_col],
                          ascending=[False, True]).head(top_n)
    return out.reset_index(drop=True)


@pytest.mark.parametrize("blocks", [1, 7])
def test_rrf_matches_pandas_at_any_block_count(ray_session, blocks):
    import ray.data
    from dggrid4py_ray.stages.search import rrf_fuse

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "a": rng.integers(0, 50, n),          # heavy ties
        "b": rng.integers(0, 10_000, n)})
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = rrf_fuse(ds, "doc_id", ["a", "b"], rrf_k=60, top_n=25) \
        .to_pandas()
    want = _rrf_pandas(df, "doc_id", ["a", "b"], 60, 25)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rank_a"].tolist() == want["rank_a"].tolist()
    assert got["rank_b"].tolist() == want["rank_b"].tolist()
    np.testing.assert_array_equal(got["rrf_score"].values,
                                  want["rrf_score"].values)
    assert got["rank"].tolist() == list(range(1, 26))


def test_hard_negatives_excludes_same_label_and_self(ray_session):
    import ray.data
    from dggrid4py_ray.stages.search import hard_negatives

    rng = np.random.default_rng(11)
    n, d = 400, 8
    X = rng.normal(size=(n, d))
    labels = rng.integers(0, 3, n)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(X.astype(np.float32))),
        "label": pa.array(labels.astype(np.int32))})
    ds = ray.data.from_arrow(tbl).repartition(5)
    Q, qlab = X[:3], labels[:3]
    got = hard_negatives(ds, Q, qlab, k=4).to_pandas()

    # exact reference: mask same-label, top-4 by (cosine desc, id asc);
    # the corpus is STORED float32, so the reference must read it back
    # at the same precision
    X32 = X.astype(np.float32).astype(np.float64)
    for qi in range(3):
        cos = (X32 @ Q[qi]) / (np.linalg.norm(X32, axis=1)
                               * np.linalg.norm(Q[qi]))
        ok = labels != qlab[qi]
        ids = np.arange(n)[ok]
        c = cos[ok]
        order = np.lexsort((ids, -c))[:4]
        want_ids = ids[order].tolist()
        g = got[got["query_idx"] == qi].sort_values("rank")
        assert g["vec_id"].tolist() == want_ids
        # the query row itself shares its own label -> never returned
        assert qi not in g["vec_id"].tolist() or labels[qi] != qlab[qi]
        np.testing.assert_allclose(g["cosine"].values, c[order],
                                   rtol=0, atol=1e-12)


def test_hard_negatives_all_same_label_is_empty(ray_session):
    import ray.data
    from dggrid4py_ray.stages.search import hard_negatives

    X = np.eye(4)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array(list(X.astype(np.float32))),
        "label": pa.array(np.zeros(4, np.int32))})
    ds = ray.data.from_arrow(tbl)
    got = hard_negatives(ds, X[:1], [0], k=3)
    assert got.num_rows == 0


def test_hard_negatives_cosine_tie_breaks_by_smallest_id(ray_session):
    import ray.data
    from dggrid4py_ray.stages.search import hard_negatives

    # three identical vectors (all cosine 1.0 to the query) with ids
    # 5, 3, 1 in one batch, k=2: the cut must keep ids [1, 3]
    v = np.array([1.0, 0.0, 0.0, 0.0])
    X = np.stack([v, v, v, [0.0, 1.0, 0.0, 0.0]])
    tbl = pa.table({
        "vec_id": pa.array(np.array([5, 3, 1, 7], np.int64)),
        "embedding": pa.array(list(X.astype(np.float32))),
        "label": pa.array(np.array([1, 1, 1, 1], np.int32))})
    ds = ray.data.from_arrow(tbl)
    got = hard_negatives(ds, v[None, :], [0], k=2).to_pandas()
    assert got["vec_id"].tolist() == [1, 3]
