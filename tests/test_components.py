"""Connected components (alternating star) vs a union-find ground truth."""

import numpy as np
import pandas as pd
import pytest

from dggrid4py_ray.stages.components import connected_components, keep_canonical


def _uf_clusters(edges):
    """Union-find ground truth: {node: min-id of its component}."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _run(ray_session, edges, **kw):
    import ray.data
    df = pd.DataFrame(edges, columns=["left_id", "right_id"])
    ds = ray.data.from_pandas(df).repartition(5)
    out = connected_components(ds, **kw).to_pandas()
    if out.empty:            # Ray's to_pandas drops columns on empty data
        return {}
    return dict(zip(out["doc_id"], out["cluster_id"]))


def test_cc_random_graphs_match_union_find(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = int(rng.integers(20, 120))
        m = int(rng.integers(5, 4 * n))
        edges = [tuple(map(int, rng.integers(0, n, 2))) for _ in range(m)]
        got = _run(ray_session, edges)
        want = _uf_clusters([(u, v) for u, v in edges if u != v])
        assert got == want, f"trial {trial}"


def test_cc_long_chain_converges_logarithmically(ray_session):
    # 400-hop path: diameter-dependent propagation would need 400 rounds;
    # the star alternation must finish inside the O(log^2 n) budget
    edges = [(i, i + 1) for i in range(400)]
    got = _run(ray_session, edges, max_iters=25)
    assert len(got) == 401 and set(got.values()) == {0}


def test_cc_noise_robust(ray_session):
    # self-loops, duplicate and bidirectional edges
    edges = [(3, 3), (1, 2), (2, 1), (1, 2), (8, 9)]
    got = _run(ray_session, edges)
    assert got == {1: 1, 2: 1, 8: 8, 9: 8}


def test_cc_string_ids(ray_session):
    edges = [("b", "c"), ("a", "b"), ("x", "y")]
    got = _run(ray_session, edges)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_keep_canonical_anti_join(ray_session):
    import ray.data
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5], "text": list("abcde")}))
    pairs = ray.data.from_pandas(pd.DataFrame(
        {"left_id": [1, 2], "right_id": [2, 3]}))
    assign = connected_components(pairs)
    kept = keep_canonical(docs, assign).to_pandas()
    # cluster {1,2,3} keeps 1; 4 and 5 are singletons (absent from pairs)
    assert sorted(kept["doc_id"]) == [1, 4, 5]


def test_cc_empty_and_selfloop_only(ray_session):
    import ray.data
    # self-loops only -> zero real edges -> empty assignment
    got = _run(ray_session, [(4, 4), (9, 9)])
    assert got == {}
