"""Distributed PageRank (stages/graph.py) vs a numpy reference —
multigraph edges, dangling nodes, partitioning invariance."""

import numpy as np
import pandas as pd


def _ref_pagerank(E: pd.DataFrame, iters: int, d: float = 0.85):
    nodes = np.unique(np.r_[E.u, E.v])
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    deg = E.groupby("u").size()
    r = np.full(N, 1.0 / N)
    for _ in range(iters):
        contrib = np.zeros(N)
        for (u, v), m in E.groupby(["u", "v"]).size().items():
            contrib[idx[v]] += m / deg[u] * r[idx[u]]
        r = (1 - d) / N + d * contrib
    return pd.DataFrame({"node": nodes, "rank": r})


def _run(ray, E, iters, parts):
    from dggrid4py_ray.stages.graph import pagerank

    ds = ray.data.from_pandas(E).repartition(parts)
    return (pagerank(ds, iters=iters).to_pandas()
            .sort_values("node", ignore_index=True))


def test_pagerank_random_multigraph(ray_session):
    rng = np.random.default_rng(7)
    E = pd.DataFrame({"u": rng.integers(0, 60, 500),
                      "v": rng.integers(0, 60, 500)})
    got = _run(ray_session, E, 3, 5)
    want = _ref_pagerank(E, 3).sort_values("node", ignore_index=True)
    np.testing.assert_array_equal(got["node"], want["node"])
    np.testing.assert_allclose(got["rank"], want["rank"], rtol=1e-12)


def test_pagerank_dangling_and_source_nodes(ray_session):
    # 5 -> 6 -> 7 (7 dangling, leaks mass); 9 isolated-as-source only
    E = pd.DataFrame({"u": [5, 6, 9, 9], "v": [6, 7, 5, 7]})
    got = _run(ray_session, E, 4, 2)
    want = _ref_pagerank(E, 4).sort_values("node", ignore_index=True)
    np.testing.assert_allclose(got["rank"], want["rank"], rtol=1e-12)
    assert got["rank"].sum() < 1.0          # documented simple semantics


def test_pagerank_partitioning_invariance(ray_session):
    rng = np.random.default_rng(11)
    E = pd.DataFrame({"u": rng.integers(0, 30, 300),
                      "v": rng.integers(0, 30, 300)})
    a = _run(ray_session, E, 2, 2)
    b = _run(ray_session, E, 2, 9)
    np.testing.assert_allclose(a["rank"], b["rank"], rtol=1e-13)


def test_pagerank_join_engine_matches_broadcast(ray_session):
    """The web-scale join engine and the bounded broadcast engine are the
    same recurrence — results must agree to float precision."""
    from dggrid4py_ray.stages.graph import pagerank

    rng = np.random.default_rng(19)
    E = pd.DataFrame({"u": rng.integers(0, 40, 300),
                      "v": rng.integers(0, 40, 300)})
    ds = ray_session.data.from_pandas(E).repartition(3)
    a = (pagerank(ds, iters=2, broadcast_ranks=True).to_pandas()
         .sort_values("node", ignore_index=True))
    b = (pagerank(ds, iters=2, broadcast_ranks=False).to_pandas()
         .sort_values("node", ignore_index=True))
    np.testing.assert_array_equal(a["node"], b["node"])
    np.testing.assert_allclose(a["rank"], b["rank"], rtol=1e-12)


def test_triangle_count_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from dggrid4py_ray.stages.graph import triangle_count_per_vertex

    rng = np.random.default_rng(6)
    n_v, n_e = 60, 500
    a = rng.integers(0, n_v, n_e)
    b = rng.integers(0, n_v, n_e)
    df = pd.DataFrame({"u": a, "v": b})
    ds = ray.data.from_pandas(df).repartition(7)
    out = triangle_count_per_vertex(ds).to_pandas() \
        .sort_values("vertex", ignore_index=True)
    # brute force
    E = set()
    for x, y in zip(a, b):
        if x != y:
            E.add((min(x, y), max(x, y)))
    adj = {}
    for x, y in E:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    tri = {}
    for x, y in E:
        common = adj[x] & adj[y]
        for z in common:
            t = tuple(sorted((x, y, z)))
            tri[t] = True
    exp_counts = {}
    for t in tri:
        exp_counts[t[0]] = exp_counts.get(t[0], 0) + 1
    got = dict(zip(out["vertex"], out["n_triangles"]))
    assert got == exp_counts
    # degree orientation: same TOTAL, different attribution
    out_d = triangle_count_per_vertex(ds, order="degree").to_pandas()
    assert out_d["n_triangles"].sum() == sum(exp_counts.values())
