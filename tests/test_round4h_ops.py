"""Round-4h operator tests: exact set-similarity join (prefix filtering),
BFS shortest hops (both frontier regimes), integer value histogram and the
data-quality expectation audit."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data


# ---------------------------------------------------------------- ppjoin

def _brute_jaccard_pairs(ids, texts, tau_1e6):
    sets = {i: {w for w in t.split(" ") if w} for i, t in zip(ids, texts)}
    out = []
    ks = sorted(sets)
    for ai in range(len(ks)):
        for bi in range(ai + 1, len(ks)):
            a, b = sets[ks[ai]], sets[ks[bi]]
            sh = len(a & b)
            un = len(a | b)
            if un and 1_000_000 * sh >= tau_1e6 * un:
                out.append((ks[ai], ks[bi], sh, un))
    return sorted(out)


def _mk_docs(rng, n, vocab, lo=4, hi=14):
    texts = []
    for _ in range(n):
        k = rng.integers(lo, hi)
        texts.append(" ".join(rng.choice(vocab, k, replace=True)))
    return texts


@pytest.mark.parametrize("tau", [900_000, 700_000])
def test_set_similarity_join_matches_bruteforce(tau):
    from dggrid4py_ray.stages.dedup import set_similarity_join

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(40)])
    base = _mk_docs(rng, 60, vocab)
    texts = list(base)
    # plant near-duplicates: clones and one-word edits
    for i in range(0, 20, 2):
        texts.append(base[i])                       # exact clone
        ws = base[i].split(" ")
        ws[0] = "zz_novel"
        texts.append(" ".join(ws))                  # one-substitution
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids, "text": texts})).repartition(7)

    got = (set_similarity_join(ds, tau_1e6=tau)
           .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True))
    want = _brute_jaccard_pairs(ids, texts, tau)
    got_t = list(got.itertuples(index=False, name=None))
    assert sorted(got_t) == want


def test_set_similarity_join_parallelism_invariant():
    from dggrid4py_ray.stages.dedup import set_similarity_join

    rng = np.random.default_rng(9)
    vocab = np.array([f"t{i}" for i in range(25)])
    texts = _mk_docs(rng, 80, vocab, lo=3, hi=9)
    texts += texts[:10]  # exact dup block
    ids = np.arange(len(texts), dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    outs = []
    for nparts in (1, 13):
        ds = ray.data.from_pandas(df).repartition(nparts)
        o = (set_similarity_join(ds, tau_1e6=800_000).to_pandas()
             .sort_values(["id_a", "id_b"], ignore_index=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------------------------- bfs

def _brute_bfs(edges, sources, max_hops):
    from collections import defaultdict, deque
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    hop = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        u = dq.popleft()
        if hop[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in hop:
                hop[v] = hop[u] + 1
                dq.append(v)
    return sorted(hop.items())


def _random_graph(rng, n_nodes, n_edges):
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    return src, dst


@pytest.mark.parametrize("threshold", [2_000_000, 4])
def test_bfs_shortest_hops_matches_bruteforce(threshold):
    # threshold=4 forces the large-frontier bloom path after hop 1
    from dggrid4py_ray.stages.graph import bfs_shortest_hops

    rng = np.random.default_rng(3)
    src, dst = _random_graph(rng, 300, 900)  # cyclic, multi-component
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst)})).repartition(5)
    sources = [0, 7]
    got = (bfs_shortest_hops(edges, sources, max_hops=5,
                             broadcast_threshold=threshold)
           .to_pandas().sort_values("node", ignore_index=True))
    want = _brute_bfs(zip(src, dst), sources, 5)
    assert list(got.itertuples(index=False, name=None)) == want


def test_bfs_empty_sources_and_unreachable():
    from dggrid4py_ray.stages.graph import bfs_shortest_hops

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 2], pa.int64()),
        "dst": pa.array([2, 3], pa.int64())}))
    assert bfs_shortest_hops(edges, [], max_hops=3).count() == 0
    out = bfs_shortest_hops(edges, [99], max_hops=3).to_pandas()
    assert list(out.itertuples(index=False, name=None)) == [(99, 0)]


def test_bfs_hop_is_minimum_on_shortcut_graph():
    from dggrid4py_ray.stages.graph import bfs_shortest_hops

    # chain 0->1->2->3->4 plus shortcut 0->4: hop(4) must be 1
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 3, 0], pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 4], pa.int64())}))
    out = dict(bfs_shortest_hops(edges, [0], max_hops=8)
               .to_pandas().itertuples(index=False, name=None))
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1}


# ------------------------------------------------------------- histogram

def test_value_histogram_matches_numpy():
    from dggrid4py_ray.stages.relational import value_histogram

    rng = np.random.default_rng(2)
    v = rng.integers(-50, 1050, 5000).astype(np.int64)
    lo, hi, nb = 0, 1000, 8
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v)})).repartition(6)
    got = (value_histogram(ds, "v", lo=lo, hi=hi, n_buckets=nb,
                           agg_cols={"v": "sum_v"})
           .to_pandas().sort_values("bucket", ignore_index=True))

    b = (v - lo) * nb // (hi - lo) + 1
    b[v < lo] = 0
    b[v >= hi] = nb + 1
    ref = (pd.DataFrame({"bucket": b, "v": v}).groupby("bucket")
           .agg(n=("v", "size"), sum_v=("v", "sum")).reset_index())
    pd.testing.assert_frame_equal(
        got, ref.astype({"n": "int64", "sum_v": "int64"}))
    assert set(got["bucket"]) >= {0, nb + 1}  # under/overflow exercised


# ----------------------------------------------------------------- audit

def test_expectation_audit_counts_and_uniqueness():
    from dggrid4py_ray.stages.validate import expectation_audit

    t = pa.table({
        "id": pa.array([1, 2, 2, 3, 4, 5], pa.int64()),
        "x": pa.array([1.0, None, -3.0, 200.0, 5.0, None], pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    checks = {
        "null_x": lambda b: pc.is_null(b["x"]),
        "x_out_of_range": lambda b: pc.or_(
            pc.less(b["x"], 0.0), pc.greater(b["x"], 100.0)),
    }
    out = dict(expectation_audit(ds, checks, unique_col="id")
               .to_pandas().itertuples(index=False, name=None))
    # null comparison rows must not count as violations in the range check
    assert out == {"_rows": 6, "null_x": 2, "x_out_of_range": 2,
                   "dup_id": 1}


# ------------------------------------------------------------------ sssp

def _brute_sssp(edges, sources, max_hops):
    """Bounded-hop Bellman-Ford reference (pure python)."""
    best = {s: 0 for s in sources}
    for _ in range(max_hops):
        cur = dict(best)
        for s, d, w in edges:
            if s in cur and cur[s] + w < best.get(d, 1 << 60):
                best[d] = cur[s] + w
    return sorted(best.items())


@pytest.mark.parametrize("threshold", [2_000_000, 3])
def test_sssp_bounded_matches_bruteforce(threshold):
    from dggrid4py_ray.stages.graph import sssp_bounded

    rng = np.random.default_rng(17)
    src = rng.integers(0, 120, 500).astype(np.int64)
    dst = rng.integers(0, 120, 500).astype(np.int64)
    w = rng.integers(1, 9, 500).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "w": pa.array(w)})).repartition(5)
    got = (sssp_bounded(edges, [0, 3], max_hops=4,
                        broadcast_threshold=threshold)
           .to_pandas().sort_values("node", ignore_index=True))
    want = _brute_sssp(list(zip(src, dst, w)), [0, 3], 4)
    assert list(got.itertuples(index=False, name=None)) == want


def test_sssp_lighter_longer_path_wins():
    from dggrid4py_ray.stages.graph import sssp_bounded

    # 0->3 direct weight 10; 0->1->2->3 total weight 3
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 0, 1, 2], pa.int64()),
        "dst": pa.array([3, 1, 2, 3], pa.int64()),
        "w": pa.array([10, 1, 1, 1], pa.int64())}))
    out = dict((int(r[0]), int(r[1])) for r in
               sssp_bounded(edges, [0], max_hops=8).to_pandas()
               .itertuples(index=False, name=None))
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}
    # with max_hops=1 the heavy direct edge is the only path
    out1 = dict((int(r[0]), int(r[1])) for r in
                sssp_bounded(edges, [0], max_hops=1).to_pandas()
                .itertuples(index=False, name=None))
    assert out1 == {0: 0, 1: 1, 3: 10}


# ----------------------------------------------------------- dup windows

def _brute_dup_windows(ids, texts, W):
    from collections import Counter
    wins = []
    for i, t in zip(ids, texts):
        toks = t.split(" ")
        for s in range(len(toks) - W + 1):
            wins.append((i, " ".join(toks[s:s + W])))
    cnt = Counter(w for _, w in wins)
    out = {}
    for i, w in wins:
        tot, dup = out.get(i, (0, 0))
        out[i] = (tot + 1, dup + (1 if cnt[w] > 1 else 0))
    return sorted((i, t, d) for i, (t, d) in out.items())


def test_duplicated_window_counts_matches_bruteforce():
    from dggrid4py_ray.stages.dedup import duplicated_window_counts

    rng = np.random.default_rng(23)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = [" ".join(rng.choice(vocab, rng.integers(2, 40)))
             for _ in range(80)]
    texts += [texts[0], texts[1]]               # whole-doc dups
    shared = " ".join(rng.choice(vocab, 12))
    texts += [f"{shared} unique1 tail", f"head unique2 {shared}"]
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids, "text": texts})).repartition(6)
    got = (duplicated_window_counts(ds, window=5).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    want = _brute_dup_windows(ids, texts, 5)
    assert list(got.itertuples(index=False, name=None)) == want
    # docs shorter than the window are absent
    assert set(got["doc_id"]) == {i for i, t in zip(ids, texts)
                                  if len(t.split(" ")) >= 5}


def test_duplicated_window_counts_no_dups():
    from dggrid4py_ray.stages.dedup import duplicated_window_counts

    texts = ["a b c d e f", "g h i j k l m"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.array([1, 2], np.int64), "text": texts}))
    got = (duplicated_window_counts(ds, window=3).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert list(got.itertuples(index=False, name=None)) == [
        (1, 4, 0), (2, 5, 0)]


# ------------------------------------------------- review regressions

def test_set_similarity_join_zero_pairs():
    # disjoint vocabularies: no candidate pair survives -> typed empty
    # (used to poison the hash join with schema-less blocks)
    from dggrid4py_ray.stages.dedup import set_similarity_join

    texts = [f"u{i}a u{i}b u{i}c" for i in range(20)]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(20, dtype=np.int64), "text": texts}))
    out = set_similarity_join(ds, tau_1e6=900_000)
    tbl = out.take_batch(1, batch_format="pyarrow") if out.count() else None
    assert out.count() == 0
    assert out.schema().names == ["id_a", "id_b", "n_shared", "n_union"]


def test_bfs_sources_exceed_threshold_at_entry():
    # len(sources) > broadcast_threshold on entry -> starts in the large
    # regime (used to crash on frontier_ds=None)
    from dggrid4py_ray.stages.graph import bfs_shortest_hops

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 4], pa.int64())}))
    out = dict(bfs_shortest_hops(edges, [0, 2], max_hops=3,
                                 broadcast_threshold=1)
               .to_pandas().itertuples(index=False, name=None))
    assert out == {0: 0, 2: 0, 1: 1, 3: 1, 4: 2}


def test_sssp_sources_exceed_threshold_at_entry():
    from dggrid4py_ray.stages.graph import sssp_bounded

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64()),
        "w": pa.array([5, 1, 1], pa.int64())}))
    out = dict(sssp_bounded(edges, [0, 2], max_hops=4,
                            broadcast_threshold=1)
               .to_pandas().itertuples(index=False, name=None))
    assert out == {0: 0, 2: 0, 1: 5, 3: 1}


def test_value_histogram_excludes_nulls():
    # null rows are dropped (SQL: WHERE col IS NOT NULL) -- a NaN->int64
    # cast used to land them in the underflow bucket
    from dggrid4py_ray.stages.relational import value_histogram

    ds = ray.data.from_arrow(pa.table({
        "v": pa.array([5, None, 995, None], pa.int64())}))
    out = value_histogram(ds, "v", lo=0, hi=1000, n_buckets=10).to_pandas()
    got = dict(zip(out["bucket"], out["n"]))
    assert got == {1: 1, 10: 1}
