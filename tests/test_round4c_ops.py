"""Round-4c operators: rollup_aggregate, grouped_string_agg,
paragraph_dedup (chunk-level exact dedup), idw_grid."""

import numpy as np
import pandas as pd
import ray
import ray.data


def test_rollup_aggregate_matches_pandas():
    from dggrid4py_ray.stages.relational import rollup_aggregate

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.uniform(0, 10, n),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = rollup_aggregate(ds, ["a", "b"], sum_cols={"v": "sum_v"}) \
        .to_pandas().sort_values(["a", "b"], ignore_index=True)

    levels = []
    g2 = df.groupby(["a", "b"]).agg(sum_v=("v", "sum"),
                                    n=("v", "size")).reset_index()
    levels.append(g2)
    g1 = df.groupby("a").agg(sum_v=("v", "sum"), n=("v", "size")) \
        .reset_index().assign(b="ALL")
    levels.append(g1[["a", "b", "sum_v", "n"]])
    levels.append(pd.DataFrame({"a": ["ALL"], "b": ["ALL"],
                                "sum_v": [df["v"].sum()], "n": [n]}))
    want = pd.concat(levels, ignore_index=True) \
        .sort_values(["a", "b"], ignore_index=True)
    assert len(out) == len(want)
    assert (out["a"] == want["a"]).all() and (out["b"] == want["b"]).all()
    assert np.allclose(out["sum_v"], want["sum_v"])
    assert (out["n"].to_numpy() == want["n"].to_numpy()).all()


def test_grouped_string_agg_multiblock_groups():
    """Groups spanning several sorted blocks reassemble exactly once, in
    order, including a group larger than any single block."""
    from dggrid4py_ray.stages.groupagg import grouped_string_agg

    rng = np.random.default_rng(7)
    rows = []
    for g in range(40):
        n = 200 if g == 13 else int(rng.integers(1, 9))  # one giant group
        for i in range(n):
            rows.append((g, i, f"w{g}_{i}"))
    df = pd.DataFrame(rows, columns=["g", "i", "t"])
    df = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(11)

    out = grouped_string_agg(ds, key="g", order_col="i", text_col="t",
                             sep=" ", out_col="t").to_pandas()
    want = (df.sort_values(["g", "i"]).groupby("g")["t"]
            .agg(" ".join).reset_index())
    got = out.sort_values("g", ignore_index=True)
    assert len(got) == 40
    assert (got["g"].to_numpy() == want["g"].to_numpy()).all()
    assert (got["t"].to_numpy() == want["t"].to_numpy()).all()


def test_grouped_string_agg_duplicate_keys_raise():
    from dggrid4py_ray.stages.groupagg import grouped_string_agg

    df = pd.DataFrame({"g": [1, 1], "i": [0, 0], "t": ["a", "b"]})
    ds = ray.data.from_pandas(df).repartition(2)
    try:
        grouped_string_agg(ds, "g", "i", "t").to_pandas()
        raised = False
    except Exception:
        raised = True
    assert raised


def test_paragraph_dedup_planted_chunks():
    """A chunk duplicated across docs survives only in the lowest
    (doc_id, chunk_idx); fully-duplicated docs vanish."""
    from dggrid4py_ray.stages.dedup import paragraph_dedup

    w = "a b c d"  # words_per_chunk=4 -> this is one whole chunk
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c d e f g h",      # chunks: [a b c d], [e f g h]
            "a b c d x y z w",      # first chunk dup of doc0 -> dropped
            "e f g h",              # whole doc dup of doc0 chunk 2 -> gone
            "p q r s a b c d",      # [p q r s], [a b c d] dup -> partial
        ],
    })
    ds = ray.data.from_pandas(docs).repartition(3)
    out = paragraph_dedup(ds, words_per_chunk=4).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["doc_id"].tolist() == [0, 1, 3]
    assert out["text"].tolist() == ["a b c d e f g h", "x y z w", "p q r s"]
    assert w in out["text"][0]


def test_paragraph_dedup_no_duplicates_is_identity():
    from dggrid4py_ray.stages.dedup import paragraph_dedup

    rng = np.random.default_rng(11)
    docs = pd.DataFrame({
        "doc_id": np.arange(50),
        "text": [" ".join(f"u{d}w{i}" for i in range(int(rng.integers(1, 30))))
                 for d in range(50)],
    })
    ds = ray.data.from_pandas(docs).repartition(5)
    out = paragraph_dedup(ds, words_per_chunk=8).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["text"].tolist() == docs["text"].tolist()


def test_idw_grid_partials_match_single_pass():
    """Partial-sum decomposition across many blocks equals the one-shot
    computation (associativity), and weights are sane."""
    from dggrid4py_ray.stages.interp import grid_sites, idw_grid

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame({"lon": rng.uniform(-180, 180, n),
                       "lat": rng.uniform(-90, 90, n),
                       "value": rng.uniform(0, 5, n)})
    out = idw_grid(ray.data.from_pandas(df).repartition(9),
                   nx=8, ny=4).to_pandas()
    assert len(out) == 32

    si, sj, slon, slat = grid_sites(8, 4)
    lon, lat = np.radians(df["lon"].to_numpy()), np.radians(df["lat"].to_numpy())
    a = (np.sin((lat[:, None] - np.radians(slat)[None, :]) / 2) ** 2
         + np.cos(lat)[:, None] * np.cos(np.radians(slat))[None, :]
         * np.sin((lon[:, None] - np.radians(slon)[None, :]) / 2) ** 2)
    d = 2 * np.arcsin(np.sqrt(np.minimum(1.0, a)))
    w = 1.0 / (d * d + 1e-6)
    want = pd.DataFrame({"si": si, "sj": sj,
                         "sum_wv": w.T @ df["value"].to_numpy(),
                         "sum_w": w.sum(axis=0)})
    m = out.merge(want, on=["si", "sj"], suffixes=("", "_w"))
    assert len(m) == 32
    assert np.allclose(m["sum_wv"], m["sum_wv_w"], rtol=1e-12)
    assert np.allclose(m["sum_w"], m["sum_w_w"], rtol=1e-12)


def test_dilate_cells_matches_neighbor_union():
    """dilate_cells(k=1) == { cells } ∪ { all edge-neighbors }, computed
    independently with grid.neighbors on the driver."""
    from dggrid4py_ray.config import dgselect
    from dggrid4py_ray.dggs.igeo7 import INVALID_ID
    from dggrid4py_ray.stages.encode import dilate_cells, grid_for

    dggs = dgselect("IGEO7", resolution=3)
    grid = grid_for(dggs)
    rng = np.random.default_rng(5)
    seq = rng.choice(np.arange(1, 3433), size=60, replace=False)
    z7 = grid.from_seqnum(seq.astype(np.int64), 3)
    ds = ray.data.from_pandas(pd.DataFrame({"cell_id": z7})).repartition(4)

    got = np.sort(dilate_cells(ds, dggs, k=1).to_pandas()["cell_id"]
                  .to_numpy())
    want = set(int(v) for v in z7)
    for row in grid.neighbors(np.asarray(z7, dtype=np.int64)):
        want.update(int(v) for v in row if v != INVALID_ID)
    assert got.tolist() == sorted(want)


def test_zonal_majority_matches_pandas():
    from dggrid4py_ray.stages.groupagg import grouped_reduce
    from dggrid4py_ray.stages.relational import topk_per_group

    rng = np.random.default_rng(9)
    n = 20_000
    df = pd.DataFrame({"cell": rng.integers(0, 300, n),
                       "cls": rng.choice(list("abcde"), n)})
    counts_pd = df.groupby(["cell", "cls"]).size().reset_index(name="n")
    want = (counts_pd.sort_values(["n", "cls"],
                                  ascending=[False, True])
            .groupby("cell").head(1)
            .sort_values("cell", ignore_index=True))

    ds = ray.data.from_pandas(df.assign(pc=1)).repartition(8)
    counts = grouped_reduce(ds, key=["cell", "cls"],
                            col_map={"pc": "n"}, how="sum")
    got = (topk_per_group(counts, "cell", "n", k=1, id_col="cls")
           .to_pandas().sort_values("cell", ignore_index=True))
    assert (got["cell"].to_numpy() == want["cell"].to_numpy()).all()
    assert (got["cls"].to_numpy() == want["cls"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_radius_join_matches_bruteforce_incl_polar():
    from dggrid4py_ray.dggs.sphere import haversine_km
    from dggrid4py_ray.stages.join import radius_join_via_buckets

    rng = np.random.default_rng(17)
    npts, nsites = 2000, 80
    pts = pd.DataFrame({"pid": np.arange(npts),
                        "lon": rng.uniform(-180, 180, npts),
                        "lat": np.degrees(np.arcsin(rng.uniform(-1, 1, npts)))})
    sites = pd.DataFrame({
        "sid": np.arange(nsites),
        "slon": rng.uniform(-180, 180, nsites),
        "slat": np.concatenate([rng.uniform(-90, 90, nsites - 6),
                                [89.5, -89.9, 88.0, -88.0, 90.0, -90.0]])})
    d = haversine_km(pts["lon"].to_numpy()[:, None],
                     pts["lat"].to_numpy()[:, None],
                     sites["slon"].to_numpy()[None, :],
                     sites["slat"].to_numpy()[None, :])
    for R in [150.0, 800.0, 3000.0]:
        out = radius_join_via_buckets(
            ray.data.from_pandas(pts).repartition(5),
            ray.data.from_pandas(sites).repartition(3),
            radius_km=R).to_pandas()
        assert out.duplicated(["pid", "sid"]).sum() == 0
        assert len(out) == int((d <= R).sum())
        got = set(zip(out["pid"], out["sid"]))
        pi, si = np.nonzero(d <= R)
        assert got == set(zip(pi.tolist(), si.tolist()))


def test_erode_cells_matches_bruteforce_and_duality():
    from dggrid4py_ray.config import dgselect
    from dggrid4py_ray.dggs.igeo7 import INVALID_ID
    from dggrid4py_ray.stages.encode import (dilate_cells, erode_cells,
                                             grid_for)

    dggs = dgselect("IGEO7", resolution=3)
    grid = grid_for(dggs)
    rng = np.random.default_rng(3)
    seq = rng.choice(np.arange(1, 3433), size=1200, replace=False)
    z7 = np.asarray(grid.from_seqnum(seq.astype(np.int64), 3),
                    dtype=np.int64)
    S = set(int(v) for v in z7)
    ds = ray.data.from_pandas(pd.DataFrame({"cell_id": z7})).repartition(4)

    got = np.sort(erode_cells(ds, dggs, k=1).to_pandas()["cell_id"]
                  .to_numpy())
    nb = grid.neighbors(z7)
    want = sorted(int(c) for c, row in zip(z7, nb)
                  if all(int(v) in S for v in row if v != INVALID_ID))
    assert got.tolist() == want
    # opening extensivity: S ⊆ erode(dilate(S))
    opened = set(erode_cells(dilate_cells(ds, dggs, k=1), dggs, k=1)
                 .to_pandas()["cell_id"])
    assert S.issubset(opened)


def test_group_rank_ties_match_pandas():
    from dggrid4py_ray.stages.window import group_rank

    rng = np.random.default_rng(1)
    n = 30_000
    df = pd.DataFrame({"g": rng.integers(0, 500, n),
                       "v": rng.integers(0, 50, n),  # heavy ties
                       "rid": np.arange(n)})
    out = group_rank(ray.data.from_pandas(df).repartition(7), "g", "v",
                     out_col="rank", dense_col="dense").to_pandas() \
        .sort_values("rid", ignore_index=True)
    assert len(out) == n
    want_rank = df.groupby("g")["v"].rank(method="min").astype(np.int64)
    want_dense = df.groupby("g")["v"].rank(method="dense").astype(np.int64)
    ref = df.assign(rank=want_rank, dense=want_dense) \
        .sort_values("rid", ignore_index=True)
    assert (out["rank"].to_numpy() == ref["rank"].to_numpy()).all()
    assert (out["dense"].to_numpy() == ref["dense"].to_numpy()).all()


def test_neighbors_lattice_fast_path_equals_voronoi():
    """The axial-lattice fast path (interior cells) must agree with the
    exact local spherical Voronoi everywhere, including the seam/edge
    fallback split."""
    from dggrid4py_ray.config import dgselect
    from dggrid4py_ray.dggs.igeo7 import INVALID_ID
    from dggrid4py_ray.stages.encode import grid_for

    g = grid_for(dgselect("IGEO7", resolution=5))
    for res in (1, 2, 3, 5):
        n_tot = 10 * 7 ** res + 2
        rng = np.random.default_rng(res)
        seq = rng.choice(np.arange(1, n_tot + 1),
                         size=min(1500, n_tot), replace=False)
        z7 = np.asarray(g.from_seqnum(seq.astype(np.int64), res),
                        dtype=np.int64)
        fast = g.neighbors(z7)
        slow, _ = g.local_voronoi(z7)
        for fr, sr in zip(fast, slow):
            assert (set(int(v) for v in fr if v != INVALID_ID)
                    == set(int(v) for v in sr if v != INVALID_ID))


def test_k_ring_vectorized_matches_bruteforce():
    from dggrid4py_ray.config import dgselect
    from dggrid4py_ray.dggs.igeo7 import INVALID_ID
    from dggrid4py_ray.stages.encode import grid_for

    g = grid_for(dgselect("IGEO7", resolution=3))
    rng = np.random.default_rng(2)
    seq = rng.choice(np.arange(1, 3433), size=100, replace=False)
    z7 = np.asarray(g.from_seqnum(seq.astype(np.int64), 3), dtype=np.int64)
    got = g.k_ring(z7, 2)
    # brute force: iterate neighbor closure per input
    for zi, ring in zip(z7, got):
        cur = {int(zi)}
        for _ in range(2):
            nb = g.neighbors(np.array(sorted(cur), dtype=np.int64))
            cur |= {int(v) for row in nb for v in row if v != INVALID_ID}
        assert sorted(cur) == ring.tolist()
