"""Round-4e operators: snapshot diff (CDC), interval union, skyline,
stencil smoothing, spatial density clustering, co-occurrence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _pandas_diff(a: pd.DataFrame, b: pd.DataFrame, key: str, vals: list):
    m = a.merge(b, on=key, how="outer", suffixes=("_a", "_b"),
                indicator=True)
    lab = np.where(m["_merge"] == "right_only", "added",
                   np.where(m["_merge"] == "left_only", "removed", ""))
    both = m["_merge"] == "both"
    chg = np.zeros(len(m), dtype=bool)
    for v in vals:
        chg |= both.to_numpy() & (m[f"{v}_a"] != m[f"{v}_b"]).to_numpy()
    lab = np.where(chg, "changed", lab)
    out = pd.DataFrame({key: m[key], "change": lab})
    return out[out["change"] != ""].sort_values(key, ignore_index=True)


def test_table_diff_matches_pandas_outer_merge():
    from dggrid4py_ray.stages.diff import table_diff

    rng = np.random.default_rng(11)
    n = 5000
    base = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "s": rng.choice(["x", "y", "z"], n),
        "p": np.round(rng.uniform(0, 1000, n), 2),
    })
    a = base[base.k % 13 != 0].reset_index(drop=True)
    b = base[base.k % 17 != 0].copy().reset_index(drop=True)
    b.loc[b.k % 7 == 0, "p"] += 5.0

    out = table_diff(
        ray.data.from_pandas(a).repartition(9),
        ray.data.from_pandas(b).repartition(5),
        "k", ["s", "p"]).to_pandas().sort_values("k", ignore_index=True)
    exp = _pandas_diff(a, b, "k", ["s", "p"])
    pd.testing.assert_frame_equal(out, exp)
    assert set(out["change"]) == {"added", "removed", "changed"}


def test_table_diff_rejects_duplicate_keys():
    from dggrid4py_ray.stages.diff import table_diff

    a = pd.DataFrame({"k": [1, 1], "v": [1.0, 2.0]})
    b = pd.DataFrame({"k": [1], "v": [3.0]})
    with pytest.raises((ValueError, Exception)):
        table_diff(ray.data.from_pandas(a), ray.data.from_pandas(b),
                   "k", ["v"]).to_pandas()


def test_table_diff_identical_snapshots_empty():
    from dggrid4py_ray.stages.diff import table_diff

    a = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                      "v": np.arange(100) * 1.5})
    out = table_diff(ray.data.from_pandas(a).repartition(4),
                     ray.data.from_pandas(a).repartition(7),
                     "k", ["v"])
    # dataset schema survives the all-empty result (to_pandas() on an
    # all-empty dataset drops columns — a Ray quirk, not an engine one)
    assert [f for f in out.schema().names] == ["k", "change"]
    assert out.count() == 0


def _brute_union(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for g, grp in df.groupby("g"):
        iv = sorted(zip(grp["s"], grp["e"]))
        tot, cs, ce = 0, None, None
        for s, e in iv:
            if cs is None:
                cs, ce = s, max(s, e)
            elif s > ce:
                tot += ce - cs
                cs, ce = s, max(s, e)
            else:
                ce = max(ce, e)
        if cs is not None:
            tot += ce - cs
        rows.append({"g": g, "covered": tot})
    return pd.DataFrame(rows)


def test_interval_union_length_matches_bruteforce():
    from dggrid4py_ray.stages.temporal import interval_union_length

    rng = np.random.default_rng(3)
    n = 30_000
    df = pd.DataFrame({
        "g": rng.integers(0, 400, n),
        "s": rng.integers(0, 100_000, n).astype(np.int64),
        "u": np.arange(n, dtype=np.int64),
    })
    df["e"] = df["s"] + rng.integers(0, 500, n).astype(np.int64)
    out = (interval_union_length(
        ray.data.from_pandas(df).repartition(17), "g", "s", "e",
        uniq_cols=["u"]).to_pandas()
        .sort_values("g", ignore_index=True))
    exp = _brute_union(df).sort_values("g", ignore_index=True)
    pd.testing.assert_frame_equal(
        out.astype({"covered": np.int64}), exp.astype({"covered": np.int64}))


def test_interval_union_group_spanning_many_blocks():
    from dggrid4py_ray.stages.temporal import interval_union_length

    # one hot group spanning every block: the running-max carry chain
    # must propagate through multiple seams
    n = 5_000
    df = pd.DataFrame({
        "g": np.zeros(n, dtype=np.int64),
        "s": np.arange(n, dtype=np.int64) * 10,
        "u": np.arange(n, dtype=np.int64),
    })
    df["e"] = df["s"] + 15          # each overlaps the next
    out = interval_union_length(
        ray.data.from_pandas(df).repartition(23), "g", "s", "e",
        uniq_cols=["u"]).to_pandas()
    assert out["covered"].iloc[0] == (n - 1) * 10 + 15


def _brute_skyline(crit: np.ndarray) -> np.ndarray:
    n = len(crit)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        le = (crit <= crit[i]).all(axis=1)
        lt = (crit < crit[i]).any(axis=1)
        if (le & lt).any():
            keep[i] = False
    return keep


def test_skyline_2d_matches_bruteforce():
    from dggrid4py_ray.stages.skyline import skyline

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "price": rng.integers(0, 300, n).astype(np.float64),  # many ties
        "size": rng.integers(0, 50, n).astype(np.int64),
    })
    out = (skyline(ray.data.from_pandas(df).repartition(11),
                   ["price"], ["size"]).to_pandas()
           .sort_values("id", ignore_index=True))
    crit = np.column_stack([df["price"], -df["size"].astype(np.float64)])
    exp = df[_brute_skyline(crit)].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)


def test_skyline_3d_matches_bruteforce():
    from dggrid4py_ray.stages.skyline import skyline

    rng = np.random.default_rng(9)
    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "a": rng.integers(0, 40, n).astype(np.float64),
        "b": rng.integers(0, 40, n).astype(np.float64),
        "c": rng.integers(0, 40, n).astype(np.float64),
    })
    out = (skyline(ray.data.from_pandas(df).repartition(7),
                   ["a", "b"], ["c"]).to_pandas()
           .sort_values("id", ignore_index=True))
    crit = np.column_stack([df["a"], df["b"], -df["c"]])
    exp = df[_brute_skyline(crit)].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)


def test_skyline_duplicate_points_all_survive():
    from dggrid4py_ray.stages.skyline import skyline

    df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "x": [1.0, 1.0, 1.0, 2.0, 2.0, 3.0],
                       "y": [9, 9, 9, 9, 10, 1]})
    # (1,9) x3 are mutually non-dominating; (2,9) dominated by (1,9);
    # (2,10) survives; (3,1) dominated
    out = skyline(ray.data.from_pandas(df).repartition(3),
                  ["x"], ["y"]).to_pandas()
    assert sorted(out["id"].tolist()) == [0, 1, 2, 4]


def test_winsorize_matches_numpy_quantiles():
    from dggrid4py_ray.stages.normalize import winsorize

    rng = np.random.default_rng(13)
    v = np.round(rng.lognormal(3, 1.5, 20_000), 2)
    df = pd.DataFrame({"x": v})
    out = winsorize(ray.data.from_pandas(df).repartition(9), "x",
                    0.05, 0.95, out_col="w").to_pandas()
    sv = np.sort(v)
    # quantile_disc: element at rank ceil(q*n)-1
    lo = sv[int(np.ceil(0.05 * len(v))) - 1]
    hi = sv[int(np.ceil(0.95 * len(v))) - 1]
    exp = np.clip(df["x"].to_numpy(), lo, hi)
    np.testing.assert_array_equal(
        np.sort(out["w"].to_numpy()), np.sort(exp))
    assert out["w"].min() == lo and out["w"].max() == hi


def _brute_focal(df: pd.DataFrame, vals: list, radius: int) -> pd.DataFrame:
    cell = {(x, y): tuple(df[v].iloc[i] for v in vals)
            for i, (x, y) in enumerate(zip(df["x"], df["y"]))}
    rows = []
    for (x, y), own in cell.items():
        acc = [0.0] * len(vals)
        for dx in range(-radius, radius + 1):
            for dy in range(-radius, radius + 1):
                nb = cell.get((x + dx, y + dy))
                if nb is not None:
                    for j in range(len(vals)):
                        acc[j] += nb[j]
        rows.append({"x": x, "y": y,
                     **{f"f_{v}": acc[j] for j, v in enumerate(vals)},
                     **{f"own_{v}": own[j] for j, v in enumerate(vals)}})
    return pd.DataFrame(rows).sort_values(["x", "y"], ignore_index=True)


@pytest.mark.parametrize("radius,unbounded", [(1, True), (1, False), (2, True)])
def test_stencil_smooth_matches_bruteforce(radius, unbounded):
    from dggrid4py_ray.stages.interp import stencil_smooth

    rng = np.random.default_rng(7)
    # ~40% occupancy on a 40x25 lattice -> rich neighborhoods + edges
    xs, ys = np.meshgrid(np.arange(40), np.arange(25))
    keep = rng.random(xs.size) < 0.4
    df = pd.DataFrame({
        "x": xs.ravel()[keep].astype(np.int64),
        "y": ys.ravel()[keep].astype(np.int64),
        "n": rng.integers(1, 9, keep.sum()).astype(np.int64),
        "v": np.round(rng.uniform(0, 100, keep.sum()), 2),
    })
    out = (stencil_smooth(ray.data.from_pandas(df).repartition(13),
                          "x", "y", {"n": "f_n", "v": "f_v"},
                          radius=radius, unbounded_cells=unbounded)
           .to_pandas().sort_values(["x", "y"], ignore_index=True))
    exp = _brute_focal(df, ["n", "v"], radius)
    exp = exp.rename(columns={"f_n": "f_n", "f_v": "f_v"})
    assert len(out) == len(df)
    np.testing.assert_allclose(out["f_n"], exp["f_n"], rtol=1e-12)
    np.testing.assert_allclose(out["f_v"], exp["f_v"], rtol=1e-12)
    np.testing.assert_allclose(out["own_n"], exp["own_n"], rtol=0)
    np.testing.assert_allclose(out["own_v"], exp["own_v"], rtol=0)


def test_stencil_smooth_isolated_cell_is_identity():
    from dggrid4py_ray.stages.interp import stencil_smooth

    df = pd.DataFrame({"x": [0, 100], "y": [0, 100],
                       "n": [3.0, 5.0]})
    out = (stencil_smooth(ray.data.from_pandas(df), "x", "y",
                          {"n": "f_n"}, radius=1)
           .to_pandas().sort_values("x", ignore_index=True))
    np.testing.assert_array_equal(out["f_n"], [3.0, 5.0])
    np.testing.assert_array_equal(out["own_n"], [3.0, 5.0])


def _brute_density_clusters(df: pd.DataFrame, min_w, diag=True):
    from dggrid4py_ray.stages.density import pack_xy

    dense = df[df["w"] >= min_w].reset_index(drop=True)
    pos = {(x, y): i for i, (x, y) in enumerate(zip(dense["x"], dense["y"]))}
    parent = list(range(len(dense)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
            (1, 1)] if diag else [(-1, 0), (1, 0), (0, -1), (0, 1)]
    for (x, y), i in pos.items():
        for ox, oy in offs:
            j = pos.get((x + ox, y + oy))
            if j is not None:
                parent[find(i)] = find(j)
    pk = pack_xy(dense["x"].to_numpy(), dense["y"].to_numpy())
    roots = {}
    for i in range(len(dense)):
        roots.setdefault(find(i), []).append(i)
    lab = np.empty(len(dense), dtype=np.int64)
    for members in roots.values():
        m = min(pk[i] for i in members)
        for i in members:
            lab[i] = m
    out = dense.copy()
    out["cell_pk"] = pk
    out["cluster_pk"] = lab
    return out.sort_values("cell_pk", ignore_index=True)


@pytest.mark.parametrize("diag", [True, False])
def test_density_clusters_matches_unionfind(diag):
    from dggrid4py_ray.stages.density import density_clusters

    rng = np.random.default_rng(21)
    xs, ys = np.meshgrid(np.arange(60), np.arange(40))
    df = pd.DataFrame({
        "x": xs.ravel().astype(np.int64),
        "y": ys.ravel().astype(np.int64),
        "w": rng.poisson(3, xs.size).astype(np.int64),
    })
    out = (density_clusters(ray.data.from_pandas(df).repartition(11),
                            "x", "y", "w", min_weight=5, diag=diag)
           .to_pandas().sort_values("cell_pk", ignore_index=True)
           [["x", "y", "w", "cell_pk", "cluster_pk"]])
    exp = _brute_density_clusters(df, 5, diag=diag)
    pd.testing.assert_frame_equal(out, exp)
    # sanity: multi-cell clusters AND singletons both occurred
    sizes = out.groupby("cluster_pk").size()
    assert (sizes == 1).any() and (sizes > 1).any()


def test_density_clusters_negative_coords_and_all_singletons():
    from dggrid4py_ray.stages.density import density_clusters

    # far-apart dense cells incl. negative coords -> every cell its own label
    df = pd.DataFrame({"x": np.array([-50, 0, 50], dtype=np.int64),
                       "y": np.array([-7, 0, 7], dtype=np.int64),
                       "w": np.array([9, 9, 9], dtype=np.int64)})
    out = density_clusters(ray.data.from_pandas(df), "x", "y", "w",
                           min_weight=5).to_pandas()
    assert (out["cluster_pk"] == out["cell_pk"]).all() and len(out) == 3


def test_density_clusters_snake_spans_blocks():
    from dggrid4py_ray.stages.density import density_clusters, pack_xy

    # one 500-cell horizontal snake: a single component spanning every block
    n = 500
    df = pd.DataFrame({"x": np.arange(n, dtype=np.int64),
                       "y": np.zeros(n, dtype=np.int64),
                       "w": np.full(n, 10, dtype=np.int64)})
    out = density_clusters(ray.data.from_pandas(df).repartition(19),
                           "x", "y", "w", min_weight=1).to_pandas()
    root = pack_xy(np.array([0]), np.array([0]))[0]
    assert (out["cluster_pk"] == root).all() and len(out) == n


def test_token_cooccurrence_matches_bruteforce():
    from dggrid4py_ray.stages.text import token_cooccurrence

    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(60)]
    # Zipf-ish draw so the top-V vocabulary is a strict subset
    p = 1.0 / np.arange(1, 61); p /= p.sum()
    docs = [" ".join(rng.choice(words, size=rng.integers(3, 25), p=p))
            for _ in range(800)]
    df = pd.DataFrame({"doc_id": np.arange(800, dtype=np.int64),
                       "text": docs})
    V = 12
    out = (token_cooccurrence(ray.data.from_pandas(df).repartition(7),
                              vocab_size=V)
           .to_pandas().sort_values(["tok_a", "tok_b"], ignore_index=True))

    # brute force: df per token, top-V by (df desc, cf desc, tok), pair doc
    # counts over distinct in-vocab tokens per doc
    toks = [d.split(" ") for d in docs]
    from collections import Counter
    dfc, cfc = Counter(), Counter()
    for t in toks:
        cfc.update(t)
        dfc.update(set(t))
    top = sorted(dfc, key=lambda w: (-dfc[w], -cfc[w], w))[:V]
    tset = set(top)
    pairc = Counter()
    for t in toks:
        s = sorted(set(t) & tset)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pairc[(s[i], s[j])] += 1
    exp = pd.DataFrame(
        [{"tok_a": a, "tok_b": b, "df_a": dfc[a], "df_b": dfc[b],
          "n_both": n} for (a, b), n in pairc.items()]) \
        .sort_values(["tok_a", "tok_b"], ignore_index=True) \
        .astype({"df_a": np.int64, "df_b": np.int64, "n_both": np.int64})
    pd.testing.assert_frame_equal(out, exp)


def test_token_cooccurrence_no_pairs():
    from dggrid4py_ray.stages.text import token_cooccurrence

    # single-token docs -> no co-occurrence rows, typed empty result
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": ["a", "b", "a", "c", "b"]})
    out = token_cooccurrence(ray.data.from_pandas(df), vocab_size=3)
    assert out.count() == 0


def test_pivot_counts_and_sums_match_pandas():
    from dggrid4py_ray.stages.relational import pivot_counts

    rng = np.random.default_rng(23)
    n = 20_000
    df = pd.DataFrame({
        "k": rng.integers(0, 3000, n),
        "cat": rng.choice(["a", "b", "c", "zz"], n, p=[.5, .3, .15, .05]),
        "v": rng.integers(1, 10, n).astype(np.int64),
    })
    # counts; "zz" deliberately excluded from the category list -> ignored
    out = (pivot_counts(ray.data.from_pandas(df).repartition(9),
                        "k", "cat", ["a", "b", "c"])
           .to_pandas().sort_values("k", ignore_index=True))
    # keys whose rows are ALL out-of-set ("zz"-only) are omitted, not
    # emitted as all-zero rows (the SQL-PIVOT contract)
    exp = (df[df.cat != "zz"].pivot_table(index="k", columns="cat",
                                          values="v", aggfunc="size",
                                          fill_value=0)
           .reindex(columns=["a", "b", "c"], fill_value=0)
           .rename(columns={c: f"n_{c}" for c in "abc"})
           .reindex(sorted(df.loc[df.cat != "zz", "k"].unique()),
                    fill_value=0)
           .reset_index().rename_axis(None, axis=1))
    pd.testing.assert_frame_equal(
        out.astype({c: np.int64 for c in ["n_a", "n_b", "n_c"]}),
        exp.astype({c: np.int64 for c in ["n_a", "n_b", "n_c"]}))

    # value sums
    out2 = (pivot_counts(ray.data.from_pandas(df).repartition(9),
                         "k", "cat", ["a", "b"], value_col="v",
                         prefix="s_")
            .to_pandas().sort_values("k", ignore_index=True))
    exp2 = (df[df.cat.isin(["a", "b"])]
            .pivot_table(index="k", columns="cat", values="v",
                         aggfunc="sum", fill_value=0)
            .reindex(columns=["a", "b"], fill_value=0)
            .rename(columns={"a": "s_a", "b": "s_b"})
            .reindex(sorted(df.loc[df.cat.isin(["a", "b"]), "k"].unique()),
                     fill_value=0)
            .reset_index().rename_axis(None, axis=1))
    pd.testing.assert_frame_equal(
        out2.astype({"s_a": np.int64, "s_b": np.int64}),
        exp2.astype({"s_a": np.int64, "s_b": np.int64}))
