"""Tests for the round-4aa batch: manifest aggregation pushdown,
HITS scores, k-anonymity audit."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def test_manifest_range_agg_matches_scan_and_prunes(tmp_path):
    from dggrid4py_ray.state.checkpoint import (manifest_range_agg,
                                                write_clustered)

    d = str(tmp_path / "magg")
    n = 10_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "v": (np.arange(n, dtype=np.int64) * 7) % 101})
    write_clustered(ray.data.from_pandas(df), d, "k", ["k"],
                    rows_per_file=1000, stats_cols=["v"])

    lo, hi = 2500, 7500
    r = manifest_range_agg(d, "k", lo, hi, "v")
    m = (df["k"] >= lo) & (df["k"] < hi)
    assert r["n"] == int(m.sum())
    assert r["sum"] == int(df.loc[m, "v"].sum())
    # 10 files of 1000 rows: [2500,7500) has 2 boundary + 4 full-inside
    assert r["files_total"] == 10
    assert r["files_scanned"] == 2

    # file-aligned range: zero scan, pure metadata
    r2 = manifest_range_agg(d, "k", 3000, 7000, "v")
    assert r2["files_scanned"] == 0
    m2 = (df["k"] >= 3000) & (df["k"] < 7000)
    assert r2["n"] == int(m2.sum())
    assert r2["sum"] == int(df.loc[m2, "v"].sum())

    with pytest.raises(ValueError, match="no per-file sums"):
        manifest_range_agg(d, "k", 0, 10, "k")


def test_manifest_stats_survive_compaction(tmp_path):
    from dggrid4py_ray.state.checkpoint import (compact_clustered,
                                                manifest_range_agg,
                                                write_clustered)

    d = str(tmp_path / "magg2")
    df = pd.DataFrame({"k": np.arange(0, 1000, dtype=np.int64),
                       "v": np.full(1000, 3, dtype=np.int64)})
    write_clustered(ray.data.from_pandas(df), d, "k", ["k"],
                    rows_per_file=250, stats_cols=["v"])
    delta = pd.DataFrame({"k": np.array([100, 600, 2000], np.int64),
                          "v": np.array([10, 20, 30], np.int64)})
    compact_clustered(d, ray.data.from_pandas(delta), rows_per_file=250)

    allr = manifest_range_agg(d, "k", 0, 10_000, "v")
    assert allr["n"] == 1003
    assert allr["sum"] == 3000 + 60


def test_hits_scores_hand_graph():
    """Tiny graph checked by hand: edges a->x, a->y, b->x, b->x (dup)."""
    from dggrid4py_ray.stages.graph import hits_scores

    e = pd.DataFrame({"u": np.array([1, 1, 2, 2], np.int64),
                      "v": np.array([10, 11, 10, 10], np.int64)})
    out = hits_scores(ray.data.from_pandas(e)).to_pandas() \
        .sort_values("node", ignore_index=True)
    # a1(10) = 3 (1 from a, 2 from b-dup), a1(11) = 1
    # h1(1) = a1(10) + a1(11) = 4 ; h1(2) = 2 * a1(10) = 6
    # a2(10) = h1(1) + 2*h1(2) = 16 ; a2(11) = h1(1) = 4
    got = dict(zip(out["node"], zip(out["hub"], out["auth"])))
    assert got[1] == (4, 0)
    assert got[2] == (6, 0)
    assert got[10] == (0, 16)
    assert got[11] == (0, 4)


def test_hits_scores_empty_edges_raise():
    from dggrid4py_ray.stages.graph import hits_scores

    e = pd.DataFrame({"u": np.array([], np.int64),
                      "v": np.array([], np.int64)})
    with pytest.raises(ValueError, match="empty edge list"):
        hits_scores(ray.data.from_pandas(e))


def test_k_anonymity_audit_basic():
    from dggrid4py_ray.stages.validate import k_anonymity_audit

    df = pd.DataFrame({
        "qa": ["a"] * 5 + ["b"] * 2 + ["c"] * 1,
        "qb": np.array([1] * 5 + [2] * 2 + [3], np.int64)})
    out = k_anonymity_audit(ray.data.from_pandas(df), ["qa", "qb"],
                            k=3).to_pandas() \
        .sort_values("qa", ignore_index=True)
    assert out["qa"].tolist() == ["b", "c"]
    assert out["n"].tolist() == [2, 1]

    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_audit(ray.data.from_pandas(df), ["qa"], k=1)
