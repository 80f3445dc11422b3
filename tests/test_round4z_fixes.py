"""Regression tests for the round-4z review fixes (the span after the
r4s scale checks: tiles/feather/geostats/interp/window/checkpoint)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


def test_compact_clustered_crash_leaves_readable_manifest(tmp_path):
    """A crash BEFORE the manifest swap must leave the previous manifest
    pointing only at files that still exist (old files are now deleted
    only after the swap)."""
    from dggrid4py_ray.state import checkpoint as cp

    d = str(tmp_path / "tbl")
    base = ray.data.from_pandas(pd.DataFrame(
        {"k": np.arange(0, 100, dtype=np.int64),
         "v": np.arange(0, 100, dtype=np.int64)}))
    cp.write_clustered(base, d, "k", ["k"], rows_per_file=25)
    with open(os.path.join(d, "_zonemap.json")) as f:
        man_before = json.load(f)

    delta = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([10, 40, 70], dtype=np.int64),
         "v": np.array([1, 1, 1], dtype=np.int64)}))

    # crash injection: fail the atomic manifest publish
    orig_replace = os.replace

    def boom(src, dst):
        if dst.endswith("_zonemap.json"):
            raise RuntimeError("simulated crash before manifest commit")
        return orig_replace(src, dst)

    os.replace = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            cp.compact_clustered(d, delta, rows_per_file=25)
    finally:
        os.replace = orig_replace

    # the OLD manifest survives and every file it lists still exists
    with open(os.path.join(d, "_zonemap.json")) as f:
        man_after = json.load(f)
    assert man_after == man_before
    for e in man_after["files"]:
        assert os.path.exists(os.path.join(d, e["file"]))
    # the table is still fully readable at its pre-compaction content
    tot = sum(pq.read_table(os.path.join(d, e["file"])).num_rows
              for e in man_after["files"])
    assert tot == 100

    # and a clean retry completes normally
    man2 = cp.compact_clustered(d, delta, rows_per_file=25)
    tot2 = sum(pq.read_table(os.path.join(d, e["file"])).num_rows
               for e in man2["files"])
    assert tot2 == 103


def test_feather_manifest_ignores_orphan_blocks(tmp_path):
    """A duplicate block file from a retried sink task must not be read
    back (manifest-listed files only)."""
    from dggrid4py_ray.sources.feather import (read_feather_dir,
                                               write_feather_dir)

    d = str(tmp_path / "fth")
    df = pd.DataFrame({"a": np.arange(50, dtype=np.int64)})
    n = write_feather_dir(ray.data.from_pandas(df), d)
    assert n == 50
    assert os.path.exists(os.path.join(d, "_manifest.json"))

    # simulate a retried task's orphan: copy one published block
    blocks = [f for f in os.listdir(d) if f.endswith(".arrow")]
    src = os.path.join(d, blocks[0])
    with open(src, "rb") as f:
        payload = f.read()
    with open(os.path.join(d, "block-orphan-retry.arrow"), "wb") as f:
        f.write(payload)

    out = read_feather_dir(d).to_pandas()
    assert len(out) == 50
    assert sorted(out["a"].tolist()) == list(range(50))


def test_zonemap_pruned_files_multi_range(tmp_path):
    """The shared multi-range pruning helper: single-range parity with
    read_zonemap_pruned and distinct-union semantics across ranges."""
    from dggrid4py_ray.state.checkpoint import (read_zonemap_pruned,
                                                write_clustered,
                                                zonemap_pruned_files)

    d = str(tmp_path / "zp")
    df = pd.DataFrame({"k": np.arange(0, 1000, dtype=np.int64)})
    write_clustered(ray.data.from_pandas(df), d, "k", ["k"],
                    rows_per_file=100)

    paths, total = zonemap_pruned_files(d, "k", [(150, 160)])
    ds, nread, ntotal = read_zonemap_pruned(d, "k", 150, 160)
    assert total == ntotal and len(paths) == nread == 1

    # two ranges hitting the same file dedupe; disjoint ranges union
    paths2, _ = zonemap_pruned_files(d, "k", [(150, 152), (155, 158)])
    assert paths2 == paths
    paths3, _ = zonemap_pruned_files(d, "k", [(150, 160), (950, 960)])
    assert len(paths3) == 2

    with pytest.raises(ValueError, match="no zone map"):
        zonemap_pruned_files(d, "nope", [(0, 1)])


def test_group_interp_linear_rejects_fractional_values():
    from dggrid4py_ray.stages.window import group_interp_linear

    df = pd.DataFrame({"g": [1, 1, 1], "o": [0, 1, 2],
                       "v": [1.5, np.nan, 2.5]})
    # Ray wraps the worker's ValueError in RayTaskError
    with pytest.raises(Exception, match="integral"):
        group_interp_linear(ray.data.from_pandas(df), "g", "o", "v",
                            out_col="f").to_pandas()


def test_global_moran_constant_field_raises():
    from dggrid4py_ray.stages.interp import global_moran

    # 4 adjacent occupied cells, every cell value identical -> zero
    # variance -> den == 0
    df = pd.DataFrame({"x": np.array([0, 1, 2, 3], np.int64),
                       "y": np.zeros(4, np.int64),
                       "v": np.full(4, 7, np.int64)})
    with pytest.raises(ValueError, match="constant field"):
        global_moran(ray.data.from_pandas(df), "x", "y", "v")


def test_hausdorff_row_chunking_matches_unchunked():
    """Tiny chunk budget forces the multi-piece path; distances must be
    identical to the single-piece path."""
    from dggrid4py_ray.stages.geostats import hausdorff_pairs

    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame({"k": np.repeat(np.arange(3, dtype=np.int64), n // 3),
                       "lon": rng.uniform(-30, 30, n),
                       "lat": rng.uniform(-30, 30, n)})
    ds = ray.data.from_pandas(df)
    a = hausdorff_pairs(ds, "k").to_pandas() \
        .sort_values(["p1", "p2"], ignore_index=True)
    b = hausdorff_pairs(ds, "k", chunk_bytes=1024).to_pandas() \
        .sort_values(["p1", "p2"], ignore_index=True)
    assert a["p1"].tolist() == b["p1"].tolist()
    assert a["p2"].tolist() == b["p2"].tolist()
    np.testing.assert_array_equal(a["hausdorff_km"].to_numpy(),
                                  b["hausdorff_km"].to_numpy())


def test_group_ntile_sorted_matches_broadcast_variant():
    from dggrid4py_ray.stages.window import group_ntile, group_ntile_sorted

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "g": rng.integers(0, 40, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(7)
    a = group_ntile(ds, "g", ["v", "o"], 4, out_col="t").to_pandas() \
        .sort_values(["g", "o"], ignore_index=True)
    b = group_ntile_sorted(ds, "g", ["v", "o"], 4, out_col="t") \
        .to_pandas().sort_values(["g", "o"], ignore_index=True)
    assert a["t"].tolist() == b["t"].tolist()
