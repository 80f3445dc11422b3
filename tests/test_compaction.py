"""compact_clustered: LSM-style delta merge into a clustered layout."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def test_compact_preserves_content_and_invariants(ray_session, tmp_path):
    import ray.data
    from dggrid4py_ray.state.checkpoint import (compact_clustered,
                                                write_clustered)

    d = str(tmp_path / "tbl")
    base = pd.DataFrame({
        "k": np.arange(0, 10_000, 2, dtype=np.int64),   # even keys
        "v": np.arange(5000, dtype=np.int64)})
    write_clustered(ray.data.from_pandas(base).repartition(6), d, "k",
                    ["k"], rows_per_file=512)
    man0 = json.load(open(os.path.join(d, "_zonemap.json")))
    files0 = {e["file"] for e in man0["files"]}

    # delta: odd keys in a narrow range (touches few files), one key
    # exactly equal to an existing zone boundary, plus keys beyond
    # every existing zone (append path)
    bnd = man0["files"][0]["zones"]["k"][1]
    delta = pd.DataFrame({
        "k": np.concatenate([np.arange(301, 601, 2),
                             [bnd],
                             np.arange(20_000, 20_050)]).astype(np.int64),
        "v": np.arange(201, dtype=np.int64) + 10_000})
    man1 = compact_clustered(d, ray.data.from_pandas(delta),
                             rows_per_file=512)

    # (1) content = base UNION ALL delta, exactly
    got = pq.read_table(
        [os.path.join(d, e["file"]) for e in man1["files"]]).to_pandas()
    want = pd.concat([base, delta], ignore_index=True)
    got_s = got.sort_values(["k", "v"], ignore_index=True)
    want_s = want.sort_values(["k", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(got_s, want_s)

    # (2) every file internally sorted; manifest zones match file min/max
    for e in man1["files"]:
        t = pq.read_table(os.path.join(d, e["file"]))
        kv = t["k"].to_numpy()
        assert (np.diff(kv) >= 0).all()
        assert e["zones"]["k"] == [int(kv.min()), int(kv.max())]
        assert e["rows"] == len(kv)

    # (3) files untouched by the delta survive verbatim
    files1 = {e["file"] for e in man1["files"]}
    assert files0 & files1, "compaction rewrote every file"
    # (4) no orphan parquet outside the manifest
    on_disk = {f for f in os.listdir(d) if f.endswith(".parquet")}
    assert on_disk == files1


def test_compact_empty_delta_is_noop(ray_session, tmp_path):
    import ray.data
    from dggrid4py_ray.state.checkpoint import (compact_clustered,
                                                write_clustered)

    d = str(tmp_path / "tbl2")
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "v": np.ones(100, np.int64)})
    write_clustered(ray.data.from_pandas(base), d, "k", ["k"],
                    rows_per_file=64)
    man0 = json.load(open(os.path.join(d, "_zonemap.json")))
    man1 = compact_clustered(
        d, ray.data.from_pandas(base.iloc[:0]))
    assert man1 == man0
