"""Round-5 verdict #5: zone-map clustering in the flagship checkpoint
sink — per-file [min, max] zones in the lineage manifests, and the
pruned reader touching a strict subset of files."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dggrid4py_ray.state.checkpoint import (read_checkpointed_pruned,
                                            write_dataset_checkpointed)


def _make_clustered(tmp_path, n=4000, parts=4):
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "day": np.sort(np.random.default_rng(5).integers(0, 100, n))
        .astype(np.int64),
        "part_id": (np.arange(n, dtype=np.int64) % parts),
    })
    d = str(tmp_path / "ckpt")
    ds = ray.data.from_pandas(df).map_batches(
        lambda t: t, batch_format="pyarrow").sort("day").repartition(8)
    write_dataset_checkpointed(ds, d, lineage={"t": "x"},
                               zone_cols=["day"])
    return d, df


def test_manifest_records_file_zones(ray_session, tmp_path):
    d, _ = _make_clustered(tmp_path)
    mans = [json.load(open(os.path.join(d, p, "manifest.json")))
            for p in sorted(os.listdir(d)) if p.startswith("part-")]
    assert mans, "no partition manifests written"
    for m in mans:
        assert m["zone_cols"] == ["day"]
        assert set(m["file_zones"]) == set(m["files"])
        for z in m["file_zones"].values():
            lo, hi = z["day"]
            assert 0 <= lo <= hi < 100


def test_pruned_read_strict_subset_and_exact(ray_session, tmp_path):
    d, df = _make_clustered(tmp_path)
    sub, n_read, n_total = read_checkpointed_pruned(d, "day", 20, 30)
    assert n_total > 0
    # the clipped region must touch a STRICT subset of the files
    assert 0 < n_read < n_total
    got = sorted(sub.to_pandas()["event_id"])
    want = sorted(df.loc[(df["day"] >= 20) & (df["day"] < 30),
                         "event_id"])
    assert got == want


def test_pruned_read_empty_range_returns_typed_empty(ray_session,
                                                     tmp_path):
    d, _ = _make_clustered(tmp_path)
    sub, n_read, n_total = read_checkpointed_pruned(d, "day", 500, 600)
    assert n_read == 0 and n_total > 0
    out = sub.to_pandas()
    assert len(out) == 0
    assert "event_id" in out.columns


def test_flagship_zone_on_cell(ray_session, tmp_path):
    """run_flagship_checkpointed(zone_on_cell=True): per-file rep_cell
    zones land in the manifests and the representative cell equals the
    doc's first VALID span cell (vectorized reduceat path)."""
    import pyarrow as pa
    import ray.data as rd

    from dggrid4py_ray.dggs.igeo7 import INVALID_ID
    from dggrid4py_ray.pipelines.highlevel import run_flagship_checkpointed
    from dggrid4py_ray.sources.spans_table import spans_dataset

    src = str(tmp_path / "docs")
    spans_dataset(400, batch_rows=100).write_parquet(src)
    out = str(tmp_path / "out")
    run_flagship_checkpointed(src, out, resolution=5, zone_on_cell=True)

    mans = [json.load(open(os.path.join(out, p, "manifest.json")))
            for p in sorted(os.listdir(out)) if p.startswith("part-")]
    assert mans
    zoned = [m for m in mans if m.get("file_zones")]
    assert zoned, "no file zones recorded"
    for m in zoned:
        for z in m["file_zones"].values():
            if z:                          # all-invalid files carry {}
                lo, hi = z["rep_cell"]
                assert lo <= hi

    # rep_cell correctness on the written data
    back = rd.read_parquet(out, file_extensions=["parquet"]).to_pandas()
    assert "rep_cell" in back.columns
    for cells, rep in zip(back["span_cell_ids"], back["rep_cell"]):
        good = [c for c in cells if c != INVALID_ID]
        assert rep == (good[0] if good else INVALID_ID)
