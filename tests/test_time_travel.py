"""Snapshot time travel on write_clustered tables."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from dggrid4py_ray.state.checkpoint import (compact_clustered,
                                            list_clustered_versions,
                                            read_clustered_version,
                                            write_clustered)


def _mk(tmp_path, retain):
    d = str(tmp_path / "tt")
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "v": np.ones(100, dtype=np.int64)})
    write_clustered(ray.data.from_pandas(base), d, "k", ["k"],
                    rows_per_file=25)
    delta = pd.DataFrame({"k": np.array([10, 50, 500], np.int64),
                          "v": np.array([7, 7, 7], np.int64)})
    compact_clustered(d, ray.data.from_pandas(delta), rows_per_file=25,
                      retain_history=retain)
    return d


def test_time_travel_both_versions_readable(tmp_path):
    d = _mk(tmp_path, retain=True)
    assert list_clustered_versions(d) == [1, 2]

    v1, m1 = read_clustered_version(d, 1)
    v2, m2 = read_clustered_version(d, 2)
    assert m1["version"] == 1 and m2["version"] == 2
    assert v1.count() == 100
    assert v2.count() == 103
    df2 = v2.to_pandas()
    assert int(df2["v"].sum()) == 100 + 21

    # default read = current
    cur, mc = read_clustered_version(d)
    assert mc["version"] == 2 and cur.count() == 103


def test_destructive_compaction_invalidates_old_snapshot(tmp_path):
    d = _mk(tmp_path, retain=False)
    # current version always readable
    v2, _ = read_clustered_version(d, 2)
    assert v2.count() == 103
    # v1's overwritten files are gone -> clear refusal, not wrong data
    with pytest.raises(ValueError, match="no longer readable"):
        read_clustered_version(d, 1)


def test_unknown_version_raises(tmp_path):
    d = _mk(tmp_path, retain=True)
    with pytest.raises(ValueError, match="no snapshot version"):
        read_clustered_version(d, 9)
