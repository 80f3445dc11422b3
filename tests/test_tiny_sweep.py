"""Tiny-input robustness sweep over EVERY registered gate query
(round-4 verdict #2): each query runs against ~3-row fact tables (the
dimension tables stay whole so foreign keys resolve) and must either
produce a result or raise one of the DOCUMENTED contract guards below —
never an internal engine crash (the empty-block join/aggregate/schema
bugs this round fixed were all of that class).

The tables are built once per session from sf0.001 heads; every query
runs in-process against the shared Ray session.
"""

import os
import shutil

import pyarrow.parquet as pq
import pytest
import ray.data

from dggrid4py_ray.pipelines.queries import QUERIES

_FACTS = {"orders", "lineitem", "events", "documents", "embeddings"}
_TABLES = ["region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings"]

# Queries whose operators REFUSE degenerate inputs by documented
# contract — the sweep asserts the guard fires cleanly (ValueError with
# the documented message), which is the designed behavior, not a crash.
_CONTRACT_GUARDS = {
    "hits_custsupp": "empty edge list",
    "labelprop_custsupp": "empty edge list",
    "pagerank_custsupp": "empty edge list",
    "ks_value_click_purchase": "one sample is empty",
    "moran_events": "occupied cells",
}


@pytest.fixture(scope="session")
def tiny_sf(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_sf"))
    for t in _TABLES:
        tab = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        tiny = tab.slice(0, 3) if t in _FACTS else tab
        pq.write_table(tiny, os.path.join(d, f"{t}.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_tiny_input_no_crash(name, tiny_sf):
    fn = QUERIES[name]
    guard = _CONTRACT_GUARDS.get(name)
    if guard is not None:
        with pytest.raises(ValueError, match=guard):
            res = fn(tiny_sf)
            if isinstance(res, ray.data.Dataset):
                res.to_pandas()
        return
    res = fn(tiny_sf)
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif hasattr(res, "to_pandas"):
        res = res.to_pandas()
    assert res is not None
