"""Round-5 regression tests for the round-4 ADVICE items.

1. graph.py int64-exact null fill (no float64 round-trip): node ids /
   score sums >= 2^53 must survive hits_scores and
   label_propagation_min bit-for-bit.
2. knn_join_via_buckets rejects growth <= 1 (would loop forever).
3. feather write/read round-trips a ZERO-BLOCK dataset.
4. compact_clustered / write_clustered write the version-ledger
   snapshot BEFORE swapping _zonemap.json (crash between the two must
   never leave the current version missing from the ledger).
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


BIG = (1 << 53) + 1          # not representable in float64 (rounds to 2^53)


class TestInt64ExactGraph:
    def test_hits_scores_int64_exact_big_ids(self, ray_session):
        from dggrid4py_ray.stages.graph import hits_scores

        # node BIG has an out-edge only; node BIG+2 an in-edge only —
        # both take the null-fill path on one of (hub, auth)
        edges = ray.data.from_pandas(pd.DataFrame({
            "u": np.array([BIG, 7], dtype=np.int64),
            "v": np.array([7, BIG + 2], dtype=np.int64)}))
        out = hits_scores(edges).to_pandas().set_index("node")
        assert BIG in out.index and BIG + 2 in out.index
        # the sink node's hub is null-filled to EXACTLY 0, int64 dtype
        assert out["hub"].dtype == np.int64
        assert out["auth"].dtype == np.int64
        assert out.loc[BIG + 2, "hub"] == 0
        assert out.loc[BIG, "auth"] == 0

    def test_label_propagation_big_labels_exact(self, ray_session):
        from dggrid4py_ray.stages.graph import label_propagation_min

        # component {BIG, BIG+1, BIG+2}: min label BIG must propagate
        # EXACTLY — a float64 round-trip would collapse BIG and BIG+1
        edges = ray.data.from_pandas(pd.DataFrame({
            "u": np.array([BIG, BIG + 1], dtype=np.int64),
            "v": np.array([BIG + 1, BIG + 2], dtype=np.int64)}))
        out = (label_propagation_min(edges, rounds=2).to_pandas()
               .set_index("node")["label"])
        assert out.dtype == np.int64
        assert int(out.loc[BIG]) == BIG
        assert int(out.loc[BIG + 1]) == BIG
        assert int(out.loc[BIG + 2]) == BIG

    def test_label_propagation_isolated_node_keeps_own_label(
            self, ray_session):
        from dggrid4py_ray.stages.graph import label_propagation_min

        # an edge list where one endpoint never appears as 'a' in the
        # nbr_min join exercises the null-coalesce lane
        edges = ray.data.from_pandas(pd.DataFrame({
            "u": np.array([5], dtype=np.int64),
            "v": np.array([9], dtype=np.int64)}))
        out = (label_propagation_min(edges, rounds=1).to_pandas()
               .set_index("node")["label"])
        assert int(out.loc[5]) == 5
        assert int(out.loc[9]) == 5


class TestKnnGrowthValidation:
    def test_rejects_growth_one(self, ray_session):
        from dggrid4py_ray.stages.join import knn_join_via_buckets

        pts = ray.data.from_pandas(pd.DataFrame(
            {"event_id": [1], "lon": [0.0], "lat": [0.0]}))
        sites = ray.data.from_pandas(pd.DataFrame(
            {"site_id": [1], "slon": [1.0], "slat": [1.0]}))
        with pytest.raises(ValueError, match="growth"):
            knn_join_via_buckets(pts, sites, k=1, growth=1.0)
        with pytest.raises(ValueError, match="growth"):
            knn_join_via_buckets(pts, sites, k=1, growth=0.5)
        with pytest.raises(ValueError, match="r0_km"):
            knn_join_via_buckets(pts, sites, k=1, r0_km=0.0)


class TestFeatherEmptyRoundtrip:
    def test_zero_block_dataset_roundtrips(self, ray_session, tmp_path):
        from dggrid4py_ray.sources.feather import (read_feather_dir,
                                                   write_feather_dir)

        ds = ray.data.from_pandas(pd.DataFrame(
            {"a": np.array([1, 2], dtype=np.int64)}))
        empty = ds.filter(lambda r: False)
        d = str(tmp_path / "fe")
        n = write_feather_dir(empty, d)
        assert n == 0
        man = json.load(open(os.path.join(d, "_manifest.json")))
        assert man["files"] == []
        back = read_feather_dir(d)
        assert back.count() == 0

    def test_nonempty_still_roundtrips(self, ray_session, tmp_path):
        from dggrid4py_ray.sources.feather import (read_feather_dir,
                                                   write_feather_dir)

        df = pd.DataFrame({"a": np.arange(10, dtype=np.int64),
                           "b": [f"s{i}" for i in range(10)]})
        d = str(tmp_path / "fe2")
        assert write_feather_dir(ray.data.from_pandas(df), d) == 10
        back = read_feather_dir(d).to_pandas().sort_values(
            "a", ignore_index=True)
        pd.testing.assert_frame_equal(back, df)


class TestLedgerBeforeSwap:
    def test_every_current_version_is_in_ledger(self, ray_session,
                                                tmp_path):
        from dggrid4py_ray.state.checkpoint import (
            compact_clustered, list_clustered_versions,
            read_clustered_version, write_clustered)

        d = str(tmp_path / "cl")
        df = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                           "x": np.arange(100, dtype=np.int64)})
        write_clustered(ray.data.from_pandas(df), d, "k",
                        rows_per_file=40)
        delta = ray.data.from_pandas(pd.DataFrame(
            {"k": np.array([5, 250], dtype=np.int64),
             "x": np.array([500, 501], dtype=np.int64)}))
        compact_clustered(d, delta, retain_history=True)
        cur = json.load(open(os.path.join(d, "_zonemap.json")))
        versions = list_clustered_versions(d)
        # the invariant the ADVICE fix establishes: the CURRENT version
        # always has a ledger snapshot (write order: ledger THEN swap)
        assert cur["version"] in versions
        ds_latest, man = read_clustered_version(d, cur["version"])
        assert man["version"] == cur["version"]
        got = ds_latest.to_pandas()
        # LSM append semantics: the delta row lands NEXT TO the base row
        assert sorted(got.loc[got["k"] == 5, "x"]) == [5, 500]
        assert int(got.loc[got["k"] == 250, "x"].iloc[0]) == 501
