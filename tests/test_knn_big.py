"""Large-large kNN join: expanding-radius path vs broadcast reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from dggrid4py_ray.stages.join import (knn_join_broadcast,
                                       knn_join_via_buckets)


def _random_world(n, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-180, 180, n),
        "lat": np.degrees(np.arcsin(rng.uniform(-1, 1, n)))})


def _as_sites(df):
    return df.rename(columns={"event_id": "site_id", "lon": "slon",
                              "lat": "slat"})


def test_knn_buckets_matches_broadcast_multi_round():
    """Tiny r0 forces several expansion rounds (incl. zero-candidate
    points in round 1); results must equal the broadcast exact kNN."""
    pts = _random_world(400, 3)
    sites = _as_sites(_random_world(25, 4))

    got = knn_join_via_buckets(
        ray.data.from_pandas(pts).repartition(5),
        ray.data.from_pandas(sites), k=3,
        r0_km=50.0, growth=4.0).to_pandas() \
        .sort_values(["event_id", "rank"], ignore_index=True)

    ref = knn_join_broadcast(
        ray.data.from_pandas(pts),
        list(zip(sites["site_id"], sites["slat"], sites["slon"])),
        k=3).to_pandas().sort_values(["event_id", "rank"],
                                     ignore_index=True)

    assert got["event_id"].tolist() == ref["event_id"].tolist()
    assert got["site_id"].tolist() == ref["site_id"].tolist()
    assert got["rank"].tolist() == ref["rank"].tolist()
    np.testing.assert_allclose(got["dist_km"].to_numpy(),
                               ref["dist_km"].to_numpy(), rtol=1e-12)


def test_knn_buckets_k_exceeds_sites():
    """k > n_sites terminates at the global round with n_sites rows per
    point (the SQL twin's behavior)."""
    pts = _random_world(50, 5)
    sites = _as_sites(_random_world(2, 6))
    out = knn_join_via_buckets(ray.data.from_pandas(pts),
                               ray.data.from_pandas(sites), k=5,
                               r0_km=100.0).to_pandas()
    assert len(out) == 50 * 2
    assert out.groupby("event_id")["rank"].max().eq(2).all()


def test_knn_buckets_rejects_bad_k():
    pts = _random_world(5, 7)
    sites = _as_sites(_random_world(2, 8))
    with pytest.raises(ValueError, match="k must be"):
        knn_join_via_buckets(ray.data.from_pandas(pts),
                             ray.data.from_pandas(sites), k=0)
