"""hash_sample + HyperLogLog (stages/sampling.py)."""

import numpy as np
import pyarrow as pa


def test_hash_sample_deterministic(ray_session):
    import ray.data
    from dggrid4py_ray.stages.sampling import hash_sample
    ds = ray.data.range(5000).map_batches(
        lambda t: pa.table({"k": t["id"]}), batch_format="pyarrow")
    a = hash_sample(ds, "k", keep=10, buckets=100).to_pandas()
    b = hash_sample(ray.data.range(5000).map_batches(
        lambda t: pa.table({"k": t["id"]}), batch_format="pyarrow"),
        "k", keep=10, buckets=100).to_pandas()
    assert sorted(a["k"]) == sorted(b["k"])          # run-to-run stable
    assert 0.06 < len(a) / 5000 < 0.14               # ~10% rate


def test_hll_accuracy_and_parallel_determinism(ray_session):
    import ray.data
    from dggrid4py_ray.stages.sampling import hll_distinct
    n = 20000
    ds = ray.data.range(n, override_num_blocks=8).map_batches(
        lambda t: pa.table({"k": t["id"].to_numpy() % 7333}), batch_format="pyarrow")
    est = hll_distinct(ds, "k", p=12)
    assert abs(est - 7333) / 7333 < 0.05             # ~1.6% typical at p=12
    # different partitioning, same registers -> identical estimate
    ds2 = ray.data.range(n, override_num_blocks=3).map_batches(
        lambda t: pa.table({"k": t["id"].to_numpy() % 7333}), batch_format="pyarrow")
    assert hll_distinct(ds2, "k", p=12) == est
