"""hash_sample + HyperLogLog (stages/sampling.py)."""

import numpy as np
import pytest
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


def test_weighted_sample_deterministic_and_biased(ray_session):
    import ray.data
    import pandas as pd
    from dggrid4py_ray.stages.sampling import weighted_sample

    n = 2000
    df = pd.DataFrame({"id": np.arange(n),
                       "w": np.where(np.arange(n) < 100, 1000.0, 1.0)})
    ds = ray.data.from_pandas(df).repartition(6)
    s1 = weighted_sample(ds, "id", "w", k=50).to_pandas()
    s2 = weighted_sample(ds, "id", "w", k=50).to_pandas()
    assert len(s1) == 50
    # pure function of (key, weight): identical across runs
    assert sorted(s1["id"]) == sorted(s2["id"])
    # the 100 heavy rows (1000x weight) should dominate the sample
    assert (s1["id"] < 100).sum() > 35

    with pytest.raises(Exception):
        bad = df.copy()
        bad.loc[0, "w"] = 0.0
        weighted_sample(ray.data.from_pandas(bad), "id", "w", k=5).to_pandas()


def test_heavy_hitters_exact_regime(ray_session):
    import ray.data
    import pandas as pd
    from dggrid4py_ray.stages.sampling import heavy_hitters

    vals = np.repeat(np.arange(50), np.arange(50, 0, -1))  # 0 x50, 1 x49...
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    out = heavy_hitters(ds, "v", k=5, capacity=1000).to_pandas()
    assert list(out["v"]) == [0, 1, 2, 3, 4]
    assert list(out["cnt"]) == [50, 49, 48, 47, 46]
    assert (out["err"] == 0).all()


def test_heavy_hitters_approx_bounds(ray_session):
    import ray.data
    import pandas as pd
    from dggrid4py_ray.stages.sampling import heavy_hitters

    rng = np.random.default_rng(3)
    # zipf-ish skew: a few hot keys + a long tail wider than the capacity
    hot = np.repeat(np.arange(5), 2000)
    tail = rng.integers(100, 20000, 30000)
    vals = np.concatenate([hot, tail])
    rng.shuffle(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
    out = heavy_hitters(ds, "v", k=5, capacity=256).to_pandas()
    err = int(out["err"].iloc[0])
    assert err > 0                       # genuinely in the approximate regime
    # MG guarantee: hot keys (true 2000 >> err) are all present, and each
    # estimate is within [true - err, true]
    assert set(out["v"]) == {0, 1, 2, 3, 4}
    assert ((out["cnt"] <= 2000) & (out["cnt"] >= 2000 - err)).all()


def test_heavy_hitters_tie_offset_not_lost(ray_session):
    import ray.data
    import pandas as pd
    from dggrid4py_ray.stages.sampling import heavy_hitters

    # batch 1: capacity+1 distinct values, ALL tied at count 5 -> the
    # compression keeps no real rows; its offset (5) must still reach err
    b1 = np.repeat(np.arange(100, 109), 5)        # 9 values x5, capacity 8
    b2 = np.repeat([0], 10)
    ds1 = ray.data.from_pandas(pd.DataFrame({"v": b1}))
    ds2 = ray.data.from_pandas(pd.DataFrame({"v": b2}))
    out = heavy_hitters(ds1.union(ds2), "v", k=3, capacity=8).to_pandas()
    err = int(out["err"].iloc[0])
    assert err >= 5                                # batch-1 offset preserved
    top = out.iloc[0]
    assert top["v"] == 0 and top["cnt"] <= 10 <= top["cnt"] + err


def test_stratified_sample_rates_and_determinism(ray_session):
    import ray.data
    import pandas as pd
    from dggrid4py_ray.stages.sampling import stratified_sample

    n = 6000
    df = pd.DataFrame({"id": np.arange(n),
                       "g": np.where(np.arange(n) % 3 == 0, "a", "b")})
    ds = ray.data.from_pandas(df).repartition(5)
    out = stratified_sample(ds, "id", "g", rates={"a": 100, "b": 10}) \
        .to_pandas()
    a = (out["g"] == "a").sum(); b = (out["g"] == "b").sum()
    assert a == 2000                      # rate 100/100 keeps group whole
    assert 250 < b < 550                  # ~10% of 4000
    out2 = stratified_sample(ds, "id", "g", rates={"a": 100, "b": 10}) \
        .to_pandas()
    assert sorted(out2["id"]) == sorted(out["id"])   # pure function
    # default_keep=0 drops unlisted groups entirely
    out3 = stratified_sample(ds, "id", "g", rates={"a": 100}).to_pandas()
    assert set(out3["g"]) == {"a"}


def test_epoch_shuffle_deterministic_and_epoch_dependent(ray_session):
    import ray.data
    import pandas as pd
    from dggrid4py_ray.stages.sampling import epoch_shuffle

    df = pd.DataFrame({"id": np.arange(500), "payload": np.arange(500) * 2})
    ds = ray.data.from_pandas(df).repartition(7)
    o1 = epoch_shuffle(ds, "id", epoch=1).to_pandas()
    # a permutation of the input, payload stays attached to its key
    assert sorted(o1["id"]) == list(range(500))
    assert (o1["payload"].to_numpy() == o1["id"].to_numpy() * 2).all()
    # not the identity order, and stable across parallelism
    assert list(o1["id"]) != list(range(500))
    o1b = epoch_shuffle(ds.repartition(2), "id", epoch=1).to_pandas()
    assert list(o1b["id"]) == list(o1["id"])
    # a different epoch is a different permutation
    o2 = epoch_shuffle(ds, "id", epoch=2).to_pandas()
    assert list(o2["id"]) != list(o1["id"])
    # fast lane: same guarantees, different permutation family
    of = epoch_shuffle(ds, "id", epoch=1, hash="fast").to_pandas()
    assert sorted(of["id"]) == list(range(500))
    ofb = epoch_shuffle(ds.repartition(3), "id", epoch=1,
                        hash="fast").to_pandas()
    assert list(ofb["id"]) == list(of["id"])


def test_epoch_shuffle_matches_duckdb_order(ray_session):
    import duckdb
    import ray.data
    import pandas as pd
    from dggrid4py_ray.stages.sampling import epoch_shuffle

    df = pd.DataFrame({"id": np.arange(200)})
    ds = ray.data.from_pandas(df).repartition(4)
    ours = epoch_shuffle(ds, "id", epoch=3).to_pandas()["id"].tolist()
    want = duckdb.sql(
        "SELECT id FROM df ORDER BY "
        "md5_number_upper('3:' || CAST(id AS VARCHAR)), id"
    ).fetchdf()["id"].tolist()
    assert ours == want


def test_hll_by_group_matches_ungrouped_and_is_partition_stable(ray_session):
    import ray.data
    from dggrid4py_ray.stages.sampling import hll_distinct, hll_distinct_by_group

    # three groups with very different cardinalities (one tiny = linear
    # counting regime, one large = raw-estimate regime)
    n = 30000
    rng = np.random.default_rng(7)
    g = rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1])
    k = np.where(g == "a", rng.integers(0, 9000, n),
                 np.where(g == "b", rng.integers(0, 800, n),
                          rng.integers(0, 12, n)))
    t = pa.table({"g": pa.array(g), "k": pa.array(k.astype(np.int64))})
    ds = ray.data.from_arrow(t).repartition(9)
    out = hll_distinct_by_group(ds, "k", "g", p=12).to_pandas() \
        .sort_values("g", ignore_index=True)
    # grouped estimate must equal the ungrouped sketch run on each slice
    import ray.data as rd
    for i, grp in enumerate(["a", "b", "c"]):
        sub = t.filter(pa.compute.equal(t["g"], grp))
        ref = hll_distinct(rd.from_arrow(sub), "k", p=12)
        assert out["approx_distinct"].iloc[i] == ref
        exact = len(np.unique(sub["k"].to_numpy()))
        assert abs(out["approx_distinct"].iloc[i] - exact) / max(exact, 1) < 0.06
    # partitioning must not change the estimates
    out2 = hll_distinct_by_group(ray.data.from_arrow(t).repartition(2),
                                 "k", "g", p=12).to_pandas() \
        .sort_values("g", ignore_index=True)
    assert (out["approx_distinct"].to_numpy()
            == out2["approx_distinct"].to_numpy()).all()
