"""Unit tests for the Ray 2.49 empty-input schema patches
(`dggrid4py_ray/_raypatch.py`) — one test per leak point, plus the
join_safe empty-side semantics across join types.

Each test drives STOCK Ray Data surfaces (map_batches / sort / groupby /
repartition / map_groups / to_pandas / join) over datasets that become
empty mid-pipeline, and asserts the SCHEMA survives — the property every
aggregate->join chain and driver-side column access depends on.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

import dggrid4py_ray  # noqa: F401  (installs the patches)
from dggrid4py_ray.stages.join import join_safe


def _typed_empty(ray_session):
    ds = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 2], pa.int64()), "x": pa.array([2.0, 3.0])}))
    return ds.map_batches(
        lambda t: t.filter(pa.array([False] * t.num_rows)),
        batch_format="pyarrow")


def _block_schemas(ds):
    out = []
    for b in ds.materialize().iter_internal_ref_bundles():
        for ref, meta in b.blocks:
            t = ray.get(ref)
            if isinstance(t, pd.DataFrame):
                out.append((len(t), sorted(t.columns)))
            else:
                out.append((t.num_rows, sorted(t.schema.names)))
    return out


def test_patch_is_active(ray_session):
    assert dggrid4py_ray.RAY_EMPTY_BLOCK_PATCH_ACTIVE


def test_map_chain_schema_evolves_on_empty(ray_session):
    empty = _typed_empty(ray_session)
    evolved = empty.map_batches(
        lambda t: pa.table({"k2": pc.add(t["k"], 1), "y": t["x"]}),
        batch_format="pyarrow")
    for n, cols in _block_schemas(evolved):
        assert n == 0 and cols == ["k2", "y"]


def test_sort_preserves_schema_on_empty(ray_session):
    srt = _typed_empty(ray_session).sort(["k"])
    for n, cols in _block_schemas(srt):
        assert n == 0 and cols == ["k", "x"]


def test_hash_aggregate_preserves_schema_on_empty(ray_session):
    from ray.data.aggregate import Sum
    agg = _typed_empty(ray_session).groupby("k") \
        .aggregate(Sum("x", alias_name="s"))
    schemas = _block_schemas(agg)
    assert schemas, "aggregate produced no blocks"
    for n, cols in schemas:
        assert n == 0 and cols == ["k", "s"]


def test_repartition_padding_is_typed(ray_session):
    rep = _typed_empty(ray_session).repartition(4)
    schemas = _block_schemas(rep)
    assert len(schemas) == 4
    for n, cols in schemas:
        assert n == 0 and cols == ["k", "x"]


def test_map_groups_runs_udf_on_typed_empty(ray_session):
    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = _typed_empty(ray_session).groupby("k") \
        .map_groups(f, batch_format="pandas")
    schemas = _block_schemas(out)
    assert schemas
    for n, cols in schemas:
        assert n == 0 and cols == ["k", "rank", "x"]


def test_to_pandas_empty_keeps_columns(ray_session):
    df = _typed_empty(ray_session).to_pandas()
    assert len(df) == 0
    assert sorted(df.columns) == ["k", "x"]


def test_sort_map_groups_chain(ray_session):
    # the exact topk_per_group shape that crashed q10 at tiny inputs
    def f(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(3)

    out = (_typed_empty(ray_session).groupby("k")
           .map_groups(f, batch_format="pandas")
           .repartition(4))
    sub = out.to_pandas()
    assert sorted(sub.columns) == ["k", "x"]


class TestJoinSafeEmptySides:
    def _sides(self):
        right = ray.data.from_arrow(pa.table(
            {"k": pa.array([1, 2], pa.int64()),
             "v": pa.array([10, 20], pa.int64())}))
        left = ray.data.from_arrow(pa.table(
            {"k": pa.array([1, 3], pa.int64()),
             "x": pa.array([7, 8], pa.int64())}))
        lempty = ray.data.from_arrow(pa.table(
            {"k": pa.array([], pa.int64()), "x": pa.array([], pa.int64())}))
        rempty = ray.data.from_arrow(pa.table(
            {"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
        return left, right, lempty, rempty

    def test_inner_empty_left(self, ray_session):
        _, right, lempty, _ = self._sides()
        out = join_safe(lempty, right, join_type="inner",
                        num_partitions=4, on=("k",)).to_pandas()
        assert len(out) == 0

    def test_left_outer_empty_right_null_extends(self, ray_session):
        left, _, _, rempty = self._sides()
        out = join_safe(left, rempty, join_type="left_outer",
                        num_partitions=4, on=("k",)).to_pandas()
        assert len(out) == 2
        assert sorted(out.columns) == ["k", "v", "x"]
        assert out["v"].isna().all()

    def test_left_anti_empty_right_keeps_all(self, ray_session):
        left, _, _, rempty = self._sides()
        out = join_safe(left, rempty, join_type="left_anti",
                        num_partitions=4, on=("k",)).to_pandas()
        assert sorted(out["k"]) == [1, 3]

    def test_left_semi_empty_right_is_empty(self, ray_session):
        left, _, _, rempty = self._sides()
        out = join_safe(left, rempty, join_type="left_semi",
                        num_partitions=4, on=("k",)).to_pandas()
        assert len(out) == 0

    def test_both_empty(self, ray_session):
        _, _, lempty, rempty = self._sides()
        out = join_safe(lempty, rempty, join_type="inner",
                        num_partitions=4, on=("k",)).to_pandas()
        assert len(out) == 0

    def test_non_empty_unchanged(self, ray_session):
        left, right, _, _ = self._sides()
        out = join_safe(left, right, join_type="inner",
                        num_partitions=4, on=("k",)).to_pandas()
        assert out.to_dict("records") == [{"k": 1, "x": 7, "v": 10}]

    def test_right_on_key_mapping(self, ray_session):
        left, _, _, _ = self._sides()
        rempty = ray.data.from_arrow(pa.table(
            {"rk": pa.array([], pa.int64()),
             "v": pa.array([], pa.int64())}))
        out = join_safe(left, rempty, join_type="left_outer",
                        num_partitions=4, on=("k",),
                        right_on=("rk",)).to_pandas()
        assert len(out) == 2 and "v" in out.columns

    def test_pandas_block_side(self, ray_session):
        # from_pandas sources produce pandas blocks — the ref-level
        # cleanup must rebuild through the pandas path
        left = ray.data.from_pandas(pd.DataFrame(
            {"k": np.array([1, 2], np.int64),
             "x": np.array([5, 6], np.int64)}))
        right = ray.data.from_pandas(pd.DataFrame(
            {"k": np.array([2], np.int64),
             "v": np.array([9], np.int64)}))
        out = join_safe(left, right, join_type="inner",
                        num_partitions=4, on=("k",)).to_pandas()
        assert out.to_dict("records") == [{"k": 2, "x": 6, "v": 9}]


def test_schemaless_blocks_dropped_before_join(ray_session):
    # a sort-derived input whose padding blocks used to be zero-column:
    # the join must not see them
    ds = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 2, 3], pa.int64()),
         "x": pa.array([1.0, 2.0, 3.0])})).sort(["k"])
    right = ray.data.from_arrow(pa.table(
        {"k": pa.array([2], pa.int64()), "v": pa.array([5], pa.int64())}))
    out = join_safe(ds, right, join_type="inner", num_partitions=8,
                    on=("k",)).to_pandas()
    assert out.to_dict("records") == [{"k": 2, "x": 2.0, "v": 5}]


class TestJoinSafeOuterVerbs:
    """right_outer / full_outer with an empty side — the per-batch local
    join must null-extend exactly like a populated join would."""

    def _sides(self):
        left = ray.data.from_arrow(pa.table(
            {"k": pa.array([1, 3], pa.int64()),
             "x": pa.array([7, 8], pa.int64())}))
        rempty = ray.data.from_arrow(pa.table(
            {"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
        lempty = ray.data.from_arrow(pa.table(
            {"k": pa.array([], pa.int64()), "x": pa.array([], pa.int64())}))
        right = ray.data.from_arrow(pa.table(
            {"k": pa.array([2], pa.int64()), "v": pa.array([9], pa.int64())}))
        return left, right, lempty, rempty

    def test_full_outer_empty_right_keeps_left(self, ray_session):
        left, _, _, rempty = self._sides()
        out = join_safe(left, rempty, join_type="full_outer",
                        num_partitions=4, on=("k",)).to_pandas()
        assert sorted(out["k"]) == [1, 3]
        assert out["v"].isna().all()

    def test_full_outer_empty_left_keeps_right(self, ray_session):
        _, right, lempty, _ = self._sides()
        out = join_safe(lempty, right, join_type="full_outer",
                        num_partitions=4, on=("k",)).to_pandas()
        assert sorted(out["k"]) == [2]
        assert out["x"].isna().all()

    def test_right_outer_empty_left_keeps_right(self, ray_session):
        _, right, lempty, _ = self._sides()
        out = join_safe(lempty, right, join_type="right_outer",
                        num_partitions=4, on=("k",)).to_pandas()
        assert sorted(out["k"]) == [2]
        assert out["x"].isna().all()

    def test_right_outer_empty_right_is_empty(self, ray_session):
        left, _, _, rempty = self._sides()
        out = join_safe(left, rempty, join_type="right_outer",
                        num_partitions=4, on=("k",)).to_pandas()
        assert len(out) == 0
