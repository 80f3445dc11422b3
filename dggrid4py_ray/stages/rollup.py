"""Hierarchical multi-resolution aggregation (rollup) over grid cells.

The reference's binning operators produce ONE resolution per run
(BIN_POINT_VALS, reference dggrid_runner.py:1025-1118); analytics and
tile-serving pipelines usually want the whole pyramid (res-9 counts,
then 8, 7, ... for coarse views).  Instead of re-binning the raw points
once per level (L full input scans), ``hierarchical_rollup`` consumes
the FINEST-level aggregate once and folds it upward: each level is a
grouped reduction over the previous level's output, whose row count
shrinks geometrically (factor 7 for IGEO7 Z7 parents, 4 for a lat/lon
bisection pyramid).  Beyond the finest bin the total extra work is
~n_cells * (1/7 + 1/49 + ...) ≈ n_cells/6 rows — noise at any corpus
size, and each fold's shuffle is the sort-based ``grouped_reduce``
(stages/groupagg), so no high-cardinality hash Aggregate appears even
at res-12 cell universes.

Only decomposable aggregates fold correctly (sum/count via sum; min;
max); carry means as (sum, count) and divide at the end.

Semantics note for hexagonal apertures: aperture-7 hexagons are NOT
perfectly nested, so a coarser pyramid level is "finest cells grouped by
their Z7 ancestor" (the H3 hierarchical-aggregation semantic), which can
differ near cell boundaries from re-binning the raw points at the
coarser resolution.  Conservation (every level carries all points and
value mass) holds exactly; boundary reassignment does not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..dggs import igeo7 as ig
from .groupagg import grouped_reduce


def hierarchical_rollup(ds: ray.data.Dataset, cell_col: str, sum_cols: list,
                        parent_fn, levels: int, level_col: str = "level",
                        start_level: int = 0, level_step: int = 1,
                        key_bounds: list | None = None) -> ray.data.Dataset:
    """Fold a finest-level per-cell aggregate up ``levels`` times.

    ``ds`` holds one row per finest cell: ``cell_col`` plus the
    sum-foldable columns ``sum_cols``.  ``parent_fn(cells: np.ndarray)
    -> np.ndarray`` maps each cell id to its parent at the next coarser
    level (applied once per fold).  Returns the union of all levels with
    ``level_col`` = start_level, start_level+level_step, ... (finest
    first).  The input ``ds`` is materialized once so the finest level
    isn't recomputed per fold; each materialized fold is cell-count
    sized, never point-count sized.

    ``key_bounds[k-1]`` (optional) is an upper bound on the distinct
    parent keys produced by fold ``k``.  Same crossover rule as
    bin_point_vals: a bounded key universe <=100k uses Ray's hash
    Aggregate (one tiny exchange, no sort overhead); unbounded or larger
    folds use the sort-based grouped_reduce so no high-cardinality hash
    Aggregate ever appears (res-12 Z7 universes are ~10^12 cells)."""
    from ray.data.aggregate import Sum

    def tag(level: int):
        def add(batch: pa.Table) -> pa.Table:
            lv = pa.array(np.full(batch.num_rows, level, dtype=np.int64))
            return batch.append_column(level_col, lv)
        return add

    def reparent(batch: pa.Table) -> pa.Table:
        cells = batch[cell_col].to_numpy(zero_copy_only=False)
        out = parent_fn(cells)
        i = batch.schema.get_field_index(cell_col)
        return batch.set_column(i, cell_col, pa.array(out))

    cur = ds.materialize()
    out = cur.map_batches(tag(start_level), batch_format="pyarrow")
    for k in range(1, levels + 1):
        reparented = cur.map_batches(reparent, batch_format="pyarrow")
        bound = key_bounds[k - 1] if key_bounds and k <= len(key_bounds) \
            else None
        if bound is not None and bound <= 100_000:
            folded = reparented.groupby(cell_col).aggregate(
                *[Sum(c, alias_name=c) for c in sum_cols])
            # <=100k rows fit one block; dozens of near-empty aggregate
            # output blocks would tax every downstream stage.
            folded = folded.repartition(1)
        else:
            folded = grouped_reduce(reparented, key=cell_col,
                                    col_map={c: c for c in sum_cols},
                                    how="sum")
        cur = folded.materialize()
        # levels shrink geometrically; keep block count proportional to
        # rows (~1M rows/block) so later folds' sorts don't pay per-block
        # fixed costs for near-empty blocks.
        want = max(1, min(cur.num_blocks(), cur.count() // 1_000_000 + 1))
        if cur.num_blocks() > 2 * want:
            cur = cur.repartition(want).materialize()
        out = out.union(cur.map_batches(tag(start_level + k * level_step),
                                        batch_format="pyarrow"))
    return out


def rollup_z7(ds: ray.data.Dataset, cell_col: str, sum_cols: list,
              from_res: int, to_res: int,
              level_col: str = "res") -> ray.data.Dataset:
    """IGEO7/Z7 pyramid: fold a per-cell aggregate at ``from_res`` up to
    ``to_res`` via the Z7 parent law (one aperture-7 digit strip per
    level — dggs/igeo7.z7_parent, pure uint64 bit math, no lookup).  The
    ``level_col`` carries the actual resolution of each output row."""
    if to_res > from_res:
        raise ValueError("to_res must be <= from_res")

    def parent(cells: np.ndarray) -> np.ndarray:
        # Z7 ids use the full 64-bit range; keep the source column's dtype
        # so folded levels union cleanly with the tagged finest level.
        z = cells.astype(np.uint64, copy=False)
        return ig.z7_parent(z).astype(cells.dtype, copy=False)

    # Distinct parent keys at fold k are bounded by the closed-form cell
    # count at resolution from_res-k (10*7^r + 2 for aperture 7).
    bounds = [10 * 7 ** r + 2 for r in range(from_res - 1, to_res - 1, -1)]
    return hierarchical_rollup(ds, cell_col, sum_cols, parent,
                               levels=from_res - to_res,
                               level_col=level_col, start_level=from_res,
                               level_step=-1, key_bounds=bounds)
