"""High-cardinality grouped reduction (sort + segmented reduce).

Ray Data's hash ``groupby().aggregate()`` burns ~150-370 CPU-s per million
distinct keys (measured, see ROUND2_NOTES) — fine for bounded key spaces
(nations, languages, coarse cells), catastrophic for per-document keys
(dedup hashes, res-9+ cell universes).  ``grouped_reduce`` keeps the same
semantics with one range sort instead:

1. ``ds.sort(key)`` — the single wide op; Ray's range sort scales with
   block count, not key cardinality.
2. per sorted block: vectorized pandas groupby reduce (sum/min/max).  Each
   block's first and last key may continue into the neighbor block, so those
   rows are flagged as *boundary* rows.
3. only the boundary rows (≤ 2 per block) go through the real hash
   Aggregate; interior rows are already final.  The union is the result.

The post-combine per-block partials are materialized once so the two
branches (interior filter / boundary aggregate) don't re-execute the sort.
The materialized set is one row per (block, distinct-key-run) — the size of
the *answer*, not the input — and spills to the object store at scale.

All reductions here are associative (sum/min/max), so the block-local +
boundary-final decomposition is exact.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min, Sum

_AGGS = {"sum": Sum, "min": Min, "max": Max}


def grouped_reduce(ds: ray.data.Dataset, key, col_map: dict,
                   how: dict | str = "sum") -> ray.data.Dataset:
    """Group ``ds`` on ``key`` (str or list[str]) and reduce the columns in
    ``col_map`` ({input_col: output_col}); ``how`` is a single reduction name
    or {input_col: "sum"|"min"|"max"}.  Output columns: key + renamed
    reductions."""
    keys = [key] if isinstance(key, str) else list(key)
    in_cols = list(col_map)
    if isinstance(how, str):
        how = {c: how for c in in_cols}

    srt = ds.sort(keys)

    def block_reduce(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # typed zero-row table: pd->Arrow on an empty groupby yields a
            # ZERO-COLUMN table, and such schema-less blocks poison every
            # downstream Arrow hash join ("no match for FieldRef")
            return (batch.select(keys + in_cols)
                    .append_column("_b", pa.array([], pa.bool_())))
        cols = {k: batch[k].to_numpy(zero_copy_only=False) for k in keys}
        for c in in_cols:
            cols[c] = batch[c].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(cols)
        g = df.groupby(keys, sort=True).agg({c: how[c] for c in in_cols}).reset_index()
        b = pd.Series(False, index=g.index)
        if len(g):
            b.iloc[0] = True
            b.iloc[-1] = True
        g["_b"] = b
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = srt.map_batches(block_reduce, batch_format="pyarrow").materialize()
    interior = parts.map_batches(
        lambda t: t.filter(pc.invert(t["_b"])).drop_columns(["_b"]),
        batch_format="pyarrow")
    boundary = parts.map_batches(
        lambda t: t.filter(t["_b"]).drop_columns(["_b"]), batch_format="pyarrow")
    bagg = boundary.groupby(key if isinstance(key, str) else keys).aggregate(
        *[_AGGS[how[c]](c, alias_name=c) for c in in_cols])
    # boundary aggregate holds <=2 rows per sorted block — without the
    # coalesce its dozens of near-empty aggregate output blocks union into
    # the result and COMPOUND across chained grouped_reduce calls (block
    # count doubled per fold in the rollup pyramid, and per-block fixed
    # costs dominated).  One block is always right for answer-sized data.
    bagg = bagg.repartition(1)
    merged = interior.union(bagg)

    return merged.map_batches(
        lambda t: t.select(keys + in_cols).rename_columns(
            keys + [col_map[c] for c in in_cols]),
        batch_format="pyarrow")
