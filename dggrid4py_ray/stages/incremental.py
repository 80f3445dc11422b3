"""Incremental materialized-view maintenance for additive grouped
aggregates (count / sum — the self-maintainable class).

``refresh_grouped_view`` folds a CDC delta stream into a stored
aggregate WITHOUT rescanning the base fact table: refresh cost is
O(|delta| + |touched groups|), the defining property of incremental
view maintenance (Gupta & Mumick 1995's additive case).  Retractions
are just delta rows with negative count/sum contributions.

Scale shape: the delta is pre-aggregated inside ``map_batches`` (one
partial row per touched group per batch), unioned with the stored view
(already one row per group), and reduced with ``grouped_reduce`` — one
sort-based exchange over (touched groups + view rows), never the fact
table.  Groups whose refreshed count reaches zero are dropped (fully
retracted).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .groupagg import grouped_reduce


def delta_partials(delta: ray.data.Dataset, keys: list[str],
                   sum_cols: dict[str, str], count_col: str = "n",
                   sign: int = 1) -> ray.data.Dataset:
    """Per-batch combiner: collapse a CDC delta stream to one partial
    row per (batch, group) with count + sums, multiplied by ``sign``
    (+1 inserts, -1 deletes)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + list(sum_cols)).to_pandas()
        g = df.groupby(keys, sort=False, dropna=False)
        agg = g.agg({c: "sum" for c in sum_cols})
        agg[count_col] = g.size()
        agg = agg.reset_index()
        for c, out in sum_cols.items():
            agg[out] = sign * agg.pop(c)
        agg[count_col] = sign * agg[count_col]
        return pa.Table.from_pandas(agg, preserve_index=False)

    return delta.map_batches(partial, batch_format="pyarrow")


def refresh_grouped_view(view: ray.data.Dataset, delta: ray.data.Dataset,
                         keys: list[str], sum_cols: dict[str, str],
                         count_col: str = "n",
                         sign: int = 1) -> ray.data.Dataset:
    """New view = stored ``view`` (one row per group: keys + renamed sums
    + count) merged with the ``delta`` fact rows (raw, un-aggregated;
    columns = keys + the *input* columns of ``sum_cols``).  Groups whose
    refreshed count is zero disappear (exact retraction semantics for
    the additive class)."""
    d = delta_partials(delta, keys, sum_cols, count_col, sign)
    merged = view.union(d)
    out_cols = {out: out for out in sum_cols.values()}
    out_cols[count_col] = count_col
    ref = grouped_reduce(merged, keys, out_cols, how="sum")
    return ref.filter(expr=f"{count_col} != 0")
