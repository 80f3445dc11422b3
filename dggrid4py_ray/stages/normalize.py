"""Grouped standardization (z-score) — the feature-normalization step of
a training-data pipeline, two-pass and broadcast-joined.

Pass 1 computes per-group (n, sum, sum-of-squares) with a within-batch
combiner, so the groupby shuffles one row per (group, block).  The
group-stats table is GROUP-COUNT-sized; it is collected on the driver and
broadcast via ``ray.put`` — valid for bounded group cardinality (1e6
groups = ~32 MB; for unbounded keys route through a cogroup join
instead, the ``stages/join`` shape).  Pass 2 is a pure map.

Population variance uses sumsq/n - mean^2; with float64 partials the
cancellation error is ~1e-15 relative at any realistic feature scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def group_stats(ds: ray.data.Dataset, key: str, col: str) -> pd.DataFrame:
    """Per-group n/mean/std (population) via combiner + tiny groupby."""
    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        pdf = pd.DataFrame({key: batch[key].to_pandas(), "x": x,
                            "x2": x * x, "one": np.int64(1)})
        g = pdf.groupby(key, sort=False).agg(
            s=("x", "sum"), s2=("x2", "sum"), n=("one", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(key).aggregate(Sum("s", alias_name="s"),
                                     Sum("s2", alias_name="s2"),
                                     Sum("n", alias_name="n"))).to_pandas()
    agg["mean"] = agg["s"] / agg["n"]
    agg["std"] = np.sqrt(np.maximum(agg["s2"] / agg["n"]
                                    - agg["mean"] ** 2, 0.0))
    return agg[[key, "n", "mean", "std"]]


class _ZScorer:
    def __init__(self, stats_ref, key: str, col: str, out_col: str):
        st = ray.get(stats_ref)
        self.mean = dict(zip(st[0], st[1]))
        self.std = dict(zip(st[0], st[2]))
        self.key, self.col, self.out = key, col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = pd.Series(batch[self.key].to_pandas())
        x = batch[self.col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = k.map(self.mean).to_numpy(dtype=np.float64)
        s = k.map(self.std).to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(s > 0, (x - m) / s, 0.0)
        return batch.append_column(self.out, pa.array(z))


def group_zscore(ds: ray.data.Dataset, key: str, col: str,
                 out_col: str = "z", concurrency=None) -> ray.data.Dataset:
    """Append ``out_col`` = (col - group mean) / group std (0 for
    zero-variance groups).  Deterministic at any parallelism."""
    st = group_stats(ds, key, col)
    ref = ray.put((st[key].tolist(), st["mean"].tolist(),
                   st["std"].tolist()))
    return ds.map_batches(_ZScorer, fn_constructor_args=(ref, key, col, out_col),
                          batch_format="pyarrow",
                          concurrency=concurrency or (1, 32))
