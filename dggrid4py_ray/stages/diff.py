"""Snapshot diff (change-data-capture) between two table versions.

``table_diff(left, right, key_cols, value_cols)`` classifies every key as
``added`` (right only), ``removed`` (left only) or ``changed`` (present in
both with different values); unchanged keys are dropped.  The incremental
backbone of a 100-TB pipeline: re-running yesterday's corpus against
today's and touching only the delta.

Scale shape: neither snapshot's payload ever shuffles.  Each side is
reduced per batch to (key..., side counts, value fingerprint) — the
fingerprint is the vectorized 64-bit polynomial hash from
``stages/hashing`` combined across value columns with distinct seeds — and
ONE ``grouped_reduce`` (sort + segmented sum + boundary aggregate, no
high-cardinality hash aggregate) merges both sides.  Classification is a
pure vectorized map over the merged fingerprint rows.

Contract: keys must be unique within each snapshot (CDC semantics); a
duplicate key raises rather than silently mis-classifying.  A fingerprint
collision between the OLD and NEW value of one key (p ~ 2^-64 per changed
key) would mask that key's change; across-key collisions are irrelevant
because comparison is always within a key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .hashing import hash64
from .groupagg import grouped_reduce

_CNT_COLS = ["_lcnt", "_rcnt", "_lfp", "_rfp"]


def _row_fingerprint(t: pa.Table, value_cols: list) -> np.ndarray:
    """Combined 64-bit fingerprint of the value columns (order-sensitive:
    column i hashed with seed i, mixed by a distinct odd multiplier)."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, c in enumerate(value_cols):
            h = h * np.uint64(0x9E3779B97F4A7C15) + hash64(t[c], seed=i + 1)
    return h


def _tagged(ds: ray.data.Dataset, key_cols: list, value_cols: list,
            side: str) -> ray.data.Dataset:
    l = side == "l"

    def prep(t: pa.Table) -> pa.Table:
        n = t.num_rows
        fp = _row_fingerprint(t, value_cols).view(np.int64)
        one = np.ones(n, dtype=np.int64)
        zero = np.zeros(n, dtype=np.int64)
        cols = {k: t[k] for k in key_cols}
        cols["_lcnt"] = pa.array(one if l else zero)
        cols["_rcnt"] = pa.array(zero if l else one)
        cols["_lfp"] = pa.array(fp if l else zero)
        cols["_rfp"] = pa.array(zero if l else fp)
        return pa.table(cols)

    return ds.map_batches(prep, batch_format="pyarrow")


def table_diff(left: ray.data.Dataset, right: ray.data.Dataset,
               key_cols, value_cols,
               change_col: str = "change") -> ray.data.Dataset:
    """Diff two snapshots -> Dataset[key_cols..., change_col] with change
    in {'added', 'removed', 'changed'}; unchanged keys are dropped."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [value_cols] if isinstance(value_cols, str) else list(value_cols)

    both = _tagged(left, keys, vals, "l").union(
        _tagged(right, keys, vals, "r"))
    merged = grouped_reduce(both, key=keys,
                            col_map={c: c for c in _CNT_COLS}, how="sum")

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            out = {k: t[k] for k in keys}
            out[change_col] = pa.array([], pa.string())
            return pa.table(out)
        lc = t["_lcnt"].to_numpy(zero_copy_only=False)
        rc = t["_rcnt"].to_numpy(zero_copy_only=False)
        if (lc > 1).any() or (rc > 1).any():
            raise ValueError("table_diff: duplicate keys within a snapshot "
                             "(CDC requires unique keys per side)")
        lfp = t["_lfp"].to_numpy(zero_copy_only=False)
        rfp = t["_rfp"].to_numpy(zero_copy_only=False)
        label = np.where(lc == 0, "added",
                         np.where(rc == 0, "removed",
                                  np.where(lfp != rfp, "changed", "")))
        keep = label != ""
        out = {k: t[k].filter(pa.array(keep)) for k in keys}
        out[change_col] = pa.array(label[keep])
        return pa.table(out)

    return merged.map_batches(classify, batch_format="pyarrow")
