"""Distributed Pareto skyline (maximal-vector) computation.

``skyline(ds, min_cols, max_cols)`` keeps the rows not dominated by any
other row: q dominates p when q is <= p on every minimized criterion,
>= p on every maximized one, and strictly better on at least one.
Criteria ties survive together (neither dominates).

Scale shape: the skyline operator is *algebraic* — skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B)) — so each block reduces to its local
skyline (typically O(log^d n) points for random data), the block
skylines union, and ONE final pass over the answer-sized union finishes.
Nothing but skyline candidates ever leaves a block; no shuffle at all.
A ``max_candidates`` guard raises if the union exceeds the driver-safe
bound (pathological data where most points are Pareto-optimal — at that
point the "answer" itself is not answer-sized).

Local algorithm: 2 criteria use the classic sort-by-first /
prefix-max-of-second sweep (fully vectorized, exact tie semantics);
d > 2 uses a lex-sorted chunked scan — a row can only be dominated by a
lex-earlier row, so chunks of 512 rows compare against the accumulated
skyline matrix with numpy broadcasting (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _local_skyline_mask(crit: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for the skyline of ``crit`` (n x d, all columns
    minimized)."""
    n, d = crit.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    if d == 2:
        x, y = crit[:, 0], crit[:, 1]
        order = np.lexsort((y, x))            # x asc, then y asc
        xs, ys = x[order], y[order]
        # strict-prefix min of y (min over rows with strictly smaller x)
        grp_start = np.r_[True, xs[1:] != xs[:-1]]
        cm = np.minimum.accumulate(ys)
        # per x-group min, carried to every member of the group
        starts = np.flatnonzero(grp_start)
        seg_len = np.diff(np.append(starts, n))
        group_min = np.repeat(cm[np.append(starts[1:] - 1, n - 1)], seg_len)
        prev_end_min = np.repeat(
            np.r_[np.inf, cm[starts[1:] - 1]], seg_len)
        keep_sorted = (ys <= group_min) & (ys < prev_end_min)
        keep = np.zeros(n, dtype=bool)
        keep[order] = keep_sorted
        return keep
    # general d: lex sort, chunked scan against accumulated skyline
    order = np.lexsort(tuple(crit[:, j] for j in range(d - 1, -1, -1)))
    c = crit[order]
    sky = np.empty((0, d))
    keep_sorted = np.zeros(n, dtype=bool)
    for lo in range(0, n, 512):
        chunk = c[lo:lo + 512]
        if len(sky):
            le = (sky[None, :, :] <= chunk[:, None, :]).all(axis=2)
            lt = (sky[None, :, :] < chunk[:, None, :]).any(axis=2)
            dominated = (le & lt).any(axis=1)
        else:
            dominated = np.zeros(len(chunk), dtype=bool)
        # within-chunk dominance (chunk is lex-sorted: only earlier rows
        # can dominate later ones)
        m = len(chunk)
        le = (chunk[None, :, :] <= chunk[:, None, :]).all(axis=2)
        lt = (chunk[None, :, :] < chunk[:, None, :]).any(axis=2)
        # earlier-in-lex-order mask: entry [i, j] true iff j < i
        dom_in = (le & lt & np.tri(m, m, -1, dtype=bool)).any(axis=1)
        ok = ~dominated & ~dom_in
        keep_sorted[lo:lo + 512] = ok
        if ok.any():
            new_sky = np.concatenate([sky, chunk[ok]])
            sky = new_sky[_local_skyline_mask(new_sky)] \
                if len(new_sky) > 4096 else new_sky
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def _crit_matrix(t: pa.Table, min_cols: list, max_cols: list) -> np.ndarray:
    cols = [t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in min_cols]
    cols += [-t[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in max_cols]
    return np.column_stack(cols) if cols else np.zeros((t.num_rows, 0))


def skyline(ds: ray.data.Dataset, min_cols, max_cols,
            max_candidates: int = 1_000_000) -> ray.data.Dataset:
    """Rows of ``ds`` not dominated on (min_cols minimized, max_cols
    maximized); all input columns pass through."""
    mins = [min_cols] if isinstance(min_cols, str) else list(min_cols)
    maxs = [max_cols] if isinstance(max_cols, str) else list(max_cols)
    if not mins and not maxs:
        raise ValueError("skyline needs at least one criterion")

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pa.array(
            _local_skyline_mask(_crit_matrix(t, mins, maxs))))

    cand = ds.map_batches(local, batch_format="pyarrow").materialize()
    n_cand = cand.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"skyline: {n_cand} block-skyline candidates exceed "
            f"max_candidates={max_candidates}; the skyline itself is not "
            "answer-sized on this data")
    return cand.repartition(1).map_batches(local, batch_format="pyarrow")
