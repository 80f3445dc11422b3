"""Distributed linear algebra over an embedding column: covariance
matrix and PCA projection.

The sufficient statistics for a d-dim covariance are (n, sum x, X^T X):
each batch contributes one d(+d^2)-sized partial (one numpy matmul —
BLAS, not Python), and the driver folds the block partials, which are
answer-sized (#blocks x ~d^2 floats), NOT data-sized — the vectors
themselves never leave their blocks and never shuffle.  At d = 1024 a
partial is 8 MB; for wider models compute covariance on a projected /
sampled basis instead.

PCA = driver-side eigh of the d x d covariance (d is model width, never
data-sized) + broadcast components + a pure streaming matmul projection
— the classic two-pass distributed PCA (cf. Halko et al. 2011 for the
randomized variant when d itself is large).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    arr = batch[emb_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(batch.num_rows, len(flat) // batch.num_rows)


def covariance_stats(ds: ray.data.Dataset, emb_col: str = "embedding"
                     ) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, sample covariance) of the embedding column.  One pass;
    per-block partials fold on the driver (answer-sized)."""
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "xtx": pa.array([], pa.list_(pa.float64()))})
        x = _emb_matrix(batch, emb_col)
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "s": pa.array([x.sum(axis=0)]),
            "xtx": pa.array([(x.T @ x).ravel()])})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("covariance_stats: empty dataset")
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("covariance_stats: sample covariance needs at "
                         f"least 2 rows (got {n})")
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    xtx_flat = np.sum([np.asarray(r["xtx"]) for r in rows], axis=0)
    d = len(s)
    mean = s / n
    cov = (xtx_flat.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1)
    return int(n), mean, cov


def pca_components(ds: ray.data.Dataset, k: int,
                   emb_col: str = "embedding"
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k principal axes: (mean, components (k, d), eigenvalues (k,)).
    Deterministic sign convention: each component's largest-|.| entry is
    made positive, so results are stable across BLAS builds."""
    _, mean, cov = covariance_stats(ds, emb_col)
    w, v = np.linalg.eigh(cov)            # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    comps *= flip[:, None]
    return mean, comps, w[order]


def pca_project(ds: ray.data.Dataset, mean: np.ndarray,
                components: np.ndarray, emb_col: str = "embedding",
                out_col: str = "pc") -> ray.data.Dataset:
    """Append the k-dim PCA scores as a list column — broadcast
    components via ``ray.put`` once, pure streaming matmul per batch."""
    ref = ray.put((np.asarray(mean), np.asarray(components)))

    class _Proj:
        def __init__(self):
            self.mean, self.comps = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column(
                    out_col, pa.array([], pa.list_(pa.float64())))
            x = _emb_matrix(batch, emb_col)
            scores = (x - self.mean) @ self.comps.T
            return batch.append_column(
                out_col, pa.array(list(scores)))

    return ds.map_batches(_Proj, batch_format="pyarrow",
                          concurrency=(1, 16))


def label_centroid_cosine(ds: ray.data.Dataset, label_col: str = "label",
                          emb_col: str = "embedding",
                          scale: int = 1 << 20) -> ray.data.Dataset:
    """Pairwise cosine similarity between per-label centroid embeddings,
    DETERMINISTIC at any parallelism: each float component is rounded to
    an integer grid (``round(x * scale)``) BEFORE summation, so the
    per-(label, dim) sums are exact int64 arithmetic — no float-addition
    order sensitivity — and the cosine computed from those exact sums on
    the (answer-sized) label x dim table is a fixed IEEE expression the
    SQL twin reproduces bit-for-bit.

    Ray shape: one narrow pass emits per-block partial (label, dim, s)
    integer sums and counts (<= #labels x dim rows per block), folded by
    an answer-sized aggregate; the pairwise cosine runs on the driver
    over #labels vectors.  Output: (label_a < label_b, cos_e6 int64)
    with cos_e6 = round(1e6 * cosine-of-centroids) — centroid = sum / n
    but cosine is scale-invariant, so the sums serve directly.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"label": pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        m = _emb_matrix(t, emb_col).astype(np.float64)
        # DuckDB ROUND parity: half AWAY from zero (float32 components
        # land on exact .5 multiples of the grid constantly — numpy's
        # half-even would drift)
        mv = m * scale
        q = (np.sign(mv) * np.floor(np.abs(mv) + 0.5)).astype(np.int64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        lab_s, q_s = lab[order], q[order]
        bounds = np.flatnonzero(np.diff(lab_s)) + 1
        starts = np.concatenate([[0], bounds])
        sums = np.add.reduceat(q_s, starts, axis=0)
        labs = lab_s[starts]
        d = q.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(labs, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(labs))),
            "s": pa.array(sums.reshape(-1))})

    sums = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["label", "dim"])
              .aggregate(Sum("s", alias_name="s"))).to_pandas()
    if not len(sums):
        return ray.data.from_arrow(pa.table({
            "label_a": pa.array([], pa.int64()),
            "label_b": pa.array([], pa.int64()),
            "cos_e6": pa.array([], pa.int64())}))
    piv = sums.pivot(index="label", columns="dim", values="s") \
              .sort_index().fillna(0)
    labels = piv.index.to_numpy(np.int64)
    # EXACT integer dot products (Python bigints — the int64 sums can
    # reach ~1e10 so products overflow int64); one float64 conversion +
    # one division at the end, the same IEEE expression as the SQL twin
    # (HUGEINT dot, CAST AS DOUBLE, sqrt of the norm product)
    rows = [[int(x) for x in r] for r in piv.to_numpy()]
    sq = [sum(x * x for x in r) for r in rows]
    la, lb, cos = [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            dot = sum(a * b for a, b in zip(rows[i], rows[j]))
            c = 1e6 * float(dot) / np.sqrt(float(sq[i]) * float(sq[j]))
            la.append(labels[i])
            lb.append(labels[j])
            cos.append(int(np.sign(c) * np.floor(abs(c) + 0.5)))
    return ray.data.from_arrow(pa.table({
        "label_a": pa.array(la, pa.int64()),
        "label_b": pa.array(lb, pa.int64()),
        "cos_e6": pa.array(cos, pa.int64())}))


def group_linear_fit(ds: ray.data.Dataset, group_col: str, x_col: str,
                     y_col: str) -> ray.data.Dataset:
    """Per-group OLS sufficient statistics over INTEGER regressors:
    (group, n, sum_x, sum_y, sum_xx, sum_xy), all int64-exact — the
    algebraic decomposition of simple linear regression (slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), REGR_SLOPE's identity) with zero
    float drift, so an oracle can compare the statistics bit-for-bit and
    any consumer derives slope/intercept/r in one answer-sized pass.

    Callers must pre-scale x to keep per-corpus sums inside int64
    (e.g. seconds-since-epoch-anchor, cents): the per-row products are
    x*x and x*y.  That contract is ENFORCED, not assumed: per-group
    max|x| / max|y| ride the same reduce, and the answer-sized output is
    checked against n * max|x|^2 and n * max|x| * max|y| — an upper
    bound on every partial AND final sum — raising ValueError instead of
    letting numpy/pandas wrap silently modulo 2^64 (the SQL twin's
    HUGEINT sums would diverge exactly then).

    Shape: per-batch pandas groupby partials (one row per distinct group
    per batch), then ONE sort-based grouped_reduce — no data-sized
    shuffle, no per-group Python."""
    import pandas as pd

    from .groupagg import grouped_reduce

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ax, ay = np.abs(x), np.abs(y)
        df = pd.DataFrame({group_col: g, "_x": x, "_y": y,
                           "_xx": x * x, "_xy": x * y})
        pdf = df.groupby(group_col, sort=False).sum().reset_index()
        mx = (pd.DataFrame({group_col: g, "_ax": ax, "_ay": ay})
              .groupby(group_col, sort=False).max())
        pdf["_n"] = (pd.DataFrame({group_col: g}).groupby(group_col,
                     sort=False).size().reindex(pdf[group_col]).to_numpy())
        pdf["_ax"] = mx["_ax"].reindex(pdf[group_col]).to_numpy()
        pdf["_ay"] = mx["_ay"].reindex(pdf[group_col]).to_numpy()
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    red = grouped_reduce(parts, group_col,
                         {"_n": "n", "_x": "sum_x", "_y": "sum_y",
                          "_xx": "sum_xx", "_xy": "sum_xy",
                          "_ax": "_ax", "_ay": "_ay"},
                         how={"_n": "sum", "_x": "sum", "_y": "sum",
                              "_xx": "sum", "_xy": "sum",
                              "_ax": "max", "_ay": "max"})

    def check(t: pa.Table) -> pa.Table:
        # Python-bigint bound check on the answer-sized group table: if
        # n * max products stay inside int64, every batch partial and the
        # folded sum did too (|sum over any subset| <= n * max|term|)
        for row in t.to_pylist():
            n, ax, ay = int(row["n"]), int(row["_ax"]), int(row["_ay"])
            if n * ax * ax >= 2 ** 63 or n * ax * ay >= 2 ** 63:
                raise ValueError(
                    f"group_linear_fit: group {row[group_col]!r} "
                    f"(n={n}, max|x|={ax}, max|y|={ay}) can overflow "
                    "int64 sums; rescale x (coarser units) upstream")
        return t.drop_columns(["_ax", "_ay"])

    return red.map_batches(check, batch_format="pyarrow")


def group_spearman(ds: ray.data.Dataset, group_col: str, x_col: str,
                   y_col: str, id_col: str) -> ray.data.Dataset:
    """Per-group Spearman rank-correlation sufficient statistics:
    (group, n, sum_d2) with d = rank_x - rank_y, ranks being the
    DETERMINISTIC within-group row numbers ordered by (value, id) —
    ROW_NUMBER semantics, so ties break identically in SQL and here and
    the statistic is integer-exact (rho = 1 - 6*sum_d2/(n*(n^2-1)) for
    the consumer).

    Shape: two group_row_number carry chains (the only sorts — the
    second ranks the OUTPUT of the first, so no join is ever needed to
    align ranks by row), per-batch partial sums, one grouped_reduce."""
    import pandas as pd

    from .groupagg import grouped_reduce
    from .window import group_row_number

    rx = group_row_number(ds, group_col, [x_col, id_col], out_col="_rx")
    ry = group_row_number(rx, group_col, [y_col, id_col], out_col="_ry")

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        d = (t["_rx"].to_numpy(zero_copy_only=False).astype(np.int64)
             - t["_ry"].to_numpy(zero_copy_only=False).astype(np.int64))
        pdf = (pd.DataFrame({group_col: g, "_d2": d * d, "_one": 1})
               .groupby(group_col, sort=False).sum().reset_index())
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = ry.map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(parts, group_col,
                          {"_one": "n", "_d2": "sum_d2"}, how="sum")


def logistic_grad_step(ds: "ray.data.Dataset", w: np.ndarray,
                       emb_col: str = "embedding",
                       label_col: str = "label",
                       positive_label: int = 0) -> pa.Table:
    """One exact distributed gradient step of L2-free logistic
    regression — the sufficient-statistics ML-training shape: the
    weight vector broadcasts via ``ray.put``, each batch reduces to a
    d-vector partial gradient X^T (sigmoid(Xw) - y) plus a scalar
    log-loss partial, and the driver folds #batches answer-sized
    partials.  ONE narrow pass over the corpus, nothing shuffles, no
    iteration state outside the broadcast weights — at 10^12 rows this
    is bandwidth-bound reading embeddings, exactly where it should be.

    Returns a (d+1)-row Arrow table: rows 0..d-1 = (j, grad[j], n),
    row d = (-1, total log-loss, n)."""
    import ray

    w = np.asarray(w, dtype=np.float64)
    wref = ray.put(w)

    def partial(t: pa.Table) -> pa.Table:
        d = len(w)
        if t.num_rows == 0:
            return pa.table({"j": pa.array([], pa.int64()),
                             "g": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        arr = t[emb_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        X = flat.reshape(t.num_rows, d)
        y = (t[label_col].to_numpy(zero_copy_only=False)
             == positive_label).astype(np.float64)
        ww = ray.get(wref)
        p = 1.0 / (1.0 + np.exp(-(X @ ww)))
        g = X.T @ (p - y)
        eps = 1e-300   # guard exact-0/1 probabilities (never hit here)
        loss = -np.sum(y * np.log(p + eps)
                       + (1.0 - y) * np.log(1.0 - p + eps))
        return pa.table({
            "j": pa.array(np.r_[np.arange(d), -1].astype(np.int64)),
            "g": pa.array(np.r_[g, loss]),
            "n": pa.array(np.full(d + 1, t.num_rows, np.int64))})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = part.groupby("j", sort=True).agg(
        g=("g", "sum"), n=("n", "max")).reset_index()
    # n folds as max within a batch (each batch stamps its own size on
    # every row) — total rows = sum over batches of per-batch n
    n_tot = int(part[part["j"] == -1]["n"].sum())
    agg["n"] = n_tot
    return pa.table({"j": pa.array(agg["j"].to_numpy(np.int64)),
                     "g": pa.array(agg["g"].to_numpy(np.float64)),
                     "n": pa.array(agg["n"].to_numpy(np.int64))})
