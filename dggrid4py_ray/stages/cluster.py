"""Distributed k-means over an embedding column (Lloyd's algorithm,
Ray-Data-shaped).

The iterative structure the 100-TB regime needs:
- centroids are ALWAYS answer-sized (k x dim floats) — they live on the
  driver and are broadcast per iteration via ``ray.put``;
- the assign+partial-sum step is ONE ``map_batches`` pass per iteration
  (batch matmul against the broadcast centroid matrix, then a
  per-cluster ``np.add.at`` partial sum INSIDE the batch), so each
  iteration ships only k x (dim+1) doubles per block into a k-row
  groupby — never the vectors;
- the update (sum/count -> new centroid) happens on the k-row result.

Everything is float64 and deterministic: ties in the argmax go to the
lowest cluster id, init is the first k vectors by id (no RNG), so the
result is independent of parallelism and batch boundaries.
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
    if isinstance(arr, pa.ExtensionArray):    # Ray ArrowTensorArray
        return np.asarray(arr.to_numpy(zero_copy_only=False),
                          dtype=np.float64)
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(nrm, 1e-12)


class _AssignPartial:
    """Per-batch: cosine argmax against broadcast centroids (lowest id
    wins ties), then per-cluster (count, per-dim sum) partials."""

    def __init__(self, cent_ref, emb_col: str):
        self.C = _normalize(np.asarray(ray.get(cent_ref), dtype=np.float64))
        self.emb_col = emb_col

    def assign(self, batch: pa.Table) -> np.ndarray:
        if batch.num_rows == 0:    # reshape(0, -1) raises on empty blocks
            return (np.empty(0, dtype=np.int64),
                    np.empty((0, self.C.shape[1])))
        X = _emb_matrix(batch, self.emb_col)
        sims = _normalize(X) @ self.C.T                      # (n, k)
        # argmax with lowest-id tie-break == plain argmax (first max wins)
        return np.argmax(sims, axis=1), X

    def __call__(self, batch: pa.Table) -> pa.Table:
        a, X = self.assign(batch)
        k, dim = self.C.shape
        sums = np.zeros((k, dim))
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        present = counts > 0
        return pa.table({
            "cluster": pa.array(np.flatnonzero(present).astype(np.int64)),
            "n": pa.array(counts[present]),
            "sums": pa.array(list(sums[present])),
        })


class ClusterAssigner(_AssignPartial):
    """Map stage: append the winning cluster id to each row."""

    def __call__(self, batch: pa.Table) -> pa.Table:   # type: ignore[override]
        a, _ = self.assign(batch)
        return batch.append_column("cluster", pa.array(a.astype(np.int64)))


def kmeans_step(ds: ray.data.Dataset, centroids: np.ndarray,
                emb_col: str = "embedding",
                concurrency=None):
    """One Lloyd iteration: returns (new_centroids (k,dim) float64,
    counts (k,) int64).  Empty clusters keep their previous centroid."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))
    part = ds.map_batches(_AssignPartial, fn_constructor_args=(cref, emb_col),
                          batch_format="pyarrow",
                          concurrency=concurrency or (1, 32))
    pdf = part.to_pandas()   # <= k rows per block; k-row answer table
    k, dim = np.asarray(centroids).shape
    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros((k, dim))
    for _, r in pdf.iterrows():
        counts[int(r["cluster"])] += int(r["n"])
        sums[int(r["cluster"])] += np.asarray(r["sums"], dtype=np.float64)
    new = np.array(centroids, dtype=np.float64, copy=True)
    nz = counts > 0
    new[nz] = sums[nz] / counts[nz, None]
    return new, counts


def kmeans_fit(ds: ray.data.Dataset, k: int, iters: int = 10,
               emb_col: str = "embedding", id_col: str = "vec_id",
               tol: float = 1e-9):
    """Deterministic distributed k-means: init = the k lowest-``id_col``
    vectors (no RNG — reproducible at any parallelism), then ``iters``
    Lloyd steps (early stop when centroids move < tol).  Returns
    (centroids, counts, n_iters_run)."""
    seed = (ds.sort(id_col).limit(k).to_pandas())
    C = np.stack([np.asarray(v, dtype=np.float64) for v in seed[emb_col]])
    done = 0
    for i in range(iters):
        newC, counts = kmeans_step(ds, C, emb_col=emb_col)
        done = i + 1
        shift = float(np.max(np.linalg.norm(newC - C, axis=1)))
        C = newC
        if shift < tol:
            break
    return C, counts, done


def assign_clusters(ds: ray.data.Dataset, centroids: np.ndarray,
                    emb_col: str = "embedding",
                    concurrency=None) -> ray.data.Dataset:
    """Label every row with its nearest (cosine) centroid — pure map."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))
    return ds.map_batches(ClusterAssigner, fn_constructor_args=(cref, emb_col),
                          batch_format="pyarrow",
                          concurrency=concurrency or (1, 32))
