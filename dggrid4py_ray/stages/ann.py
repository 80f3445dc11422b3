"""Similarity search over an embedding column (list<float>).

* brute_force_topk — exact cosine top-k: the query matrix is broadcast once
  via ray.put and every batch does one numpy matmul; a final small top-k
  merge on the driver.  The baseline path.
* ivf_topk — IVF-style scale path: k-means-ish centroids (sampled, trained
  driver-side once), vectors bucketed by nearest centroid (groupby), queries
  probe only the closest nprobe buckets.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _emb_matrix(batch: pa.Table, emb_col: str, dtype=np.float32) -> np.ndarray:
    arr = batch[emb_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=dtype)
    n = batch.num_rows
    return flat.reshape(n, len(flat) // max(n, 1))


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


class BatchScorer:
    """map_batches actor: per-batch top-k cosine scores against the broadcast
    query matrix (ray.put once, NOT re-shipped per batch)."""

    def __init__(self, queries_ref, k: int, emb_col: str, id_col: str):
        self.q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float32))
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, self.emb_col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = emb @ self.q.T                                  # (n, Q)
        k = min(self.k, sims.shape[0])
        top = np.argpartition(-sims, k - 1, axis=0)[:k]        # (k, Q)
        Q = sims.shape[1]
        qidx = np.repeat(np.arange(Q, dtype=np.int64), k)
        vid = ids[top.T.reshape(-1)]
        sc = sims[top.T.reshape(-1), qidx]
        return pa.table({"query_idx": pa.array(qidx), self.id_col: pa.array(vid),
                         "cosine": pa.array(sc.astype(np.float64))})


def brute_force_topk(ds: ray.data.Dataset, queries: np.ndarray, k: int = 10,
                     emb_col: str = "embedding", id_col: str = "vec_id",
                     concurrency: int | None = None) -> pa.Table:
    """Exact cosine top-k for each query row; result is a small
    (num_queries*k) Arrow table sorted by (query_idx, -cosine, id)."""
    qref = ray.put(np.asarray(queries, dtype=np.float32))
    partial = ds.map_batches(BatchScorer, fn_constructor_args=(qref, k, emb_col, id_col),
                             batch_format="pyarrow", concurrency=concurrency or (1, 4))
    # merge partial top-ks (small) on the driver
    df = partial.to_pandas()
    out = {"query_idx": [], id_col: [], "cosine": [], "rank": []}
    for qi, g in df.groupby("query_idx"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        out["query_idx"].extend([qi] * len(g))
        out[id_col].extend(g[id_col].tolist())
        out["cosine"].extend(g["cosine"].tolist())
        out["rank"].extend(range(1, len(g) + 1))
    return pa.table({k2: pa.array(v) for k2, v in out.items()})


def train_centroids(ds: ray.data.Dataset, n_centroids: int = 64,
                    emb_col: str = "embedding", sample: int = 4096,
                    iters: int = 8, seed: int = 0) -> np.ndarray:
    """Mini k-means on a driver-side sample (the IVF coarse quantizer)."""
    samp = ds.limit(sample).to_pandas()
    X = _normalize(np.stack([np.asarray(v, dtype=np.float32) for v in samp[emb_col]]))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-9)
    return C


def ivf_topk(ds: ray.data.Dataset, queries: np.ndarray, k: int = 10,
             n_centroids: int = 64, nprobe: int = 8,
             emb_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """IVF approximate top-k: assign vectors to coarse centroids, score only
    batches' vectors belonging to the nprobe closest centroids per query.

    Scoring runs in float64 (centroid assignment stays float32) so that
    ``nprobe == n_centroids`` — every list probed — degenerates to the exact
    brute-force answer at float64 precision (the correctness-gate config)."""
    C = train_centroids(ds, n_centroids, emb_col)
    cref = ray.put(C)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ C.T.astype(np.float64)), axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_sets = [set(p.tolist()) for p in probe]
    qref = ray.put(q)
    pref = ray.put(probe_sets)

    class Scorer:
        def __init__(self):
            self.C = ray.get(cref)
            self.q = ray.get(qref)
            self.probe = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            raw = _emb_matrix(batch, emb_col)
            emb = _normalize(raw.astype(np.float64))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            assign = np.argmax(_normalize(raw) @ self.C.T, axis=1)
            rows = {"query_idx": [], id_col: [], "cosine": []}
            for qi, pset in enumerate(self.probe):
                m = np.isin(assign, list(pset))
                if not m.any():
                    continue
                sims = emb[m] @ self.q[qi]
                kk = min(k, len(sims))
                top = np.argpartition(-sims, kk - 1)[:kk]
                rows["query_idx"].extend([qi] * kk)
                rows[id_col].extend(ids[m][top].tolist())
                rows["cosine"].extend(sims[top].astype(np.float64).tolist())
            return pa.table({c: pa.array(v) for c, v in rows.items()})

    partial = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=(1, 4))
    df = partial.to_pandas()
    out = {"query_idx": [], id_col: [], "cosine": [], "rank": []}
    for qi, g in df.groupby("query_idx"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        out["query_idx"].extend([int(qi)] * len(g))
        out[id_col].extend(g[id_col].tolist())
        out["cosine"].extend(g["cosine"].tolist())
        out["rank"].extend(range(1, len(g) + 1))
    return pa.table({k2: pa.array(v) for k2, v in out.items()})


def sq8_minmax(ds: ray.data.Dataset, emb_col: str = "embedding") -> tuple[float, float]:
    """Global (min, max) over every embedding element — the SQ8 range.
    One narrow pass: per-batch scalar partials, tiny driver reduce."""
    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, emb_col, dtype=np.float64)
        if m.size == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"lo": pa.array([float(m.min())]),
                         "hi": pa.array([float(m.max())])})

    p = ds.map_batches(partial, batch_format="pyarrow")
    return float(p.min("lo")), float(p.max("hi"))


def _sq8_codes(m: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """uint8 codes: floor(t*255 + 0.5) of the [0,1]-scaled value —
    floor(x+0.5) rounding so SQL FLOOR(x+0.5) reproduces it exactly."""
    t = (m.astype(np.float64) - lo) / (hi - lo if hi > lo else 1.0)
    return np.clip(np.floor(t * 255.0 + 0.5), 0, 255).astype(np.uint8)


def _sq8_dequant(codes: np.ndarray, lo: float, hi: float) -> np.ndarray:
    return lo + codes.astype(np.float64) * ((hi - lo) / 255.0)


def sq8_encode(ds: ray.data.Dataset, lo: float, hi: float,
               emb_col: str = "embedding",
               id_col: str = "vec_id") -> ray.data.Dataset:
    """Scalar-quantize embeddings to uint8 code rows (8x smaller than
    float64 storage; the memory answer for a 100-TB embedding corpus —
    codes live in the object store / on disk, floats never do)."""
    def enc(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, emb_col, dtype=np.float64)
        codes = _sq8_codes(m, lo, hi)
        return pa.table({id_col: t[id_col],
                         "codes": pa.array(list(codes),
                                           pa.list_(pa.uint8()))})

    return ds.map_batches(enc, batch_format="pyarrow")


def sq8_topk(ds: ray.data.Dataset, query: np.ndarray, k: int = 10,
             emb_col: str = "embedding", id_col: str = "vec_id",
             lo: float | None = None, hi: float | None = None) -> pa.Table:
    """Asymmetric top-k over SQ8-quantized vectors: the corpus side is
    dequantized uint8 codes (quantization error on one side only — the
    standard ADC trade), the query stays full-precision; per-batch
    matmul + partial top-k, answer-sized driver merge.  Deterministic
    given (data, query): the codes are a pure floor(x+0.5) function, so
    a SQL oracle reproduces the result exactly."""
    if lo is None or hi is None:
        lo, hi = sq8_minmax(ds, emb_col)
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    ref = ray.put((qn, float(lo), float(hi)))

    class Scorer:
        def __init__(self):
            self.qn, self.lo, self.hi = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _emb_matrix(t, emb_col, dtype=np.float64)
            deq = _sq8_dequant(_sq8_codes(m, self.lo, self.hi),
                               self.lo, self.hi)
            norms = np.linalg.norm(deq, axis=1)
            sims = (deq @ self.qn) / np.where(norms == 0, 1.0, norms)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            kk = min(k, len(sims))
            if kk == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            # total order (cosine desc, id asc): quantization produces
            # identical codes -> mass ties; an un-tie-broken partial
            # top-k would be partition-dependent (same fix as pq_topk)
            top = np.lexsort((ids, -sims))[:kk]
            return pa.table({id_col: pa.array(ids[top]),
                             "cosine": pa.array(sims[top])})

    part = ds.map_batches(Scorer, batch_format="pyarrow",
                          concurrency=(1, 32)).to_pandas()
    part = part.sort_values(["cosine", id_col],
                            ascending=[False, True]).head(k)
    part["rank"] = np.arange(1, len(part) + 1, dtype=np.int64)
    return pa.table({"rank": pa.array(part["rank"].to_numpy()),
                     id_col: pa.array(part[id_col].to_numpy()),
                     "cosine": pa.array(part["cosine"].to_numpy())})


def pq_train(ds: ray.data.Dataset, n_sub: int = 4, n_centroids: int = 16,
             sample: int = 2048, iters: int = 8,
             emb_col: str = "embedding") -> list[np.ndarray]:
    """Train product-quantization codebooks: split the (L2-normalized)
    vector into ``n_sub`` contiguous subspaces, run a small deterministic
    Lloyd k-means per subspace on a driver-side sample (init = first
    ``n_centroids`` distinct sample rows — a pure function of the data,
    reproducible).  Returns one (n_centroids, d/n_sub) float64 codebook
    per subspace.  n_centroids <= 256 so codes fit uint8."""
    if n_centroids > 256:
        raise ValueError("pq_train: n_centroids must fit uint8 (<=256)")
    rows = []
    need = sample
    for b in ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        rows.append(_emb_matrix(b, emb_col, dtype=np.float64))
        need -= rows[-1].shape[0]
        if need <= 0:
            break
    if not rows or sum(r.shape[0] for r in rows) == 0:
        raise ValueError("pq_train: empty embedding dataset")
    X = np.concatenate(rows)[:sample]
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return _train_subspace_books(X, n_sub, n_centroids, iters,
                                 who="pq_train")


def _train_subspace_books(X: np.ndarray, n_sub: int, n_centroids: int,
                          iters: int, who: str = "pq") -> list[np.ndarray]:
    """Deterministic per-subspace Lloyd k-means (distinct-row init, fixed
    iterations) — shared by pq_train (normalized vectors) and
    ivfpq_build (coarse-centroid residuals)."""
    d = X.shape[1]
    if d % n_sub:
        raise ValueError(f"{who}: dim {d} not divisible by {n_sub}")
    dsub = d // n_sub
    books = []
    for s in range(n_sub):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        # deterministic init: first n_centroids distinct rows
        _, first = np.unique(np.round(Xs, 12), axis=0, return_index=True)
        init = Xs[np.sort(first)[:n_centroids]]
        if len(init) < n_centroids:       # tiny data: PAD the distinct
            pad = Xs[np.arange(n_centroids - len(init)) % len(Xs)]
            init = np.concatenate([init, pad])   # rows, don't discard them
        C = init.copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for c in range(n_centroids):
                m = a == c
                if m.any():
                    C[c] = Xs[m].mean(0)
        books.append(C)
    return books


def pq_encode(ds: ray.data.Dataset, books: list[np.ndarray],
              emb_col: str = "embedding",
              id_col: str = "vec_id") -> ray.data.Dataset:
    """uint8 PQ codes per vector (n_sub bytes instead of d floats — a
    d*8/n_sub compression; 64x at d=32, n_sub=4).  Codebooks broadcast
    once via ray.put."""
    bref = ray.put([np.asarray(b, np.float64) for b in books])

    class Enc:
        def __init__(self):
            self.books = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _emb_matrix(t, emb_col, dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                               1e-12)
            dsub = self.books[0].shape[1]
            codes = np.empty((X.shape[0], len(self.books)), np.uint8)
            for s, C in enumerate(self.books):
                Xs = X[:, s * dsub:(s + 1) * dsub]
                d2 = (Xs ** 2).sum(1)[:, None] - 2 * Xs @ C.T \
                    + (C ** 2).sum(1)[None, :]
                codes[:, s] = d2.argmin(1).astype(np.uint8)
            return pa.table({id_col: t[id_col],
                             "codes": pa.array(list(codes),
                                               pa.list_(pa.uint8()))})

    return ds.map_batches(Enc, batch_format="pyarrow", concurrency=(1, 32))


def pq_topk(codes: ray.data.Dataset, query: np.ndarray,
            books: list[np.ndarray], k: int = 10,
            id_col: str = "vec_id") -> pa.Table:
    """Asymmetric-distance top-k over PQ codes: ONE (n_sub x n_centroids)
    lookup table of query-subvector inner products per query, similarity
    = sum of table lookups — no float vectors touched at query time (the
    classic ADC scan; Jegou et al. 2011).  Partial top-k per batch,
    answer-sized driver merge."""
    q = np.asarray(query, np.float64)
    q = q / np.linalg.norm(q)
    dsub = books[0].shape[1]
    lut = np.stack([q[s * dsub:(s + 1) * dsub] @ np.asarray(b).T
                    for s, b in enumerate(books)])     # (S, K)
    lref = ray.put(lut)

    class Scan:
        def __init__(self):
            self.lut = ray.get(lref)

        def __call__(self, t: pa.Table) -> pa.Table:
            arr = t["codes"]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            flat = np.asarray(arr.flatten(), np.int64)
            n = t.num_rows
            S = self.lut.shape[0]
            c = flat.reshape(n, S)
            sims = self.lut[np.arange(S)[None, :], c].sum(1)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            kk = min(k, n)
            if kk == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            # total order (score desc, id asc): ADC scores tie en masse
            # (identical codes), and a tie-broken partial top-k is what
            # makes the global result partition-invariant
            top = np.lexsort((ids, -sims))[:kk]
            return pa.table({id_col: pa.array(ids[top]),
                             "score": pa.array(sims[top])})

    import pandas as pd
    part = codes.map_batches(Scan, batch_format="pyarrow",
                             concurrency=(1, 32)).to_pandas()
    part = part.sort_values(["score", id_col],
                            ascending=[False, True]).head(k)
    part["rank"] = np.arange(1, len(part) + 1, dtype=np.int64)
    return pa.table({"rank": pa.array(part["rank"].to_numpy()),
                     id_col: pa.array(part[id_col].to_numpy()),
                     "score": pa.array(part["score"].to_numpy())})


def ivfpq_topk_refined(ds: ray.data.Dataset, codes: ray.data.Dataset,
                       query: np.ndarray, C: np.ndarray,
                       books: list[np.ndarray], k: int = 10,
                       nprobe: int = 4, refine: int = 5,
                       emb_col: str = "embedding",
                       id_col: str = "vec_id") -> pa.Table:
    """IVF-PQ with an EXACT re-rank pass — the standard production shape
    (tunable recall): the ADC scan shortlists the top ``k * refine``
    candidates from the probed lists, then the candidates' ORIGINAL
    float vectors are fetched (distributed filter over ``ds`` against
    the broadcast candidate-id set — candidate-sized, never the corpus)
    and re-scored with exact cosine; the final top-k therefore carries
    true similarities, and equals the exact brute-force top-k whenever
    the shortlist contains it (pytest-gated recall property).

    ``refine=1`` degenerates to ADC ranking; larger ``refine`` trades
    one candidate-sized exact pass for recall → exact."""
    if refine < 1:
        raise ValueError(f"refine must be >= 1, got {refine}")
    shortlist = ivfpq_topk(codes, query, C, books, k=int(k) * int(refine),
                           nprobe=nprobe, id_col=id_col)
    cand = np.sort(shortlist[id_col].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
    cref = ray.put(cand)

    class Keep:
        def __init__(self):
            self.cand = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.cand, ids)
            pos[pos >= len(self.cand)] = 0
            return t.filter(pa.array(self.cand[pos] == ids))

    subset = ds.map_batches(Keep, batch_format="pyarrow",
                            concurrency=(1, 32))
    # exact cosine over the candidate-sized subset — same scoring path
    # (and therefore the same oracle parity) as brute_force_topk
    exact = brute_force_topk(subset, np.asarray(query)[None, :], k=k,
                             emb_col=emb_col, id_col=id_col)
    return pa.table({"rank": exact["rank"].cast(pa.int64()),
                     id_col: exact[id_col],
                     "score": exact["cosine"]})


def ivfpq_build(ds: ray.data.Dataset, n_centroids: int = 16,
                n_sub: int = 4, pq_centroids: int = 16,
                sample: int = 2048, iters: int = 8,
                emb_col: str = "embedding",
                id_col: str = "vec_id"):
    """Build an IVF-PQ index (Jegou et al. 2011, the production ANN
    architecture for billion-vector corpora): coarse centroids partition
    the corpus into inverted lists; each vector stores only its list id
    plus the PQ codes of its RESIDUAL (x - centroid) — n_sub bytes + 2
    per vector, and queries touch just the probed lists' codes.

    All-deterministic (train_centroids + distinct-row-init Lloyd on a
    deterministic residual sample), so the whole index is a pure
    function of the data — same reproducibility contract as pq_train.
    Returns (C, books, codes_ds) with codes_ds = (id, list_id, codes)."""
    C = train_centroids(ds, n_centroids, emb_col).astype(np.float64)

    rows = []
    need = sample
    for b in ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        X = _emb_matrix(b, emb_col, dtype=np.float64)
        if X.size:
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                               1e-12)
            rows.append(X - C[np.argmax(X @ C.T, axis=1)])
            need -= X.shape[0]
            if need <= 0:
                break
    if not rows:
        raise ValueError("ivfpq_build: empty embedding dataset")
    books = _train_subspace_books(np.concatenate(rows)[:sample], n_sub,
                                  pq_centroids, iters, who="ivfpq_build")

    cref = ray.put(C)
    bref = ray.put([np.asarray(b, np.float64) for b in books])

    class Enc:
        def __init__(self):
            self.C = ray.get(cref)
            self.books = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _emb_matrix(t, emb_col, dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                               1e-12)
            assign = np.argmax(X @ self.C.T, axis=1)
            R = X - self.C[assign]
            dsub = self.books[0].shape[1]
            codes = np.empty((X.shape[0], len(self.books)), np.uint8)
            for s, B in enumerate(self.books):
                Rs = R[:, s * dsub:(s + 1) * dsub]
                d2 = (Rs ** 2).sum(1)[:, None] - 2 * Rs @ B.T \
                    + (B ** 2).sum(1)[None, :]
                codes[:, s] = d2.argmin(1).astype(np.uint8)
            return pa.table({id_col: t[id_col],
                             "list_id": pa.array(assign.astype(np.int64)),
                             "codes": pa.array(list(codes),
                                               pa.list_(pa.uint8()))})

    codes_ds = ds.map_batches(Enc, batch_format="pyarrow",
                              concurrency=(1, 32))
    return C, books, codes_ds


def ivfpq_topk(codes: ray.data.Dataset, query: np.ndarray,
               C: np.ndarray, books: list[np.ndarray],
               k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id") -> pa.Table:
    """ADC scan over an IVF-PQ index: probe the ``nprobe`` coarse lists
    nearest the query; within a probed list, similarity decomposes as

        q . x  ~=  q . C[list]  +  sum_s LUT_s[code_s]

    (base term per list + one residual lookup-table sum — no float
    vector touched at query time).  Rows outside probed lists are
    filtered vectorized BEFORE any scoring; partial top-k per batch with
    the (score desc, id asc) total order, answer-sized driver merge."""
    q = np.asarray(query, np.float64)
    q = q / np.linalg.norm(q)
    Cd = np.asarray(C, np.float64)
    base = q @ Cd.T                              # (n_centroids,)
    probe = np.argsort(-base)[:nprobe]
    dsub = books[0].shape[1]
    lut = np.stack([q[s * dsub:(s + 1) * dsub] @ np.asarray(b).T
                    for s, b in enumerate(books)])
    ref = ray.put((set(probe.tolist()), base, lut))

    class Scan:
        def __init__(self):
            self.probe, self.base, self.lut = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            lids = t["list_id"].to_numpy(zero_copy_only=False)
            m = np.isin(lids, list(self.probe))
            if not m.any():
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            t = t.filter(pa.array(m))
            arr = t["codes"]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            flat = np.asarray(arr.flatten(), np.int64)
            n = t.num_rows
            S = self.lut.shape[0]
            c = flat.reshape(n, S)
            sims = (self.base[t["list_id"].to_numpy(zero_copy_only=False)]
                    + self.lut[np.arange(S)[None, :], c].sum(1))
            ids = t[id_col].to_numpy(zero_copy_only=False)
            kk = min(k, n)
            top = np.lexsort((ids, -sims))[:kk]
            return pa.table({id_col: pa.array(ids[top]),
                             "score": pa.array(sims[top])})

    import pandas as pd
    part = codes.map_batches(Scan, batch_format="pyarrow",
                             concurrency=(1, 32)).to_pandas()
    part = part.sort_values(["score", id_col],
                            ascending=[False, True]).head(k)
    part["rank"] = np.arange(1, len(part) + 1, dtype=np.int64)
    return pa.table({"rank": pa.array(part["rank"].to_numpy()),
                     id_col: pa.array(part[id_col].to_numpy()),
                     "score": pa.array(part["score"].to_numpy())})
