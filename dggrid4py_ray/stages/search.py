"""Search-pipeline operators: reciprocal-rank fusion of score columns
and hard-negative mining over an embedding column.

Both are retrieval-stack stages a training-data pipeline needs (RRF for
merging lexical + semantic candidate lists before dedup/curation;
hard negatives for contrastive fine-tuning data).  Reference scope
analog: none — beyond-reference training-data surface (SURVEY §6).

Scale shape:
- ``rrf_fuse``: one range sort per score column (the ``group_row_number``
  carry chain — O(#blocks) driver state, no per-group Python), then a
  pure map for the fused score and a per-batch partial top-n with an
  answer-sized driver merge.  Nothing wide beyond the sorts; no joins —
  rank columns accumulate on the same rows.
- ``hard_negatives``: broadcast query matrix (``ray.put`` once), one
  vectorized (batch x queries) matmul per batch with a label-mismatch
  mask, per-batch partial top-k, answer-sized merge.  The corpus never
  shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def rrf_fuse(ds: ray.data.Dataset, id_col: str,
             score_cols: list[str], *, descending: bool = True,
             rrf_k: int = 60, top_n: int = 100) -> pa.Table:
    """Reciprocal-rank fusion (Cormack et al. 2009): rank the corpus by
    each score column independently (ties broken by ``id_col``), fuse as
    ``sum_i 1 / (rrf_k + rank_i)``, return the ``top_n`` rows by fused
    score (ties broken by ``id_col``).

    Exact SQL twin: one ``ROW_NUMBER() OVER (ORDER BY score_i DESC, id)``
    per column, then ``1.0/(k+r_1) + 1.0/(k+r_2) + ...`` — the float sum
    is reproduced operation-for-operation (IEEE double, same
    association order) so integer-scaled comparison is bit-exact.

    Returns a small Arrow table: (id, rank_<col>..., rrf rank) — the
    fused score itself is returned as a float column ``rrf_score`` for
    the caller to integer-scale.
    """
    from .window import group_row_number

    ranked = ds.map_batches(
        lambda t: t.append_column("_all", pa.array(["_"] * t.num_rows)),
        batch_format="pyarrow")
    rank_cols = []
    for c in score_cols:
        order = [f"_neg_{c}", id_col] if descending else [c, id_col]
        if descending:
            ranked = ranked.map_batches(
                lambda t, _c=c: t.append_column(
                    f"_neg_{_c}",
                    pa.array(-t[_c].to_numpy(zero_copy_only=False))),
                batch_format="pyarrow")
        rc = f"rank_{c}"
        ranked = group_row_number(ranked, "_all", order, out_col=rc)
        rank_cols.append(rc)

    def partial_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             **{rc: pa.array([], pa.int64())
                                for rc in rank_cols},
                             "rrf_score": pa.array([], pa.float64())})
        score = np.zeros(t.num_rows, np.float64)
        # left-to-right addition — matches SQL's r1 + r2 + ... order
        for rc in rank_cols:
            score = score + 1.0 / (
                rrf_k + t[rc].to_numpy(zero_copy_only=False))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        k = min(top_n, len(score))
        # partial top-n by (score desc, id asc)
        sel = np.lexsort((ids, -score))[:k]
        return pa.table({id_col: pa.array(ids[sel]),
                         **{rc: t[rc].take(pa.array(sel)) for rc in rank_cols},
                         "rrf_score": pa.array(score[sel])})

    part = ranked.map_batches(partial_top, batch_format="pyarrow").to_pandas()
    part = part.sort_values(["rrf_score", id_col],
                            ascending=[False, True]).head(top_n)
    part = part.reset_index(drop=True)
    part["rank"] = np.arange(1, len(part) + 1, dtype=np.int64)
    return pa.Table.from_pandas(part, preserve_index=False)


class _HardNegScorer:
    """map_batches actor: per-batch cosine vs the broadcast query matrix,
    same-label columns masked out, partial top-k per query."""

    def __init__(self, qref, k: int, emb_col: str, id_col: str,
                 label_col: str):
        q, qlabels = ray.get(qref)
        self.q = np.asarray(q, dtype=np.float64)
        self.qnorm = np.linalg.norm(self.q, axis=1)
        self.qlabels = np.asarray(qlabels)
        self.k = k
        self.emb_col, self.id_col, self.label_col = emb_col, id_col, label_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        arr = t[self.emb_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        emb = flat.reshape(t.num_rows, len(flat) // t.num_rows)
        norms = np.linalg.norm(emb, axis=1)
        # dot / (|e| * |q|) — the same operation order as DuckDB's
        # list_cosine_similarity, so 1e-6-scaled compare is stable
        cos = (emb @ self.q.T) / (
            np.where(norms == 0, 1.0, norms)[:, None] * self.qnorm[None, :])
        labels = t[self.label_col].to_numpy(zero_copy_only=False)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_id, out_c = [], [], []
        for qi in range(len(self.q)):
            c = cos[:, qi]
            ok = labels != self.qlabels[qi]
            if not ok.any():
                continue
            cok, idok = c[ok], ids[ok]
            k = min(self.k, len(cok))
            if k < len(cok):
                # exact (cosine desc, id asc) cut: argpartition alone can
                # drop the wrong candidate at a cosine tie, so fill the
                # boundary by smallest id among the kth-value ties
                part = np.argpartition(-cok, k - 1)[:k]
                kth = cok[part].min()
                above = np.flatnonzero(cok > kth)
                ties = np.flatnonzero(cok == kth)
                need = k - len(above)
                ties_sel = ties[np.argsort(idok[ties],
                                           kind="stable")[:need]]
                top = np.concatenate([above, ties_sel])
            else:
                top = np.arange(len(cok))
            out_q.append(np.full(len(top), qi, np.int64))
            out_id.append(idok[top])
            out_c.append(cok[top])
        if not out_q:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"query_idx": pa.array(np.concatenate(out_q)),
                         self.id_col: pa.array(np.concatenate(out_id)),
                         "cosine": pa.array(np.concatenate(out_c))})


def hard_negatives(ds: ray.data.Dataset, queries: np.ndarray,
                   query_labels, k: int = 5, emb_col: str = "embedding",
                   id_col: str = "vec_id", label_col: str = "label",
                   concurrency=None) -> pa.Table:
    """Contrastive hard-negative mining: for each query vector, the k
    corpus rows MOST cosine-similar whose ``label_col`` differs from the
    query's label (the classic in-batch-negatives upgrade).  Broadcast
    queries, per-batch vectorized matmul + mask + partial top-k,
    answer-sized driver merge — the corpus never shuffles.

    Returns (query_idx, id, cosine, rank) sorted by (query_idx, rank);
    ties broken by id ascending.
    """
    qref = ray.put((np.asarray(queries, dtype=np.float64),
                    np.asarray(query_labels)))
    part = ds.map_batches(
        _HardNegScorer, fn_constructor_args=(qref, k, emb_col, id_col,
                                             label_col),
        batch_format="pyarrow", concurrency=concurrency or (1, 4)).to_pandas()
    rows = {"query_idx": [], id_col: [], "cosine": [], "rank": []}
    if part.empty:
        return pa.table({"query_idx": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64())})
    for qi, g in part.groupby("query_idx"):
        g = g.sort_values(["cosine", id_col],
                          ascending=[False, True]).head(k)
        rows["query_idx"].extend([int(qi)] * len(g))
        rows[id_col].extend(g[id_col].tolist())
        rows["cosine"].extend(g["cosine"].tolist())
        rows["rank"].extend(range(1, len(g) + 1))
    return pa.table({c: pa.array(v) for c, v in rows.items()})
