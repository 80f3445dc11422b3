"""Distributed connected components over candidate-duplicate pairs.

The dedup family (stages/dedup.py) emits PAIRS (left_id, right_id); a
curation pipeline needs one canonical document per transitive duplicate
CLUSTER (A~B and B~C must collapse A,B,C together even though (A,C) was
never emitted).  The reference repo has no equivalent — this is part of
the beyond-reference training-data surface, same tier as dedup itself.

Algorithm: alternating Large-Star / Small-Star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014).  Each half-round is ONE wide op (a range sort on the
edge list); everything else is vectorized numpy over sorted blocks plus an
answer-sized driver summary (2 rows per block).  Converges in O(log^2 n)
rounds on any graph — no diameter dependence, so adversarial duplicate
chains (doc1~doc2~...~docN) cost log rounds, not N.

100-TB shape: the edge list is candidate-pair-sized (the answer of the
dedup stage, far smaller than the corpus text, which never enters).  Per
round the edge multiset is block-locally deduplicated, so transient growth
is bounded by O(distinct_edges + #blocks).  The only driver state is the
per-block boundary summary (first/last group key + partial min — the
grouped_reduce trick from stages/groupagg.py) and one 128-bit convergence
fingerprint per round.

Convergence detection is EXACT: a round is terminal iff the distinct edge
set reached a fixed point (the alternation's only fixed points are
disjoint stars rooted at component minima — Kiveris et al. Thm 1/2).  The
distinct-set fingerprint (count + wrapping uint64 hash-sum) is computed
inside the large-star pass at zero extra cost: blocks tile the sorted
order, so the driver orders the per-block summaries by first row and
subtracts the straddling duplicates where one block's last distinct row
equals the next block's first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .groupagg import grouped_reduce
from .hashing import _P1, _P2, _finalize
from .join import join_safe


def _row_hash(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Per-edge 64-bit hash for the multiset-sum fingerprint.  Int ids mix
    directly; string ids hash their bytes first (hash64 from the dedup
    fast path)."""
    if u.dtype.kind in "iu":
        a = _finalize(u.astype(np.uint64) * _P1)
        b = _finalize(v.astype(np.uint64) * _P2)
    else:                                    # strings / objects
        from .hashing import hash64
        a = hash64(pa.array(u.astype(object)), seed=1)
        b = hash64(pa.array(v.astype(object)), seed=2)
    return _finalize(a * np.uint64(3) + b)


def _col(t: pa.Table, name: str) -> np.ndarray:
    return t[name].to_numpy(zero_copy_only=False)


def _dedup_pairs(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Block-local distinct over edge rows (vectorized, order preserved as
    lexicographic)."""
    if len(u) == 0:
        return u, v
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    return u[keep], v[keep]


def _star_pass(edges: ray.data.Dataset, large: bool):
    """One star half-round.  Returns (new_edges_dataset, fingerprint) where
    fingerprint = (distinct_count, uint64 hash-sum) of THIS pass's oriented
    distinct input edge set (both-directions for large-star — a
    deterministic bijection of the canonical set, valid for fixed-point
    comparison across rounds)."""

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["u", "v"])
        u, v = _col(t, "u"), _col(t, "v")
        keep = u != v
        u, v = u[keep], v[keep]
        if large:
            u, v = np.concatenate([u, v]), np.concatenate([v, u])
        else:
            u, v = np.maximum(u, v), np.minimum(u, v)
        u, v = _dedup_pairs(u, v)
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    srt = (edges.map_batches(orient, batch_format="pyarrow")
                .sort(["u", "v"]).materialize())

    # pass A: per-block boundary summary (2 group partials) + local-distinct
    # fingerprint partials.  Answer: one row per block.
    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # typed zero-row table (null-typed pa.array([]) would clash
            # with non-empty blocks' schema in the union)
            eu = t["u"].combine_chunks() if isinstance(t["u"], pa.ChunkedArray) else t["u"]
            ev = t["v"].combine_chunks() if isinstance(t["v"], pa.ChunkedArray) else t["v"]
            return pa.table({"n_distinct": pa.array([], pa.int64()),
                             "hsum": pa.array([], pa.uint64()),
                             "first_u": eu, "first_v": ev,
                             "last_u": eu, "last_v": ev,
                             "first_min": ev, "last_min": ev})
        u, v = _col(t, "u"), _col(t, "v")
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        dmask = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        du, dv = u[dmask], v[dmask]
        hsum = np.uint64(0) + _row_hash(du, dv).sum(dtype=np.uint64)
        return pa.table({
            "n_distinct": pa.array([int(len(du))], pa.int64()),
            "hsum": pa.array([int(hsum)], pa.uint64()),
            "first_u": pa.array([u[0]]), "first_v": pa.array([v[0]]),
            "last_u": pa.array([u[-1]]), "last_v": pa.array([v[-1]]),
            # v ascending within each group => v at the segment start is the
            # segment-local min neighbor
            "first_min": pa.array([v[0]]),
            "last_min": pa.array([v[starts[-1]]]),
        })

    summ = [r for r in srt.map_batches(summarize, batch_format="pyarrow")
            .take_all() if r.get("n_distinct") is not None]
    summ.sort(key=lambda r: (r["first_u"], r["first_v"]))

    boundary_min: dict = {}
    count = 0
    hsum = 0                                     # wrapping mod 2^64
    prev = None
    for r in summ:
        count += r["n_distinct"]
        hsum = (hsum + int(r["hsum"])) & 0xFFFFFFFFFFFFFFFF
        for key, m in ((r["first_u"], r["first_min"]),
                       (r["last_u"], r["last_min"])):
            cur = boundary_min.get(key)
            boundary_min[key] = m if cur is None else min(cur, m)
        if prev is not None and (prev["last_u"], prev["last_v"]) == \
                (r["first_u"], r["first_v"]):
            count -= 1
            dup = int(_row_hash(np.asarray([r["first_u"]]),
                                np.asarray([r["first_v"]]))[0])
            hsum = (hsum - dup) & 0xFFFFFFFFFFFFFFFF
        prev = r
    fingerprint = (count, hsum)
    bm_ref = ray.put(boundary_min)

    # pass B: vectorized star emission over the same sorted blocks
    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["u", "v"])
        u, v = _col(t, "u"), _col(t, "v")
        start_mask = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(start_mask)
        seg_id = np.cumsum(start_mask) - 1
        seg_u = u[starts]
        seg_min = v[starts].copy()              # v-sorted within group
        bm = ray.get(bm_ref)
        for idx in (0, len(seg_u) - 1):         # block-boundary groups
            g = bm.get(seg_u[idx])
            if g is not None and g < seg_min[idx]:
                seg_min[idx] = g
        m_seg = np.minimum(seg_min, seg_u)      # min(Gamma(u) | {u})
        m_row = m_seg[seg_id]
        if large:
            mask = v > u
            left, right = v[mask], m_row[mask]
        else:
            left = np.concatenate([v, seg_u])
            right = np.concatenate([m_row, m_seg])
        keep = left != right
        left, right = _dedup_pairs(left[keep], right[keep])
        return pa.table({"u": pa.array(left), "v": pa.array(right)})

    return srt.map_batches(emit, batch_format="pyarrow"), fingerprint


def connected_components(pairs: ray.data.Dataset,
                         left_col: str = "left_id",
                         right_col: str = "right_id",
                         id_out: str = "doc_id",
                         cluster_out: str = "cluster_id",
                         max_iters: int = 64) -> ray.data.Dataset:
    """Cluster assignment from an undirected edge list:
    Dataset[(left_col, right_col)] -> Dataset[(id_out, cluster_out)] where
    cluster_out is the MINIMUM node id of the node's connected component
    (the canonical representative), one row per node that appears in any
    edge.  Self-loops are ignored; duplicate/bidirectional edges are fine.

    Nodes never mentioned in ``pairs`` are singletons — they are their own
    canonical representative and are simply absent from the output (see
    keep_canonical, which treats absence as canonical)."""
    edges = pairs.map_batches(
        lambda t: t.select([left_col, right_col])
                   .rename_columns(["u", "v"]),
        batch_format="pyarrow")

    prev_fp = None
    for _ in range(max_iters):
        edges, fp = _star_pass(edges, large=True)
        if fp == prev_fp:
            break                                 # distinct set reached the
        prev_fp = fp                              # alternation's fixed point
        if fp[0] == 0:                            # no edges at all
            break
        edges, _ = _star_pass(edges, large=False)
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(theoretical bound is O(log^2 n) — this indicates a bug, not "
            "a data property)")

    if prev_fp is not None and prev_fp[0] == 0:
        # typed empty result (limit(0) on a lazy map would drop the schema)
        try:
            sample = pairs.limit(1).take_batch(1, batch_format="pyarrow")
            lt = sample.schema.field(left_col).type
        except Exception:
            lt = pa.int64()
        return ray.data.from_arrow(pa.table({
            id_out: pa.array([], type=lt),
            cluster_out: pa.array([], type=lt)}))

    # terminal edges are (node, root) with exactly one root per node, but
    # block-local dedup may leave identical rows across blocks: grouped min
    # (sort + segmented, high-cardinality-safe) makes the output exact.
    assign = grouped_reduce(edges, key="u", col_map={"v": cluster_out},
                            how="min").rename_columns([id_out, cluster_out])
    roots = grouped_reduce(
        edges.map_batches(
            lambda t: pa.table({cluster_out: t["v"],
                                "_one": pa.array(np.ones(t.num_rows,
                                                         dtype=np.int64))}),
            batch_format="pyarrow"),
        key=cluster_out, col_map={"_one": "_n"}, how="sum").map_batches(
        lambda t: pa.table({id_out: t[cluster_out],
                            cluster_out: t[cluster_out]}),
        batch_format="pyarrow")
    return assign.union(roots)


def keep_canonical(docs: ray.data.Dataset, assignments: ray.data.Dataset,
                   id_col: str = "doc_id", cluster_col: str = "cluster_id",
                   num_partitions: int | None = None) -> ray.data.Dataset:
    """Keep one document per duplicate cluster: drop every row whose id is
    a NON-canonical member (assignment row with id != cluster).  Documents
    absent from ``assignments`` are singletons and are kept.

    ONE distributed hash anti-join (both sides large-safe); the doc payload
    columns never shuffle twice."""
    from .dedup import _join_partitions
    parts = num_partitions or _join_partitions()
    dead = assignments.map_batches(
        lambda t: t.filter(pa.compute.invert(
            pa.compute.equal(t[id_col], t[cluster_col])))
            .select([id_col]),
        batch_format="pyarrow")
    # repartition coalesces the schema-less zero-row blocks that Ray's hash
    # aggregate emits on empty partitions (grouped_reduce boundary path) —
    # pyarrow's join kernel rejects them ("no match for key field");
    # the dead table is answer-sized, so this narrow-ish exchange is cheap
    dead = dead.repartition(parts)
    return join_safe(docs, dead, join_type="left_anti",
                     num_partitions=parts, on=(id_col,))
