"""Grid-density clustering — DBSCAN on the cell lattice.

The scalable form of density-based spatial clustering (DBSCAN / GriT-DBSCAN
family): bin points to an integer lattice, keep cells whose aggregate weight
clears a density threshold, connect neighboring dense cells, and label each
connected component.  Points never pairwise-compare — the epsilon ball is
quantized to the cell neighborhood, so the whole operator is one filter, one
bounded fan-out emit, one hash join (probe → occupied), and the alternating
large/small-star connected-components rounds (components.py), every stage a
Dataset transform.  Reference analog: dggrid4py users run DBSCAN driver-side
on exported cell tables (no in-engine support); here it is a first-class
distributed operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from .join import join_safe

_B = 1 << 20          # coordinate bound: |x|, |y| < _B
_W = 2 * _B           # packing stride


def pack_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Monotone (lexicographic) packing of integer lattice coords into one
    int64 key: pk = (x+B)*2B + (y+B).  MIN over packed keys == lexicographic
    MIN over (x, y), which is what makes the cluster label SQL-reproducible."""
    if len(x) and (np.abs(x).max() >= _B or np.abs(y).max() >= _B):
        raise ValueError(f"lattice coordinates must satisfy |c| < {_B}")
    return (x.astype(np.int64) + _B) * _W + (y.astype(np.int64) + _B)


def density_clusters(cells: ray.data.Dataset, x_col: str, y_col: str,
                     weight_col: str, min_weight,
                     diag: bool = True,
                     out_cluster: str = "cluster_pk") -> ray.data.Dataset:
    """Label connected components of DENSE lattice cells.

    Input: one row per occupied cell ``(x_col, y_col, weight_col)`` (ints,
    any weight dtype).  Cells with ``weight >= min_weight`` are dense;
    dense cells touching (8-neighborhood when ``diag``, else 4) belong to
    the same cluster.  Output: one row per dense cell —
    ``(x_col, y_col, weight_col, cell_pk, out_cluster)`` where both pks are
    the monotone packing of (x, y) and the cluster label is the MINIMUM
    (lexicographically first) member cell.

    Scale shape: filter → 8-way vectorized probe emit → ONE int64 hash join
    (probes ⋈ dense) → connected_components (sort-based star rounds; no
    driver materialization) → one grouped min to attach labels (no second
    join).  Isolated dense cells are singletons labeled by themselves
    (absent from the edge list — components.py's documented contract)."""
    from .components import connected_components
    from .dedup import _join_partitions
    from .groupagg import grouped_reduce

    if diag:
        offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
                (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    dx = np.array([o[0] for o in offs], dtype=np.int64)
    dy = np.array([o[1] for o in offs], dtype=np.int64)
    k = len(offs)

    def keep_dense(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("cell_pk", pa.array([], pa.int64()))
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False)
        m = w >= min_weight
        t = t.filter(pa.array(m))
        return t.append_column("cell_pk", pa.array(pack_xy(x[m], y[m])))

    dense = cells.map_batches(keep_dense, batch_format="pyarrow").materialize()

    def probes(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"src_pk": pa.array([], pa.int64()),
                             "cell_pk": pa.array([], pa.int64())})
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = t["cell_pk"].to_numpy()
        rep = np.repeat(np.arange(n), k)
        return pa.table({
            "src_pk": pa.array(pk[rep]),
            "cell_pk": pa.array(pack_xy(x[rep] + np.tile(dx, n),
                                        y[rep] + np.tile(dy, n)))})

    parts = _join_partitions()
    edges = join_safe(dense.map_batches(probes, batch_format="pyarrow"), 
        dense.select_columns(["cell_pk"]),
        join_type="inner", num_partitions=parts, on=("cell_pk",))

    cc = connected_components(edges, left_col="src_pk", right_col="cell_pk",
                              id_out="cell_pk", cluster_out=out_cluster)

    # Attach labels WITHOUT a join (a left_outer vs an all-empty cc — the
    # no-adjacent-dense-cells case — crashes Ray's hash-shuffle join with
    # "no match for FieldRef" even when the empty side is typed): every
    # dense cell contributes a self-candidate (pk, pk, w), cc contributes
    # (pk, min_label, 0), and ONE grouped min/sum resolves both the
    # singleton fallback and the weight carry.
    def self_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "cell_pk": t["cell_pk"],
            out_cluster: t["cell_pk"],
            weight_col: pc.cast(t[weight_col], pa.float64())})

    def cc_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "cell_pk": t["cell_pk"],
            out_cluster: t[out_cluster],
            weight_col: pa.array(np.zeros(t.num_rows, np.float64))})

    both = dense.map_batches(self_rows, batch_format="pyarrow").union(
        cc.map_batches(cc_rows, batch_format="pyarrow"))
    labeled = grouped_reduce(both, "cell_pk",
                             {out_cluster: out_cluster, weight_col: weight_col},
                             how={out_cluster: "min", weight_col: "sum"})

    try:
        wt = dense.schema().base_schema.field(weight_col).type
    except Exception:
        wt = pa.float64()

    def finish(t: pa.Table) -> pa.Table:
        pk = t["cell_pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            x_col: pa.array(pk // _W - _B),
            y_col: pa.array(pk % _W - _B),
            weight_col: pc.cast(t[weight_col], wt),
            "cell_pk": pa.array(pk),
            out_cluster: pc.cast(t[out_cluster], pa.int64())})

    return labeled.map_batches(finish, batch_format="pyarrow")
