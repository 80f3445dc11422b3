"""Exact per-cell Voronoi neighbors/boundaries via vectorized half-plane
clipping.

Candidate completeness comes from the hierarchy: every Voronoi neighbor of a
cell is a child of the cell's parent or of one of the parent's neighbors
(distances: |c - n| <= ~2.2 d_r even in pentagon-seam-stretched zones, while
children of ring-2 coarse cells are >= ~3.4 d_r away).  Neighbors at the
parent resolution are obtained recursively; recursion grounds at res 0 where
the 12 base cells are mutually adjacent by icosahedron edges.

The per-cell Voronoi region is computed in the cell's tangent plane
(azimuthal equidistant) by clipping a large start square against the
perpendicular bisector of every candidate, nearest first — a fully
vectorized Sutherland–Hodgman over padded vertex arrays with per-edge
candidate labels, so the surviving edges directly name the neighbors.
"""

from __future__ import annotations

import numpy as np

MAX_VERTS = 16
NO_LABEL = -1  # label index of the start-square edges


def clip_convex_batch(poly: np.ndarray, count: np.ndarray, labels: np.ndarray,
                      ax: np.ndarray, ay: np.ndarray, b: np.ndarray,
                      new_label: np.ndarray):
    """Clip each row's convex polygon by its half-plane ax*x + ay*y <= b.

    poly: (n, P, 2), count: (n,), labels: (n, P) edge label starting at vertex
    i; ax/ay/b/new_label: (n,).  Returns updated (poly, count, labels).
    """
    n, P, _ = poly.shape
    idx = np.arange(P)[None, :]
    valid = idx < count[:, None]
    s = ax[:, None] * poly[:, :, 0] + ay[:, None] * poly[:, :, 1] - b[:, None]
    inside = (s <= 0) & valid
    nxt = np.where(idx + 1 < count[:, None], idx + 1, 0)
    ar = np.arange(n)[:, None]
    s_next = s[ar, nxt]
    inside_next = inside[ar, nxt]
    crossing = valid & (inside != inside_next)
    denom = s - s_next
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(np.abs(denom) > 1e-300, s / denom, 0.0)
    px = poly[:, :, 0] + t * (poly[ar, nxt, 0] - poly[:, :, 0])
    py = poly[:, :, 1] + t * (poly[ar, nxt, 1] - poly[:, :, 1])
    # emitted per edge i: [v_i if inside_i] then [X_i if crossing_i]
    emit_v = inside
    emit_x = crossing
    n_emit = emit_v.astype(np.int64) + emit_x.astype(np.int64)
    offs = np.cumsum(n_emit, axis=1) - n_emit          # start slot per edge
    new_count = n_emit.sum(axis=1)
    if new_count.size and int(new_count.max()) > P:
        # pathological candidate geometry would otherwise scatter out of
        # bounds and corrupt vertices/labels silently
        raise AssertionError(
            f"clipped polygon exceeded MAX_VERTS={P} "
            f"(max count {int(new_count.max())})")
    out = np.zeros_like(poly)
    out_lab = np.full_like(labels, NO_LABEL)
    # scatter v_i
    rows, cols = np.nonzero(emit_v)
    slots = offs[rows, cols]
    out[rows, slots, 0] = poly[rows, cols, 0]
    out[rows, slots, 1] = poly[rows, cols, 1]
    out_lab[rows, slots] = labels[rows, cols]
    # scatter X_i
    rows2, cols2 = np.nonzero(emit_x)
    slots2 = offs[rows2, cols2] + emit_v[rows2, cols2].astype(np.int64)
    out[rows2, slots2, 0] = px[rows2, cols2]
    out[rows2, slots2, 1] = py[rows2, cols2]
    # exiting (inside -> outside): bisector edge starts at X -> new label
    # entering: original edge continues -> keep edge label
    ent = inside[rows2, cols2] == False  # noqa: E712  (entering)
    out_lab[rows2, slots2] = np.where(ent, labels[rows2, cols2], new_label[rows2])
    return out, new_count, out_lab


def voronoi_cells(px: np.ndarray, py: np.ndarray, valid: np.ndarray,
                  span: float):
    """For each row: Voronoi region of the origin against candidate points
    (px, py) (n, C), invalid slots masked.  Returns (verts (n, MAX_VERTS, 2),
    count (n,), edge_labels (n, MAX_VERTS) candidate-slot indices)."""
    n, C = px.shape
    big = 4.0 * span
    poly = np.zeros((n, MAX_VERTS, 2))
    poly[:, 0] = [-big, -big]
    poly[:, 1] = [big, -big]
    poly[:, 2] = [big, big]
    poly[:, 3] = [-big, big]
    count = np.full(n, 4, dtype=np.int64)
    labels = np.full((n, MAX_VERTS), NO_LABEL, dtype=np.int64)
    d2 = np.where(valid, px * px + py * py, np.inf)
    order = np.argsort(d2, axis=1)
    ar = np.arange(n)
    for k in range(C):
        ci = order[:, k]
        cx = px[ar, ci]
        cy = py[ar, ci]
        ok = valid[ar, ci]
        # bisector of origin and (cx, cy): x*cx + y*cy <= (cx^2+cy^2)/2
        b = (cx * cx + cy * cy) / 2.0
        axv = np.where(ok, cx, 0.0)
        ayv = np.where(ok, cy, 0.0)
        bv = np.where(ok, b, 1.0)  # 0*x+0*y <= 1: no-op for invalid slots
        poly, count, labels = clip_convex_batch(poly, count, labels, axv, ayv, bv, ci)
    return poly, count, labels
