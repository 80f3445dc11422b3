"""Space-filling-curve keys for locality-preserving partitioning.

Morton (Z-order) interleaves the bits of a 2-D integer cell address so
that lexicographic key ranges correspond to spatially compact regions —
the standard trick for turning a 2-D lattice into a 1-D sort/partition
key (the reference's SEQNUM-ordered outputs serve the same role; cf.
dggrid_runner.py output ordering).  At 100 TB the key is the ONE
partitioning column reused across stages: a range sort on the Morton
key co-locates spatial neighbors without any 2-D shuffle logic.

Vectorized numpy only — the magic-number bit spreading runs at memory
bandwidth; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MAX_COORD = (1 << 16) - 1


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value so bit i lands at bit 2i
    (the classic Morton magic-number sequence, 64-bit lanes)."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact16(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread16: gather even bits back to the low 16."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    return x


def morton_encode(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Interleave two non-negative 16-bit lattice coordinates into one
    int64 Z-order key: bit i of gx -> key bit 2i, bit i of gy -> key
    bit 2i+1.  Raises on out-of-range input (silent masking would alias
    distant cells onto each other)."""
    gx = np.asarray(gx, dtype=np.int64)
    gy = np.asarray(gy, dtype=np.int64)
    if gx.size and (gx.min() < 0 or gx.max() > _MAX_COORD
                    or gy.min() < 0 or gy.max() > _MAX_COORD):
        raise ValueError("morton_encode coordinates must be in [0, 2^16)")
    key = _spread16(gx) | (_spread16(gy) << np.uint64(1))
    return key.astype(np.int64)


def morton_decode(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of morton_encode: int64 keys -> (gx, gy)."""
    k = np.asarray(key, dtype=np.int64).astype(np.uint64)
    gx = _compact16(k)
    gy = _compact16(k >> np.uint64(1))
    return gx.astype(np.int64), gy.astype(np.int64)


def add_morton_key(ds: ray.data.Dataset, x_col: str, y_col: str,
                   out_col: str = "morton_key") -> ray.data.Dataset:
    """Append a Morton key column — a pure streaming map."""
    def enc(t: pa.Table) -> pa.Table:
        key = morton_encode(
            t[x_col].to_numpy(zero_copy_only=False),
            t[y_col].to_numpy(zero_copy_only=False))
        return t.append_column(out_col, pa.array(key))

    return ds.map_batches(enc, batch_format="pyarrow")


_HILBERT_ORDER = 16


def hilbert_encode(gx: np.ndarray, gy: np.ndarray,
                   order: int = _HILBERT_ORDER) -> np.ndarray:
    """Hilbert-curve distance of 2-D lattice coordinates (the classic
    iterative xy2d bit walk, vectorized over whole arrays — ``order``
    numpy passes, no per-row Python).  Hilbert keys improve on Morton
    for range partitioning: consecutive keys are always lattice
    neighbors (unit Manhattan steps), so a contiguous key range never
    jumps across the map the way Z-order's seam does."""
    n = 1 << order
    x = np.asarray(gx, dtype=np.int64).copy()
    y = np.asarray(gy, dtype=np.int64).copy()
    if x.size and (x.min() < 0 or x.max() >= n
                   or y.min() < 0 or y.max() >= n):
        raise ValueError(f"hilbert_encode coordinates must be in [0, 2^{order})")
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        refl = swap & (rx == 1)
        xr = np.where(refl, n - 1 - x, x)
        yr = np.where(refl, n - 1 - y, y)
        x, y = np.where(swap, yr, xr), np.where(swap, xr, yr)
        s >>= 1
    return d


def hilbert_decode(key: np.ndarray,
                   order: int = _HILBERT_ORDER
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of hilbert_encode (the iterative d2xy walk, vectorized)."""
    n = 1 << order
    t = np.asarray(key, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = 1
    while s < n:
        rx = 1 & (t >> 1)
        ry = 1 & (t ^ rx)
        swap = ry == 0
        refl = swap & (rx == 1)
        xr = np.where(refl, s - 1 - x, x)
        yr = np.where(refl, s - 1 - y, y)
        x, y = np.where(swap, yr, xr), np.where(swap, xr, yr)
        x += s * rx
        y += s * ry
        t >>= 2
        s <<= 1
    return x, y


def add_hilbert_key(ds: ray.data.Dataset, x_col: str, y_col: str,
                    out_col: str = "hilbert_key",
                    order: int = _HILBERT_ORDER) -> ray.data.Dataset:
    """Append a Hilbert key column — a pure streaming map."""
    def enc(t: pa.Table) -> pa.Table:
        key = hilbert_encode(
            t[x_col].to_numpy(zero_copy_only=False),
            t[y_col].to_numpy(zero_copy_only=False), order=order)
        return t.append_column(out_col, pa.array(key))

    return ds.map_batches(enc, batch_format="pyarrow")


def hilbert_bbox_ranges(x0: int, x1: int, y0: int, y1: int,
                        order: int = 16) -> list[tuple[int, int]]:
    """Decompose an inclusive lattice bbox into maximal contiguous
    Hilbert-key ranges [lo, hi).  This is the spatial predicate-pushdown
    primitive: a 2-D bbox becomes a short list of 1-D key ranges that a
    key-clustered layout (``write_clustered`` on the Hilbert key) can
    serve with file-level zone-map pruning — no full scan, no shuffle.

    Driver-side enumeration of the bbox cells (vectorized encode + one
    sort + run merge): exact and O(bbox area), the right tool for the
    coarse query grids used here.  For very fine grids use the classic
    recursive quadrant-refinement enumeration instead (same output
    contract)."""
    xs = np.arange(x0, x1 + 1, dtype=np.uint32)
    ys = np.arange(y0, y1 + 1, dtype=np.uint32)
    gx, gy = np.meshgrid(xs, ys)
    keys = np.sort(hilbert_encode(gx.ravel(), gy.ravel(), order=order))
    if len(keys) == 0:
        return []
    breaks = np.flatnonzero(np.diff(keys) != 1)
    starts = np.r_[0, breaks + 1]
    ends = np.r_[breaks, len(keys) - 1]
    return [(int(keys[s]), int(keys[e]) + 1)
            for s, e in zip(starts, ends)]
