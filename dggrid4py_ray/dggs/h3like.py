"""H3-layout aperture-7 cell ids (published H3 index bit layout).

BASELINE.json's north star names "H3/S2 + ISEA7H encode".  S2 is
implemented value-compatibly (dggs/s2.py — the published Hilbert state
machine).  For H3 this module provides the published 64-bit CELL index
LAYOUT (H3 docs, public):

    bit 63       : reserved (0)
    bits 59..62  : mode (1 = cell)
    bits 56..58  : reserved (0)
    bits 52..55  : resolution (0..15)
    bits 45..51  : base cell (7 bits)
    bits 0..44   : fifteen 3-bit digits, MSB-first; unused digits = 7

filled from our aperture-7 hierarchy: base cell = the Z7 base (0..11 — H3's
own 122-cell base layer and its icosahedron orientation constants are not
reproducible offline, so ids are LAYOUT-compatible with H3, not
value-compatible with the h3 library; digits are the DGGRID-calibrated Z7
digits).  Encode/decode round-trips exactly; the encoder is the same
vectorized map_batches kernel family as the Z7/S2 encoders.
"""

from __future__ import annotations

import numpy as np

from . import igeo7 as ig
from .igeo7 import IGeo7Grid

_MODE_CELL = np.uint64(1)


def z7_to_h3layout(z7: np.ndarray) -> np.ndarray:
    """Z7 ids -> H3-layout uint64 (viewed int64)."""
    z7 = np.asarray(z7, dtype=np.int64)
    res = ig.z7_resolution(z7)
    if res.size and res.max() > 15:
        raise ValueError("H3 layout holds at most 15 digits")
    base = ig.z7_base_cell(z7).astype(np.uint64)
    out = (_MODE_CELL << np.uint64(59)) \
        | (res.astype(np.uint64) << np.uint64(52)) \
        | (base << np.uint64(45))
    digs = ig.z7_digits(z7, int(res.max()) if res.size else 0)
    for k in range(digs.shape[-1] if digs.ndim > 1 else 0):
        d = np.where(k < res, digs[..., k].astype(np.uint64), np.uint64(7))
        out |= d << np.uint64(42 - 3 * k)
    # pad the remaining digit slots with 7
    maxr = digs.shape[-1] if digs.ndim > 1 else 0
    for k in range(maxr, 15):
        out |= np.uint64(7) << np.uint64(42 - 3 * k)
    return out.view(np.int64)


def h3layout_to_z7(h3: np.ndarray) -> np.ndarray:
    """Inverse of z7_to_h3layout."""
    h = np.asarray(h3, dtype=np.int64).view(np.uint64)
    mode = (h >> np.uint64(59)) & np.uint64(0xF)
    if not (mode == _MODE_CELL).all():
        raise ValueError("not an H3-layout cell index")
    res = ((h >> np.uint64(52)) & np.uint64(0xF)).astype(np.int64)
    base = (h >> np.uint64(45)) & np.uint64(0x7F)
    out = base << np.uint64(60)
    for k in range(15):
        d = (h >> np.uint64(42 - 3 * k)) & np.uint64(7)
        out |= np.where(k < res, d, np.uint64(7)) << np.uint64(57 - 3 * k)
    for k in range(15, 20):
        out |= np.uint64(7) << np.uint64(57 - 3 * k)
    return out.view(np.int64)


class H3LayoutEncoder:
    """map_batches stage: lon/lat -> H3-layout aperture-7 cell ids."""

    def __init__(self, resolution: int = 9, lon_col: str = "lon",
                 lat_col: str = "lat", out_col: str = "h3_id", **orient):
        self.grid = IGeo7Grid(**orient)
        self.grid._ensure_anchor_table()
        self.res = int(resolution)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.out_col = out_col

    def __call__(self, batch):
        import pyarrow as pa
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        z7 = self.grid.encode(lon, lat, self.res)
        return batch.append_column(self.out_col,
                                   pa.array(z7_to_h3layout(z7), type=pa.int64()))
