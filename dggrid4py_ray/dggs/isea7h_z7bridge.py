"""Bridge: projection-exact flat aperture-7 cells -> Z7 digit paths.

Implements the recipe validated by experiments/z7_bijection_check.py as
reusable batch functions — the round-2 integration path for giving the
IGEO7 engine projection-exact positions while keeping the Z7 id algebra:

  parent(cell)       = flat-encode of the cell center at res-1 (exact)
  children(parent)   = ideal ring positions in the parent's face plane,
                       snapped to the nearest flat cell (exact encode)
  digit(child)       = angular rank among its parent's ring children
                       (center -> 0; ring rotated so the child nearest
                       angle 0 gets the first label; pentagons label
                       [1, 3, 4, 5, 6] — the Z7 digit-2 skip)
  z7_of_flat(cell)   = walk parents to res 0 collecting digits; base cell
                       = angular order of the 12 res-0 corners.
"""

from __future__ import annotations

import numpy as np

from .igeo7 import _PAD
from .isea7h_flat import ISEA7HFlatGrid, pack, unpack, _OMEGA
from .sphere import lonlat_to_unit, unit_to_lonlat


def _axial_to_xy(a, b):
    """Eisenstein axial -> complex plane units (basis 1, omega)."""
    return a + 0.5 * b, (np.sqrt(3.0) / 2.0) * b


class Z7Bridge:
    def __init__(self, grid: ISEA7HFlatGrid | None = None):
        self.g = grid or ISEA7HFlatGrid()
        # fixed base-cell numbering: the 12 icosahedron vertices in the
        # order the Icosahedron constructor defines them (pole, ring1 x5,
        # ring2 x5, antipode) — matching the IGEO7 tree engine's bases
        ic = self.g.proj.icosa
        self._base_pos = ic.vertices  # (12, 3)

    # -- structure ops -------------------------------------------------------

    def parent_of(self, ids: np.ndarray, res: int) -> np.ndarray:
        lon, lat = self.g.decode(ids, res)
        return self.g.encode(lon, lat, res - 1)

    def ring_children(self, parent_ids: np.ndarray, child_res: int):
        """(n, 6) flat ids of each parent's ring children (pentagons yield 5
        distinct + 1 duplicate-of-center slot marked -1) + their offset
        angles in the parent plane."""
        g = self.g
        pf, pa, pb = unpack(parent_ids)
        # parent axial at child_res
        pra = 2 * pa - pb
        prb = pa + 3 * pb
        n = len(parent_ids)
        out = np.full((n, 6), -1, dtype=np.int64)
        ang = np.full((n, 6), np.nan)
        units = [(1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)]
        center = pack(pf, pa, pb)  # same point at coarse coords; child id below
        # child-res id of the parent point itself:
        center_child = pack(pf, pra, prb)
        for k, (ua, ub) in enumerate(units):
            ca = pra + ua
            cb = prb + ub
            x, y = g._plane_of(ca.astype(np.float64), cb.astype(np.float64), child_res)
            pos = g.proj.inverse_unit(pf, x, y)
            lo, la = unit_to_lonlat(pos)
            snapped = g.encode(lo, la, child_res)
            out[:, k] = snapped
            # offset angle of the SNAPPED child in the parent plane
            spos = lonlat_to_unit(*g.decode(snapped, child_res))
            _, sx, sy = g._forward_on_face(spos, pf)
            sa, sb = g._axial_of_plane(sx, sy, child_res)
            ox, oy = _axial_to_xy(sa - pra, sb - prb)
            ang[:, k] = np.arctan2(oy, ox)
        # drop snaps that are not really children (their parent is another
        # coarse cell) and duplicates of the center child
        for k in range(6):
            dup_center = out[:, k] == center_child
            out[:, k] = np.where(dup_center, -1, out[:, k])
        # dedup identical snaps across slots (pentagon wrap)
        for k in range(6):
            for k2 in range(k + 1, 6):
                same = (out[:, k2] == out[:, k]) & (out[:, k] != -1)
                out[same, k2] = -1
        # keep only TRUE children: a snap near a pentagon can land on a cell
        # owned by a neighboring parent (which would inflate a pentagon to 6
        # ring members and emit the forbidden digit 2)
        flat = out.reshape(-1)
        ok = flat != -1
        if ok.any():
            uniqc, inv = np.unique(flat[ok], return_inverse=True)
            par_u = self.parent_of(uniqc, child_res)
            par_flat = np.full(len(flat), -1, dtype=np.int64)
            par_flat[ok] = par_u[inv]
            want = np.repeat(parent_ids, 6)
            flat = np.where(par_flat == want, flat, -1)
            out = flat.reshape(n, 6)
        return center_child, out, ang

    def digits_of(self, ids: np.ndarray, res: int):
        """(parents, digits) for cells at `res` (vectorized per batch)."""
        parents = self.parent_of(ids, res)
        center_child, ring, ang = self.ring_children(parents, res)
        n = len(ids)
        digits = np.full(n, -1, dtype=np.int64)
        is_center = ids == center_child
        digits[is_center] = 0
        # for ring cells: find slot, then angular-rank labeling
        for i in np.nonzero(~is_center)[0]:
            slots = np.nonzero(ring[i] == ids[i])[0]
            valid = ring[i] != -1
            th = ang[i][valid]
            members = ring[i][valid]
            order = np.argsort(th)
            members = members[order]
            th = th[order]
            start = int(np.argmin(np.abs(th)))
            members = np.concatenate([members[start:], members[:start]])
            labels = [1, 2, 3, 4, 5, 6] if len(members) == 6 else [1, 3, 4, 5, 6]
            pos = np.nonzero(members == ids[i])[0]
            if len(pos):
                digits[i] = labels[int(pos[0])]
        return parents, digits

    def base_of(self, res0_ids: np.ndarray) -> np.ndarray:
        """Flat res-0 cells (the 12 corners) -> base numbers 0..11."""
        lon, lat = self.g.decode(res0_ids, 0)
        pos = lonlat_to_unit(lon, lat)
        return np.argmax(pos @ self._base_pos.T, axis=1).astype(np.int64)

    def z7_of_flat(self, ids: np.ndarray, res: int) -> np.ndarray:
        """Flat cell ids at `res` -> Z7 int64 ids (reference bit layout)."""
        ids = np.asarray(ids, dtype=np.int64)
        cur = ids
        digit_cols = []
        for r in range(res, 0, -1):
            parents, digits = self.digits_of(cur, r)
            digit_cols.append(digits)
            cur = parents
        base = self.base_of(cur)
        z = base.astype(np.uint64) << np.uint64(60)
        for k, digits in enumerate(reversed(digit_cols)):
            z = z | (digits.astype(np.uint64) << np.uint64(57 - 3 * k))
        return (z | _PAD[res]).view(np.int64)
