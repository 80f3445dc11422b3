"""Bridge: projection-exact flat aperture-7 cells <-> Z7 digit paths.

This is the position model the IGEO7 engine uses (round-2 swap, recipe
validated by experiments/z7_bijection_check.py): cell POSITIONS come from
the per-face Snyder lattice (isea7h_flat.py — projection-exact, no
pentagon-seam drift), while cell IDS keep the reference's Z7 64-bit digit
hierarchy (reference /root/reference/dggrid4py/igeo7.py:16-45).

Authoritative hierarchy definition (geometric, validated exhaustively at
res 1..4: exactly 7 children per hexagon / 6 per pentagon, zero duplicate
(parent, digit) pairs):

  parent(cell)     = flat-encode of the cell center at res-1
                     (exact nearest coarse center, cross-face canonical)
  ring(parent)     = the 6 ideal unit-offset lattice positions around the
                     parent in its owner-face plane, snapped by flat-encode
                     and filtered to true children (cross-parent filter)
  digit(child)     = angular rank among the parent's ring members: center
                     child -> 0; ring sorted by offset angle in the parent
                     plane, rotated so the member nearest angle 0 gets the
                     first label; hexagons label [1..6], pentagons
                     [1, 3, 4, 5, 6] (the Z7 digit-2 skip)
  base(res-0 cell) = icosahedron vertex index (orientation-fixed order)

Fast path (exact, no geometry): away from face edges the flat lattice is a
pure Eisenstein-integer structure, and Z[w]/(2+w) ~ F_7 gives each cell a
residue class (a - 2b) mod 7 that IS its digit's unit offset:

  child (a, b) = parent*(2+w) + u,  u in {0} + 6 units,
  parent = ((3(a-ua)+(b-ub))/7, (-(a-ua)+2(b-ub))/7)   (exact integers)

and the angular-rank labeling reduces to a fixed unit->digit table.  The
fast path provably equals the geometric rule whenever the child sits
>= ~2.5 lattice units inside its face (snaps are then identity and the ring
is the ideal hexagon); we use margin 4.5 for safety and fall back to the
vectorized geometric rule near edges/corners.  Levels <= CACHE_RES are
resolved through exhaustive per-level tables (built once per process,
/tmp-cached keyed by a stable md5 of the orientation).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from .isea7h_flat import ISEA7HFlatGrid, pack, unpack
from .sphere import lonlat_to_unit, unit_to_lonlat

_SQRT3_2 = np.sqrt(3.0) / 2.0

# residue rho = (a - 2b) mod 7  ->  unit offset (ua, ub) and Z7 digit
_RES_UA = np.array([0, 1, 0, 1, -1, 0, -1], dtype=np.int64)
_RES_UB = np.array([0, 0, -1, -1, 1, 1, 0], dtype=np.int64)
_RES_DIGIT = np.array([0, 1, 5, 6, 3, 2, 4], dtype=np.int64)
# digit -> unit offset
_DIG_UA = np.array([0, 1, 0, -1, -1, 0, 1], dtype=np.int64)
_DIG_UB = np.array([0, 0, 1, 1, 0, -1, -1], dtype=np.int64)

# circular ring labels by member count (hexagon 6, pentagon 5 w/ digit-2 skip)
_LAB6 = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
_LAB5 = np.array([1, 3, 4, 5, 6], dtype=np.int64)
# digit -> circular position (inverse of the above)
_POS6 = np.full(7, -1, dtype=np.int64)
_POS6[_LAB6] = np.arange(6)
_POS5 = np.full(7, -1, dtype=np.int64)
_POS5[_LAB5] = np.arange(5)

_FAST_MARGIN = 4.5  # lattice units from the face edge above which the
                    # Eisenstein fast path provably equals the geometric rule

CACHE_RES = 5  # exhaustive tables for res 0..CACHE_RES (res 5: 168,072 cells)

_PAD_SHIFTS = [np.uint64(57 - 3 * k) for k in range(20)]


def _pad_tail(res: int) -> np.uint64:
    v = np.uint64(0)
    for k in range(res, 20):
        v |= np.uint64(7) << _PAD_SHIFTS[k]
    return v


_PAD = np.array([_pad_tail(r) for r in range(21)], dtype=np.uint64)


def _axial_to_xy(a, b):
    """Eisenstein axial -> plane units (basis 1, omega)."""
    return a + 0.5 * b, _SQRT3_2 * b


class Z7Bridge:
    """Vectorized bidirectional converter between canonical flat lattice ids
    (face, a, b) and Z7 hierarchical ids, for one grid orientation."""

    def __init__(self, grid: ISEA7HFlatGrid | None = None):
        self.g = grid or ISEA7HFlatGrid()
        ic = self.g.proj.icosa
        self._base_pos = ic.vertices  # (12, 3): base-cell numbering order
        self._tables = None
        # per-res memo of slow-path (edge-band) results, grown across batches:
        # res -> (sorted keys, values...) — edge cells repeat heavily between
        # batches, so steady-state batches take the pure-integer path + lookup
        self._memo_up: dict[int, tuple] = {}
        self._memo_down: dict[int, tuple] = {}

    # -- geometric (authoritative) ops --------------------------------------

    def parent_of(self, ids: np.ndarray, res: int) -> np.ndarray:
        """Exact geometric parent: flat-encode of the center at res-1."""
        lon, lat = self.g.decode(ids, res)
        return self.g.encode(lon, lat, res - 1)

    # angle of each ideal ring slot's unit offset (slot k = digit k+1)
    _SLOT_ANG = np.array([np.arctan2(_SQRT3_2 * _DIG_UB[k + 1],
                                     _DIG_UA[k + 1] + 0.5 * _DIG_UB[k + 1])
                          for k in range(6)])

    def ring_children(self, parent_ids: np.ndarray, child_res: int):
        """(center_child (n,), ring (n, 6) flat ids -1-padded, ang (n, 6))
        — each parent's true ring children and their offset angles in the
        parent's owner-face plane.

        Everything is batched: ideal ring positions that land strictly inside
        the parent's face ARE canonical lattice cells (snap = identity, angle
        = the fixed unit angle); only out-of-face/corner slots go through one
        batched spherical snap, and only edge-risky candidates go through one
        batched geometric parent check.
        """
        g = self.g
        pf, pa, pb = unpack(parent_ids)
        pra = 2 * pa - pb      # parent axial at child_res
        prb = pa + 3 * pb
        n = len(parent_ids)
        center_child = pack(pf, pra, prb)
        ca = (pra[:, None] + _DIG_UA[None, 1:]).reshape(-1)
        cb = (prb[:, None] + _DIG_UB[None, 1:]).reshape(-1)
        faces = np.repeat(pf, 6)
        m_ideal = self._edge_margin(ca, cb, child_res)
        ideal_in = m_ideal > 1e-7          # strictly inside, not a corner
        out = np.where(ideal_in, pack(faces, ca, cb), np.int64(-1))
        ang = np.tile(self._SLOT_ANG, n)
        moved = ~ideal_in
        if moved.any():
            x, y = g._plane_of(ca[moved].astype(np.float64),
                               cb[moved].astype(np.float64), child_res)
            pos = g.proj.inverse_unit(faces[moved], x, y)
            lo, la = unit_to_lonlat(pos)
            snapped = g.encode(lo, la, child_res)
            out[moved] = snapped
            # offset angle of the SNAPPED child in the parent plane
            spos = lonlat_to_unit(*g.decode(snapped, child_res))
            _, sx, sy = g._forward_on_face(spos, faces[moved])
            sa, sb = g._axial_of_plane(sx, sy, child_res)
            ox, oy = _axial_to_xy(sa - pra.repeat(6)[moved].astype(np.float64),
                                  sb - prb.repeat(6)[moved].astype(np.float64))
            ang[moved] = np.arctan2(oy, ox)
        out = out.reshape(n, 6)
        ang = ang.reshape(n, 6)
        # drop duplicates of the center child and cross-slot duplicates
        for k in range(6):
            dup = out[:, k] == center_child
            out[:, k] = np.where(dup, -1, out[:, k])
        for k in range(6):
            for k2 in range(k + 1, 6):
                same = (out[:, k2] == out[:, k]) & (out[:, k] != -1)
                out[same, k2] = -1
        # keep only TRUE children (a snap near a corner can land on a cell
        # owned by a neighboring parent).  Deep-interior candidates have their
        # residue parent (fast, exact there); only edge-risky candidates need
        # the geometric nearest-coarse-center check.
        flat = out.reshape(-1)
        ok = flat != -1
        if ok.any():
            uniqc, inv = np.unique(flat[ok], return_inverse=True)
            cf2, ca2, cb2 = unpack(uniqc)
            m2 = self._edge_margin(ca2, cb2, child_res)
            rho = (ca2 - 2 * cb2) % 7
            ua = _RES_UA[rho]
            ub = _RES_UB[rho]
            par_u = pack(cf2, (3 * (ca2 - ua) + (cb2 - ub)) // 7,
                         (-(ca2 - ua) + 2 * (cb2 - ub)) // 7)
            risky = m2 < _FAST_MARGIN
            if risky.any():
                par_u[risky] = self.parent_of(uniqc[risky], child_res)
            par_flat = np.full(len(flat), -1, dtype=np.int64)
            par_flat[ok] = par_u[inv]
            want = np.repeat(parent_ids, 6)
            flat = np.where(par_flat == want, flat, -1)
            out = flat.reshape(n, 6)
        ang = np.where(out == -1, np.inf, ang.reshape(n, 6))
        return center_child, out, ang

    @staticmethod
    def _ring_order(ring: np.ndarray, ang: np.ndarray):
        """Canonical circular labeling state per parent row.

        Returns (sorted_ids (n, 6) — ring ids ascending by angle, -1-padded
        at the tail; start (n,) — circular start index (member nearest angle
        0); nval (n,) member count).  Shared by both conversion directions so
        the labeling is deterministic by construction.
        """
        valid = ring != -1
        ang_m = np.where(valid, ang, np.inf)
        order = np.argsort(ang_m, axis=1, kind="stable")
        sorted_ids = np.take_along_axis(np.where(valid, ring, -1), order, axis=1)
        sorted_ang = np.take_along_axis(ang_m, order, axis=1)
        start = np.argmin(np.abs(sorted_ang), axis=1)
        nval = valid.sum(axis=1)
        return sorted_ids, start, nval

    def _slow_digits(self, ids: np.ndarray, res: int):
        """Geometric (parents, digits) for cells at `res` — vectorized."""
        parents = self.parent_of(ids, res)
        uniq_p, pinv = np.unique(parents, return_inverse=True)
        center_child, ring, ang = self.ring_children(uniq_p, res)
        sorted_ids, start, nval = self._ring_order(ring, ang)
        digits = np.full(len(ids), -1, dtype=np.int64)
        is_center = ids == center_child[pinv]
        digits[is_center] = 0
        rest = ~is_center
        if rest.any():
            rows = pinv[rest]
            match = sorted_ids[rows] == ids[rest, None]     # (m, 6)
            found = match.any(axis=1)
            if not found.all():
                bad = ids[rest][~found]
                raise AssertionError(
                    f"{(~found).sum()} cells at res {res} are not children of "
                    f"their nearest coarse center (first flat ids: {bad[:5]})")
            slot = np.argmax(match, axis=1)
            pos = (slot - start[rows]) % np.maximum(nval[rows], 1)
            lab = np.where(nval[rows] == 6, _LAB6[np.minimum(pos, 5)],
                           _LAB5[np.minimum(pos, 4)])
            digits[rest] = lab
        return parents, digits

    def _slow_children(self, parent_ids: np.ndarray, digits: np.ndarray,
                       res: int) -> np.ndarray:
        """Geometric child selection: parent + digit -> child flat id."""
        uniq_p, pinv = np.unique(parent_ids, return_inverse=True)
        center_child, ring, ang = self.ring_children(uniq_p, res)
        sorted_ids, start, nval = self._ring_order(ring, ang)
        out = np.empty(len(parent_ids), dtype=np.int64)
        is_center = digits == 0
        out[is_center] = center_child[pinv[is_center]]
        rest = ~is_center
        if rest.any():
            rows = pinv[rest]
            nv = nval[rows]
            pos = np.where(nv == 6, _POS6[digits[rest]], _POS5[digits[rest]])
            if (pos < 0).any():
                bad = digits[rest][pos < 0]
                raise AssertionError(f"invalid digit(s) for pentagon parent: {bad[:5]}")
            slot = (start[rows] + pos) % np.maximum(nv, 1)
            out[rest] = sorted_ids[rows, slot]
            if (out[rest] == -1).any():
                raise AssertionError("digit selected an empty ring slot")
        return out

    # -- fast/slow dispatch per level ----------------------------------------

    def _edge_margin(self, a, b, res: int) -> np.ndarray:
        """Distance (in res-r lattice units) from lattice point (a, b) to the
        nearest face-triangle edge."""
        x, y = self.g._plane_of(a.astype(np.float64), b.astype(np.float64), res)
        l0, l1, l2 = self.g._bary(x, y)
        minl = np.minimum(np.minimum(l0, l1), l2)
        side = 7.0 ** (res / 2.0)
        return minl * side * _SQRT3_2

    @staticmethod
    def _memo_get(memo: dict, res: int, keys: np.ndarray):
        entry = memo.get(res)
        if entry is None:
            miss = np.ones(len(keys), dtype=bool)
            return miss, None
        mk = entry[0]
        pos = np.clip(np.searchsorted(mk, keys), 0, len(mk) - 1)
        hit = mk[pos] == keys
        return ~hit, tuple(v[pos] for v in entry[1:])

    @staticmethod
    def _memo_put(memo: dict, res: int, keys: np.ndarray, *values):
        entry = memo.get(res)
        if entry is None:
            order = np.argsort(keys)
            memo[res] = (keys[order],) + tuple(v[order] for v in values)
            return
        mk = np.concatenate([entry[0], keys])
        order = np.argsort(mk, kind="stable")
        memo[res] = (mk[order],) + tuple(
            np.concatenate([entry[1 + i], values[i]])[order]
            for i in range(len(values)))

    def level_digits(self, ids: np.ndarray, res: int):
        """(parents at res-1, digits) for UNIQUE cells at `res`."""
        f, a, b = unpack(ids)
        rho = (a - 2 * b) % 7
        ua = _RES_UA[rho]
        ub = _RES_UB[rho]
        pa = (3 * (a - ua) + (b - ub)) // 7
        pb = (-(a - ua) + 2 * (b - ub)) // 7
        parents = pack(f, pa, pb)
        digits = _RES_DIGIT[rho]
        risky = self._edge_margin(a, b, res) < _FAST_MARGIN
        if risky.any():
            ridx = np.nonzero(risky)[0]
            rids = ids[ridx]
            miss, cached = self._memo_get(self._memo_up, res, rids)
            if cached is not None and (~miss).any():
                hidx = ridx[~miss]
                parents[hidx] = cached[0][~miss]
                digits[hidx] = cached[1][~miss]
            if miss.any():
                sp, sd = self._slow_digits(rids[miss], res)
                parents[ridx[miss]] = sp
                digits[ridx[miss]] = sd
                self._memo_put(self._memo_up, res, rids[miss], sp, sd)
        return parents, digits

    def level_children(self, parent_ids: np.ndarray, digits: np.ndarray,
                       res: int) -> np.ndarray:
        """Child flat ids at `res` for per-row (parent at res-1, digit)."""
        f, pa, pb = unpack(parent_ids)
        pra = 2 * pa - pb
        prb = pa + 3 * pb
        child = pack(f, pra + _DIG_UA[digits], prb + _DIG_UB[digits])
        risky = self._edge_margin(pra, prb, res) < _FAST_MARGIN
        if risky.any():
            ridx = np.nonzero(risky)[0]
            # memo key: parent id (bits 0..58) + digit (bits 59..61)
            keys = parent_ids[ridx] | (digits[ridx] << np.int64(59))
            miss, cached = self._memo_get(self._memo_down, res, keys)
            if cached is not None and (~miss).any():
                child[ridx[~miss]] = cached[0][~miss]
            if miss.any():
                sc = self._slow_children(parent_ids[ridx[miss]],
                                         digits[ridx[miss]], res)
                child[ridx[miss]] = sc
                self._memo_put(self._memo_down, res, keys[miss], sc)
        return child

    # -- exhaustive level tables (res <= CACHE_RES) --------------------------

    def enumerate_cells(self, res: int) -> np.ndarray:
        """All canonical flat cell ids at `res` (exactly 10*7^res + 2)."""
        g = self.g
        # triangle corners in axial: (0,0), E, E*(1-omega) where E = (2+w)^res
        ea, eb = 1, 0
        for _ in range(res):
            ea, eb = 2 * ea - eb, ea + 3 * eb
        c1 = (ea, eb)
        c2 = (ea + eb, -ea)
        amin = min(0, c1[0], c2[0]) - 1
        amax = max(0, c1[0], c2[0]) + 1
        bmin = min(0, c1[1], c2[1]) - 1
        bmax = max(0, c1[1], c2[1]) + 1
        aa, bb = np.meshgrid(np.arange(amin, amax + 1), np.arange(bmin, bmax + 1),
                             indexing="ij")
        aa = aa.ravel()
        bb = bb.ravel()
        x, y = g._plane_of(aa.astype(np.float64), bb.astype(np.float64), res)
        l0, l1, l2 = g._bary(x, y)
        eps = 1e-9
        inside = (l0 >= -eps) & (l1 >= -eps) & (l2 >= -eps)
        aa, bb = aa[inside], bb[inside]
        l0, l1, l2 = l0[inside], l1[inside], l2[inside]
        all_ids = []
        for f in range(20):
            face = np.full(len(aa), f, dtype=np.int64)
            cf, ca, cb = g._canonical(face, aa.copy(), bb.copy(), l0, l1, l2, res)
            all_ids.append(pack(cf, ca, cb))
        return np.unique(np.concatenate(all_ids))

    def _cache_path(self) -> str:
        g = self.g
        p = g.proj.icosa
        key = (f"z7bridge_v1_{CACHE_RES}_{p.vertices[0, 0]:.12f}_"
               f"{p.vertices[0, 1]:.12f}_{p.vertices[0, 2]:.12f}_"
               f"{p.vertices[1, 0]:.12f}")
        return "/tmp/igeo7_z7bridge_" + hashlib.md5(key.encode()).hexdigest() + ".npz"

    def ensure_tables(self):
        """Build (or load) the per-level exhaustive flat<->z7 tables for
        res 0..CACHE_RES.  Once per process; /tmp-cached per orientation."""
        if self._tables is not None:
            return self._tables
        path = self._cache_path()
        if os.path.exists(path):
            try:
                z = np.load(path)
                self._tables = [
                    {"flat": z[f"flat{r}"], "z7_by_flat": z[f"zf{r}"],
                     "z7": z[f"z7{r}"], "flat_by_z7": z[f"fz{r}"]}
                    for r in range(CACHE_RES + 1)
                ]
                return self._tables
            except Exception:
                pass
        tables = []
        # res 0: the 12 corners; base = nearest icosahedron vertex
        ids0 = self.enumerate_cells(0)
        lon, lat = self.g.decode(ids0, 0)
        pos = lonlat_to_unit(lon, lat)
        base = np.argmax(pos @ self._base_pos.T, axis=1).astype(np.uint64)
        z0 = ((base << np.uint64(60)) | _PAD[0]).view(np.int64)
        tables.append(self._sorted_pair(ids0, z0))
        for r in range(1, CACHE_RES + 1):
            ids = self.enumerate_cells(r)
            parents, digits = self.level_digits(ids, r)
            pz7 = self._lookup(tables[r - 1]["flat"], tables[r - 1]["z7_by_flat"],
                               parents).view(np.uint64)
            shift = _PAD_SHIFTS[r - 1]
            z = ((pz7 & ~(np.uint64(7) << shift))
                 | (digits.astype(np.uint64) << shift)).view(np.int64)
            tables.append(self._sorted_pair(ids, z))
        self._tables = tables
        try:
            tmp = path + f".tmp{os.getpid()}"
            save = {}
            for r, t in enumerate(tables):
                save[f"flat{r}"] = t["flat"]
                save[f"zf{r}"] = t["z7_by_flat"]
                save[f"z7{r}"] = t["z7"]
                save[f"fz{r}"] = t["flat_by_z7"]
            np.savez(tmp, **save)
            os.replace(tmp + ".npz", path)
        except Exception:
            pass
        return tables

    @staticmethod
    def _sorted_pair(flat_ids: np.ndarray, z7_ids: np.ndarray) -> dict:
        of = np.argsort(flat_ids)
        oz = np.argsort(z7_ids)
        return {"flat": flat_ids[of], "z7_by_flat": z7_ids[of],
                "z7": z7_ids[oz], "flat_by_z7": flat_ids[oz]}

    @staticmethod
    def _lookup(sorted_keys: np.ndarray, values: np.ndarray,
                queries: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(sorted_keys, queries)
        pos = np.clip(pos, 0, len(sorted_keys) - 1)
        if not np.array_equal(sorted_keys[pos], queries):
            bad = queries[sorted_keys[pos] != queries]
            raise KeyError(f"{len(bad)} ids not in bridge table "
                           f"(first: {bad[:5]})")
        return values[pos]

    # -- public conversions ---------------------------------------------------

    def z7_of_flat(self, ids: np.ndarray, res: int) -> np.ndarray:
        """Canonical flat cell ids at `res` -> Z7 int64 ids."""
        ids = np.asarray(ids, dtype=np.int64)
        if res <= CACHE_RES:
            t = self.ensure_tables()[res]
            return self._lookup(t["flat"], t["z7_by_flat"], ids)
        uniq, inv = np.unique(ids, return_inverse=True)
        parents, digits = self.level_digits(uniq, res)
        pz7 = self.z7_of_flat(parents, res - 1).view(np.uint64)
        shift = _PAD_SHIFTS[res - 1]
        z = ((pz7 & ~(np.uint64(7) << shift))
             | (digits.astype(np.uint64) << shift)).view(np.int64)
        return z[inv]

    def flat_of_z7(self, z7: np.ndarray, res: int) -> np.ndarray:
        """Z7 int64 ids at `res` -> canonical flat cell ids."""
        z7 = np.asarray(z7, dtype=np.int64)
        if res <= CACHE_RES:
            t = self.ensure_tables()[res]
            return self._lookup(t["z7"], t["flat_by_z7"], z7)
        uniq, inv = np.unique(z7, return_inverse=True)
        shift = _PAD_SHIFTS[res - 1]
        u = uniq.view(np.uint64)
        digits = ((u >> shift) & np.uint64(7)).astype(np.int64)
        parent_z = (u | (np.uint64(7) << shift)).view(np.int64)
        pflat = self.flat_of_z7(parent_z, res - 1)
        child = self.level_children(pflat, digits, res)
        return child[inv]
