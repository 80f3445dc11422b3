"""ISEA4H — aperture-4 hexagon grid from Snyder face-vertex lattices.

Construction (projection-exact, no generative drift): cell centers at
resolution r are the vertices of the 2^r-subdivided icosahedron faces,
positioned by the Snyder equal-area inverse of the barycentric lattice
points.  Face edges map exactly to plane chords (verified in snyder.py), so
edge lattice points coincide between adjacent faces; the cell count is
exactly 10*4^r + 2.

Cell identity: (face, i, j) barycentric indices with i+j <= n, n = 2^r,
canonicalized for shared edge/corner points to the owning face = the
sharing face with the lowest index.  Packed id: face << 56 | i << 28 | j.

A point's cell is its nearest center by true spherical distance; encode
rounds in the containing face's plane and (near edges) also in the
adjacent faces' planes, comparing candidates in 3D.

Hierarchy note: aperture-4 hexagon grids have no clean 1:4 parent-child
ownership (edge-midpoint children are shared) — the reference likewise only
supports hierarchy ops on IGEO7 (reference README.md:106-111); `parent_of`
here uses the deterministic nearest-coarse-center rule.
"""

from __future__ import annotations

import numpy as np

from .snyder import chart_for
from .sphere import unit_to_lonlat, lonlat_to_unit

_FMASK = (np.int64(1) << 28) - 1


def pack(face, i, j):
    return (np.asarray(face, np.int64) << 56) | (np.asarray(i, np.int64) << 28) | np.asarray(j, np.int64)


def unpack(ids):
    ids = np.asarray(ids, dtype=np.int64)
    return ids >> 56, (ids >> 28) & _FMASK, ids & _FMASK


class ISEA4HGrid:
    def __init__(self, pole_lon: float = 11.25, pole_lat: float = 58.28252559,
                 azimuth: float = 0.0, projection: str = "ISEA"):
        self.projection = projection.upper()
        self.proj = chart_for(projection, pole_lon=pole_lon, pole_lat=pole_lat,
                              azimuth=azimuth)
        ic = self.proj.icosa
        # plane corners in face_vertices slot order: slot s -> plane corner
        # (slot order (v0, v1, v2) sits at plane corners (0, 2, 1))
        from .snyder import R_VERTEX_PLANE
        ang = np.array([np.pi / 2, np.pi / 2 + 4 * np.pi / 3, np.pi / 2 + 2 * np.pi / 3])
        self.slot_corners = np.stack([R_VERTEX_PLANE * np.cos(ang),
                                      R_VERTEX_PLANE * np.sin(ang)], axis=1)

    # -- geometry -----------------------------------------------------------

    def _bary(self, x, y):
        a, b, c = self.slot_corners
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        l0 = ((b[1] - c[1]) * (x - c[0]) + (c[0] - b[0]) * (y - c[1])) / det
        l1 = ((c[1] - a[1]) * (x - c[0]) + (a[0] - c[0]) * (y - c[1])) / det
        return l0, l1, 1.0 - l0 - l1

    def _plane_of(self, i, j, n):
        """Lattice (i, j) -> plane coords (i ~ slot0 weight, j ~ slot1)."""
        a, b, c = self.slot_corners
        w0 = i / n
        w1 = j / n
        w2 = 1.0 - w0 - w1
        return (w0 * a[0] + w1 * b[0] + w2 * c[0],
                w0 * a[1] + w1 * b[1] + w2 * c[1])

    def center_unit(self, ids, res: int) -> np.ndarray:
        face, i, j = unpack(ids)
        n = 1 << res
        x, y = self._plane_of(i.astype(np.float64), j.astype(np.float64), n)
        return self.proj.inverse_unit(face, x, y)

    def decode(self, ids, res: int):
        return unit_to_lonlat(self.center_unit(ids, res))

    # -- canonicalization ---------------------------------------------------

    def canonicalize(self, face, i, j, res: int):
        """Shared edge/corner lattice points -> owning (lowest) face."""
        return self.canonicalize_n(face, i, j, 1 << res)

    def canonicalize_n(self, face, i, j, n: int):
        face = np.asarray(face, np.int64).copy()
        i = np.asarray(i, np.int64).copy()
        j = np.asarray(j, np.int64).copy()
        boundary = (i == 0) | (j == 0) | (i + j == n)
        if boundary.any():
            pos = self.proj.inverse_unit(face[boundary],
                                         *self._plane_of(i[boundary].astype(float),
                                                         j[boundary].astype(float), n))
            # owner = lowest face index among faces whose triangle contains pos
            dots = pos @ self.proj.icosa.face_centers.T        # (m, 20)
            best = dots.max(axis=1, keepdims=True)
            shared = dots > best - 1e-9
            owner = np.argmax(shared, axis=1).astype(np.int64)  # first True = lowest idx
            # recompute (i, j) in the owner plane
            fo, xo, yo = self._forward_on_face(pos, owner)
            l0, l1, _ = self._bary(xo, yo)
            io = np.clip(np.rint(l0 * n), 0, n).astype(np.int64)
            jo = np.clip(np.rint(l1 * n), 0, n).astype(np.int64)
            face[boundary] = owner
            i[boundary] = io
            j[boundary] = jo
        return face, i, j

    def _forward_on_face(self, p, face):
        """Snyder forward constrained to a given face (for points on/near its
        boundary)."""
        ic = self.proj.icosa
        # temporarily emulate forward_unit with chosen face
        c = ic.face_centers[face]
        tx = ic.tangent_x[face]
        ty = ic.tangent_y[face]
        import numpy as _np
        from . import snyder as S
        px = _np.sum(p * tx, axis=-1)
        py = _np.sum(p * ty, axis=-1)
        pz = _np.clip(_np.sum(p * c, axis=-1), -1.0, 1.0)
        z = _np.arccos(pz)
        az = _np.arctan2(px, py)
        az = _np.where(az < 0, az + 2 * _np.pi, az)
        sector = _np.floor(az / S.DEG120)
        az1 = az - sector * S.DEG120
        flip = az1 > S.DEG60
        az1 = _np.where(flip, S.DEG120 - az1, az1)
        q = _np.arctan2(S.TAN_G, _np.cos(az1) + _np.sin(az1) * S.COT_THETA)
        H = _np.arccos(_np.clip(_np.sin(az1) * S.SIN_G_ANG * S.COS_G
                                - _np.cos(az1) * S.COS_G_ANG, -1, 1))
        AG = az1 + S.G_ANG + H - _np.pi
        azp = _np.arctan2(2.0 * AG, S.RPRIME**2 * S.TAN_G**2 - 2.0 * AG * S.COT_THETA)
        dp = S.RPRIME * S.TAN_G / (_np.cos(azp) + _np.sin(azp) * S.COT_THETA)
        f = dp / (2.0 * S.RPRIME * _np.sin(q / 2.0))
        rho = 2.0 * S.RPRIME * f * _np.sin(_np.clip(z, 0, q) / 2.0)
        azp_full = _np.where(flip, S.DEG120 - azp, azp) + sector * S.DEG120
        return face, rho * _np.sin(azp_full), rho * _np.cos(azp_full)

    # -- encode -------------------------------------------------------------

    def encode(self, lon, lat, res: int) -> np.ndarray:
        """Nearest-center cell assignment (3D-exact across face boundaries)."""
        p = lonlat_to_unit(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
        n = 1 << res
        npts = p.shape[0]
        ic = self.proj.icosa
        dots = p @ ic.face_centers.T
        order = np.argsort(-dots, axis=1)[:, :3]   # own face + 2 nearest others
        best_score = np.full(npts, -2.0)
        best_face = np.zeros(npts, dtype=np.int64)
        best_i = np.zeros(npts, dtype=np.int64)
        best_j = np.zeros(npts, dtype=np.int64)
        margin = np.cos(1.5 * (np.arctan(2.0) / n))  # candidate faces within ~1.5 cells
        cell_rad = np.arctan(2.0) / n
        d0 = np.arccos(np.clip(dots[np.arange(npts), order[:, 0]], -1, 1))
        for k in range(3):
            face = order[:, k]
            if k == 0:
                active = np.ones(npts, dtype=bool)
            else:
                # only points near a face boundary need foreign candidates
                dk = np.arccos(np.clip(dots[np.arange(npts), face], -1, 1))
                active = dk < d0 + 1.6 * cell_rad
            if not active.any():
                continue
            fa = face[active]
            _, x, y = self._forward_on_face(p[active], fa)
            l0, l1, l2 = self._bary(x, y)
            # candidate lattice points: corners of the containing sub-triangle
            f0 = np.floor(l0 * n)
            f1 = np.floor(l1 * n)
            for di, dj in ((0, 0), (1, 0), (0, 1), (1, 1)):
                ci = np.clip(f0 + di, 0, n).astype(np.int64)
                cj = np.clip(f1 + dj, 0, n).astype(np.int64)
                ok = ci + cj <= n
                if not ok.any():
                    continue
                cx, cy = self._plane_of(ci[ok].astype(float), cj[ok].astype(float), n)
                cpos = self.proj.inverse_unit(fa[ok], cx, cy)
                score = np.sum(cpos * p[active][ok], axis=-1)
                idx = np.nonzero(active)[0][ok]
                upd = score > best_score[idx]
                ui = idx[upd]
                best_score[ui] = score[upd]
                best_face[ui] = fa[ok][upd]
                best_i[ui] = ci[ok][upd]
                best_j[ui] = cj[ok][upd]
        face, i, j = self.canonicalize(best_face, best_i, best_j, res)
        return pack(face, i, j)

    # -- topology -----------------------------------------------------------

    _NB_OFFS = np.array([(1, 0), (0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1)])

    def neighbors(self, ids, res: int) -> np.ndarray:
        """(n, 6) neighbor ids (pentagon corners have 5; padded with -1).
        Lattice steps, with cross-edge handling via probe-encode."""
        ids = np.asarray(ids, dtype=np.int64)
        face, i, j = unpack(ids)
        n = 1 << res
        out = np.full((len(ids), 6), -1, dtype=np.int64)
        for k, (di, dj) in enumerate(self._NB_OFFS):
            ni = i + di
            nj = j + dj
            inside = (ni >= 0) & (nj >= 0) & (ni + nj <= n)
            if inside.any():
                cf, ci, cj = self.canonicalize(face[inside], ni[inside], nj[inside], res)
                out[inside, k] = pack(cf, ci, cj)
            outside = ~inside
            if outside.any():
                # step across the face edge: probe just beyond the midpoint
                x0, y0 = self._plane_of(i[outside].astype(float), j[outside].astype(float), n)
                x1, y1 = self._plane_of(ni[outside].astype(float), nj[outside].astype(float), n)
                px = x0 + 0.98 * (x1 - x0)
                py = y0 + 0.98 * (y1 - y0)
                pos = self.proj.inverse_unit(face[outside], px, py)
                lo, la = unit_to_lonlat(pos)
                out[outside, k] = self.encode(lo, la, res)
        # pentagon corners: dedup slots
        self_ids = ids[:, None]
        out = np.where(out == self_ids, -1, out)
        for r in range(len(ids)):
            seen = set()
            for k in range(6):
                if out[r, k] in seen:
                    out[r, k] = -1
                else:
                    seen.add(out[r, k])
        return out

    @staticmethod
    def num_cells(res: int) -> int:
        return 10 * 4**res + 2

    def parent_of(self, ids, res: int) -> np.ndarray:
        """Deterministic nearest-coarse-center parent (no exact 1:4 nesting
        for aperture-4 hexagons)."""
        lon, lat = self.decode(ids, res)
        return self.encode(lon, lat, res - 1)


class ISEA3HGrid:
    """ISEA3H — aperture-3 hexagons from Snyder face lattices.

    Centers at res r: vertices of the n-subdivided faces with
    n = 3^(floor(r/2)); odd r additionally includes the centroid of every
    small triangle (Class II "rotated" level).  Counts: even r -> 10*3^r+2
    vertices; odd r -> 10*3^(r-1)+2 vertices + 20*3^(r-1) centroids
    = 10*3^r + 2.  Exactly DGGRID's alternating aperture-3 structure
    (reference ISEA3H, dggrid_runner.py:67).

    Ids: vertices pack like ISEA4H ((face,i,j) canonical, lowest-face
    ownership); centroids pack with a flag bit and their (up/down, i, j)
    sub-triangle coords (strictly interior to a face, so no sharing).
    """

    _CENT_FLAG = np.int64(1) << 55

    def __init__(self, **orient):
        self.base = ISEA4HGrid(**orient)

    def _n(self, res: int) -> int:
        return 3 ** (res // 2)

    @staticmethod
    def num_cells(res: int) -> int:
        return 10 * 3**res + 2

    def enumerate_cells(self, res: int) -> np.ndarray:
        """All canonical cell ids at `res` (exactly 10*3^res + 2)."""
        n = self._n(res)
        ii, jj = np.meshgrid(np.arange(n + 1), np.arange(n + 1), indexing="ij")
        keep = (ii + jj) <= n
        ii, jj = ii[keep], jj[keep]
        all_ids = []
        for f in range(20):
            face = np.full(len(ii), f, dtype=np.int64)
            cf, ci, cj = self.base.canonicalize_n(face, ii, jj, n)
            all_ids.append(pack(cf, ci, cj))
        ids = [np.unique(np.concatenate(all_ids))]
        if self._class2(res):
            for f in range(20):
                for upv, lim in ((1, n - 1), (0, n - 2)):
                    ti, tj = np.meshgrid(np.arange(lim + 1), np.arange(lim + 1),
                                         indexing="ij")
                    k2 = (ti + tj) <= lim
                    ti, tj = ti[k2], tj[k2]
                    ids.append((np.int64(f) << 56) | self._CENT_FLAG
                               | (np.int64(upv) << 54) | (ti.astype(np.int64) << 27)
                               | tj.astype(np.int64))
        return np.concatenate(ids)

    def _centroid_plane(self, i, j, up, n):
        """Centroid of sub-triangle (i, j, up): up-triangle corners
        (i,j),(i+1,j),(i,j+1); down-triangle corners (i+1,j),(i,j+1),(i+1,j+1)."""
        ci = np.where(up, i + 1.0 / 3.0, i + 2.0 / 3.0)
        cj = np.where(up, j + 1.0 / 3.0, j + 2.0 / 3.0)
        return self.base._plane_of(ci, cj, n)

    def decode(self, ids, res: int):
        from .sphere import unit_to_lonlat
        ids = np.asarray(ids, dtype=np.int64)
        n = self._n(res)
        is_cent = (ids & self._CENT_FLAG) != 0
        out = np.zeros((len(ids), 3))
        if (~is_cent).any():
            out[~is_cent] = self.base.center_unit(ids[~is_cent], int(np.log2(n)) if False else 0) \
                if False else self._vertex_unit(ids[~is_cent], n)
        if is_cent.any():
            v = ids[is_cent] & ~self._CENT_FLAG
            face = v >> 56
            up = ((v >> 54) & 1).astype(bool)
            i = (v >> 27) & ((1 << 27) - 1)
            j = v & ((1 << 27) - 1)
            x, y = self._centroid_plane(i.astype(float), j.astype(float), up, n)
            out[is_cent] = self.base.proj.inverse_unit(face, x, y)
        return unit_to_lonlat(out)

    def _vertex_unit(self, ids, n):
        face, i, j = unpack(ids)
        x, y = self.base._plane_of(i.astype(np.float64), j.astype(np.float64), n)
        return self.base.proj.inverse_unit(face, x, y)

    def _pack_centroid(self, face, i, j, up):
        return ((np.asarray(face, np.int64) << 56) | self._CENT_FLAG
                | (np.asarray(up, np.int64) << 54)
                | (np.asarray(i, np.int64) << 27) | np.asarray(j, np.int64))

    def _class2(self, res: int) -> bool:
        """Class II level: centroids added on top of the vertex lattice."""
        return res % 2 == 1

    def encode(self, lon, lat, res: int) -> np.ndarray:
        """Nearest-center assignment among vertices (and, at Class II res,
        centroids), 3D-exact across faces."""
        p = lonlat_to_unit(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
        n = self._n(res)
        odd = self._class2(res)
        npts = p.shape[0]
        ic = self.base.proj.icosa
        dots = p @ ic.face_centers.T
        order = np.argsort(-dots, axis=1)[:, :3]
        cell_rad = np.arctan(2.0) / n
        d0 = np.arccos(np.clip(dots[np.arange(npts), order[:, 0]], -1, 1))
        best_score = np.full(npts, -2.0)
        best_id = np.zeros(npts, dtype=np.int64)
        for k in range(3):
            face = order[:, k]
            if k == 0:
                active = np.ones(npts, dtype=bool)
            else:
                dk = np.arccos(np.clip(dots[np.arange(npts), face], -1, 1))
                active = dk < d0 + 1.6 * cell_rad
            if not active.any():
                continue
            fa = face[active]
            _, x, y = self.base._forward_on_face(p[active], fa)
            l0, l1, _ = self.base._bary(x, y)
            f0 = np.floor(l0 * n)
            f1 = np.floor(l1 * n)
            act_idx = np.nonzero(active)[0]
            # vertex candidates: corners of the containing sub-cell
            for di, dj in ((0, 0), (1, 0), (0, 1), (1, 1)):
                ci = np.clip(f0 + di, 0, n).astype(np.int64)
                cj = np.clip(f1 + dj, 0, n).astype(np.int64)
                ok = ci + cj <= n
                if not ok.any():
                    continue
                cx, cy = self.base._plane_of(ci[ok].astype(float), cj[ok].astype(float), n)
                cpos = self.base.proj.inverse_unit(fa[ok], cx, cy)
                score = np.sum(cpos * p[active][ok], axis=-1)
                idx = act_idx[ok]
                upd = score > best_score[idx]
                ui = idx[upd]
                best_score[ui] = score[upd]
                bf, bi, bj = self.base.canonicalize_n(fa[ok][upd], ci[ok][upd],
                                                      cj[ok][upd], n)
                best_id[ui] = pack(bf, bi, bj)
            if odd:
                # centroid candidates: full 1-ring of sub-triangles around the
                # containing cell (nearest centroid can be any of the ~6
                # triangles around the nearest lattice vertex)
                for di in (-1, 0, 1):
                    for dj in (-1, 0, 1):
                        for upv in (True, False):
                            ti = (f0 + di).astype(np.int64)
                            tj = (f1 + dj).astype(np.int64)
                            up = np.full(len(ti), upv)
                            ok = (ti >= 0) & (tj >= 0)
                            ok &= np.where(up, ti + tj <= n - 1, ti + tj <= n - 2)
                            if not ok.any():
                                continue
                            cx, cy = self._centroid_plane(ti[ok].astype(float),
                                                          tj[ok].astype(float), up[ok], n)
                            cpos = self.base.proj.inverse_unit(fa[ok], cx, cy)
                            score = np.sum(cpos * p[active][ok], axis=-1)
                            idx = act_idx[ok]
                            upd = score > best_score[idx]
                            ui = idx[upd]
                            best_score[ui] = score[upd]
                            best_id[ui] = self._pack_centroid(
                                fa[ok][upd], ti[ok][upd], tj[ok][upd],
                                up[ok][upd].astype(np.int64))
        return best_id


class ISEA43HGrid(ISEA3HGrid):
    """ISEA43H — mixed-aperture hexagons: the first ``ap4_levels``
    resolutions subdivide by aperture 4, the remaining by aperture 3 with
    the usual Class I/II alternation (reference `specify_topo_aperture`
    MIXED43, dggrid_runner.py:2100-2183; PLANETRISK preset :834-854).

    Centers at res r: the vertex lattice of the n-subdivided faces with
    n = 2^min(r, a) * 3^floor((r - a)/2), plus the sub-triangle centroids
    when the aperture-3 excess is odd (Class II).  Cell count is exactly
    10 * 4^min(r, a) * 3^max(r - a, 0) + 2.
    """

    def __init__(self, ap4_levels: int = 7, **orient):
        super().__init__(**orient)
        self.ap4 = int(ap4_levels)

    def _n(self, res: int) -> int:
        if res <= self.ap4:
            return 1 << res
        return (1 << self.ap4) * 3 ** ((res - self.ap4) // 2)

    def _class2(self, res: int) -> bool:
        return res > self.ap4 and (res - self.ap4) % 2 == 1

    def num_cells_mixed(self, res: int) -> int:
        a = min(res, self.ap4)
        return 10 * 4**a * 3 ** max(res - a, 0) + 2


# -- Z3 / Z3_STRING codec for aperture-3 grids --------------------------------
# Reference v7 address types Z3/Z3_STRING (dggrid_runner.py:131-132; v8
# HIERNDX system Z3 :174-184), "especially useful for ISEA3H".  The DGGRID
# binary's Z3 bit conventions are not reproducible from the reference repo
# (no Z3 sample output exists there), so this codec uses a documented own
# layout — exactly round-trippable, which is the property the reference's
# own tests rely on (set-equality of ids):
#
#   int64:  face(5b) << 58 | cent(1b) << 57 | up(1b) << 56
#           | one 4-bit slot per Class-I level pair holding the base-3 digit
#             pair (3*di + dj, 0..8) of (i, j), most-significant level first
#   string: zero-padded 2-digit face + one char ('0'..'8') per level pair,
#           with a trailing 'c'/'d' marker for Class II centroid cells
#           (up / down sub-triangle).

def _z3_levels(res: int) -> int:
    # i, j range over 0..3^(res//2) INCLUSIVE: one extra digit pair
    return res // 2 + 1


def z3_pack(ids: np.ndarray, res: int) -> np.ndarray:
    """ISEA3H cell ids at `res` -> Z3 int64 (own layout, bijective)."""
    ids = np.asarray(ids, dtype=np.int64)
    m = _z3_levels(res)
    cent = (ids & ISEA3HGrid._CENT_FLAG) != 0
    face = np.where(cent, ids >> 56, ids >> 56)
    up = np.where(cent, (ids >> 54) & 1, 0)
    i = np.where(cent, (ids >> 27) & ((1 << 27) - 1), (ids >> 28) & _FMASK)
    j = np.where(cent, ids & ((1 << 27) - 1), ids & _FMASK)
    out = (face.astype(np.uint64) << np.uint64(58)) \
        | (cent.astype(np.uint64) << np.uint64(57)) \
        | (up.astype(np.uint64) << np.uint64(56))
    ii = i.astype(np.int64).copy()
    jj = j.astype(np.int64).copy()
    for k in range(m):
        di = (ii // 3 ** (m - 1 - k)) % 3
        dj = (jj // 3 ** (m - 1 - k)) % 3
        out |= (3 * di + dj).astype(np.uint64) << np.uint64(52 - 4 * k)
    return out.view(np.int64)


def z3_unpack(z3: np.ndarray, res: int) -> np.ndarray:
    """Inverse of z3_pack."""
    z = np.asarray(z3, dtype=np.int64).view(np.uint64)
    m = _z3_levels(res)
    face = (z >> np.uint64(58)).astype(np.int64)
    cent = ((z >> np.uint64(57)) & np.uint64(1)).astype(bool)
    up = ((z >> np.uint64(56)) & np.uint64(1)).astype(np.int64)
    i = np.zeros(len(z), dtype=np.int64)
    j = np.zeros(len(z), dtype=np.int64)
    for k in range(m):
        pair = ((z >> np.uint64(52 - 4 * k)) & np.uint64(15)).astype(np.int64)
        i = i * 3 + pair // 3
        j = j * 3 + pair % 3
    vert = pack(face, i, j)
    cento = ((face << 56) | ISEA3HGrid._CENT_FLAG | (up << 54)
             | (i << 27) | j)
    return np.where(cent, cento, vert)


def z3_to_string(z3: np.ndarray, res: int) -> np.ndarray:
    z = np.asarray(z3, dtype=np.int64).view(np.uint64)
    m = _z3_levels(res)
    out = np.empty(len(z), dtype=object)
    for idx, v in enumerate(z):
        face = int(v >> np.uint64(58))
        cent = bool((v >> np.uint64(57)) & np.uint64(1))
        up = int((v >> np.uint64(56)) & np.uint64(1))
        s = f"{face:02d}" + "".join(
            str(int((v >> np.uint64(52 - 4 * k)) & np.uint64(15)))
            for k in range(m))
        if cent:
            s += "c" if up else "d"
        out[idx] = s
    return out


def z3_from_string(strings, res: int) -> np.ndarray:
    m = _z3_levels(res)
    out = np.empty(len(strings), dtype=np.uint64)
    for idx, s in enumerate(strings):
        face = int(s[:2])
        body = s[2:]
        cent = body and body[-1] in "cd"
        up = 1 if (cent and body[-1] == "c") else 0
        digs = body[:-1] if cent else body
        v = (np.uint64(face) << np.uint64(58)) \
            | (np.uint64(1 if cent else 0) << np.uint64(57)) \
            | (np.uint64(up) << np.uint64(56))
        for k in range(m):
            v |= np.uint64(int(digs[k])) << np.uint64(52 - 4 * k)
        out[idx] = v
    return out.view(np.int64)
