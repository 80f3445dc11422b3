"""ISEA4T / ISEA4D — aperture-4 triangle and diamond grids via Snyder.

Unlike hexagons, triangles nest exactly: each triangle splits into 4
children (3 corners + inverted center), entirely inside its parent and its
face — so this grid is projection-exact with no cross-face complications
(reference grids ISEA4T/ISEA4D, dggrid_runner.py:70-73).

Cell id (int64): face (5 bits) << 58 | path (2 bits per level, from slot 58)
| sentinel-free fixed `res` supplied by context... id layout:
    bits 63..59: face (0..19)
    bits 58..57: reserved 0
    2 bits per level from bit 56 down (level 1 first)
Resolution is carried externally (all engine APIs take `res`), matching the
reference's per-call resolution.

ISEA4D diamonds = pairs of triangles (quad q = upper face, diamond cell at
res r = two triangles); exposed via the diamond_id helpers.
"""

from __future__ import annotations

import numpy as np

from .snyder import chart_for, R_VERTEX_PLANE
from .sphere import unit_to_lonlat

_CORN_ANGLES = np.array([np.pi / 2, np.pi / 2 + 2 * np.pi / 3, np.pi / 2 + 4 * np.pi / 3])


class ISEA4TGrid:
    """Vectorized encode/decode/children/parent for the triangle grid."""

    def __init__(self, pole_lon: float = 11.25, pole_lat: float = 58.28252559,
                 azimuth: float = 0.0, projection: str = "ISEA"):
        self.projection = projection.upper()
        self.proj = chart_for(projection, pole_lon=pole_lon, pole_lat=pole_lat,
                              azimuth=azimuth)
        # plane corners of the canonical face triangle (same for every face)
        self.corners = np.stack([R_VERTEX_PLANE * np.cos(_CORN_ANGLES),
                                 R_VERTEX_PLANE * np.sin(_CORN_ANGLES)], axis=1)

    def _bary(self, x, y):
        """Plane (x, y) -> barycentric coords wrt the canonical triangle."""
        a, b, c = self.corners
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        l1 = ((b[1] - c[1]) * (x - c[0]) + (c[0] - b[0]) * (y - c[1])) / det
        l2 = ((c[1] - a[1]) * (x - c[0]) + (a[0] - c[0]) * (y - c[1])) / det
        return l1, l2, 1.0 - l1 - l2

    def encode(self, lon, lat, res: int) -> np.ndarray:
        """Geo -> triangle cell id at `res` (4^res triangles per face)."""
        face, x, y = self.proj.forward(np.asarray(lon, np.float64),
                                       np.asarray(lat, np.float64))
        l1, l2, l3 = self._bary(x, y)
        l1 = np.clip(l1, 0, 1); l2 = np.clip(l2, 0, 1); l3 = np.clip(l3, 0, 1)
        path = np.zeros(face.shape, dtype=np.int64)
        up = np.ones(face.shape, dtype=bool)  # orientation flag
        for _ in range(res):
            l1, l2, l3 = 2 * l1, 2 * l2, 2 * l3
            d1 = l1 >= 1.0
            d2 = (~d1) & (l2 >= 1.0)
            d3 = (~d1) & (~d2) & (l3 >= 1.0)
            center = ~(d1 | d2 | d3)
            digit = np.where(d1, 1, np.where(d2, 2, np.where(d3, 3, 0)))
            l1 = np.where(d1, l1 - 1.0, np.where(center, 1.0 - l1, l1))
            l2 = np.where(d2, l2 - 1.0, np.where(center, 1.0 - l2, l2))
            l3 = np.where(d3, l3 - 1.0, np.where(center, 1.0 - l3, l3))
            up = up ^ center
            path = (path << 2) | digit
        return (face.astype(np.int64) << 58) | path

    def decode(self, ids: np.ndarray, res: int):
        """Cell id -> centroid (lon, lat): replay the path on explicit
        sub-triangle corners (digit d>=1 keeps corner d and the two adjacent
        midpoints; digit 0 is the inverted middle triangle of the three
        midpoints — the exact inverse of the encode subdivision)."""
        ids = np.asarray(ids, dtype=np.int64)
        face = ids >> 58
        n = ids.shape[0] if ids.ndim else 1
        A = np.broadcast_to(self.corners[0], (n, 2)).copy()
        B = np.broadcast_to(self.corners[1], (n, 2)).copy()
        C = np.broadcast_to(self.corners[2], (n, 2)).copy()
        for k in range(res - 1, -1, -1):
            digit = ((ids >> (2 * k)) & 0x3)[:, None]
            mab = (A + B) / 2
            mbc = (B + C) / 2
            mca = (C + A) / 2
            nA = np.where(digit == 1, A, np.where(digit == 2, mab,
                          np.where(digit == 3, mca, mbc)))
            nB = np.where(digit == 1, mab, np.where(digit == 2, B,
                          np.where(digit == 3, mbc, mca)))
            nC = np.where(digit == 1, mca, np.where(digit == 2, mbc,
                          np.where(digit == 3, C, mab)))
            A, B, C = nA, nB, nC
        cen = (A + B + C) / 3.0
        return self.proj.inverse(face, cen[:, 0], cen[:, 1])

    def corners_plane(self, ids: np.ndarray, res: int):
        """Cell id -> (face, A, B, C) plane corners of the sub-triangle
        (the same replay as decode, exposed for boundary output)."""
        ids = np.asarray(ids, dtype=np.int64)
        face = ids >> 58
        n = len(ids)
        A = np.broadcast_to(self.corners[0], (n, 2)).copy()
        B = np.broadcast_to(self.corners[1], (n, 2)).copy()
        C = np.broadcast_to(self.corners[2], (n, 2)).copy()
        for k in range(res - 1, -1, -1):
            digit = ((ids >> (2 * k)) & 0x3)[:, None]
            mab = (A + B) / 2
            mbc = (B + C) / 2
            mca = (C + A) / 2
            nA = np.where(digit == 1, A, np.where(digit == 2, mab,
                          np.where(digit == 3, mca, mbc)))
            nB = np.where(digit == 1, mab, np.where(digit == 2, B,
                          np.where(digit == 3, mbc, mca)))
            nC = np.where(digit == 1, mca, np.where(digit == 2, mbc,
                          np.where(digit == 3, C, mab)))
            A, B, C = nA, nB, nC
        return face, A, B, C

    def cell_corners(self, ids: np.ndarray, res: int):
        """Cell id -> (lon, lat) corner arrays of shape (n, 3) — the exact
        triangle boundary (reference: DGGRID cell geometry output for
        ISEA4T, dggrid_runner.py:800-950 GENERATE_GRID)."""
        face, A, B, C = self.corners_plane(ids, res)
        lons = np.empty((len(ids), 3))
        lats = np.empty((len(ids), 3))
        for k, P in enumerate((A, B, C)):
            lon, lat = self.proj.inverse(face, P[:, 0], P[:, 1])
            lons[:, k] = lon
            lats[:, k] = lat
        return lons, lats

    @staticmethod
    def enumerate_cells(res: int) -> np.ndarray:
        """All cell ids at `res` (every 2-bit path is valid: 20*4^res)."""
        paths = np.arange(4**res, dtype=np.int64)
        faces = np.arange(20, dtype=np.int64)
        return ((faces[:, None] << 58) | paths[None, :]).ravel()

    @staticmethod
    def parent(ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        face = ids >> 58
        path = ids & ((np.int64(1) << 58) - 1)
        return (face << 58) | (path >> 2)

    @staticmethod
    def children(ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        face = ids >> 58
        path = ids & ((np.int64(1) << 58) - 1)
        out = np.empty(ids.shape + (4,), dtype=np.int64)
        for d in range(4):
            out[..., d] = (face << 58) | (path << 2) | d
        return out

    @staticmethod
    def num_cells(res: int) -> int:
        return 20 * 4**res


class ISEA4DGrid:
    """Diamond grid: 10 rhombi (face pairs), each an exact (i, j) 2^r x 2^r
    lattice in rhombus coordinates (reference ISEA4D, dggrid_runner.py:72).

    Quad layout: top-cap face k pairs with upper-belt face k across the edge
    (1+k, 1+(k+1)%5) -> quads 0-4; bottom-cap k with lower-belt k across
    (6+k, 6+(k+1)%5) -> quads 5-9.  Rhombus frame: apex of the first face at
    (0,0), shared-edge vertices V1=(1,0), V2=(0,1), second apex (1,1).

    Cell id: quad << 56 | i << 28 | j   (res <= 27).
    """

    def __init__(self, **orient):
        self.tri = ISEA4TGrid(**orient)
        ic = self.tri.proj.icosa
        fv = ic.face_vertices
        # face -> (quad, apex_slot, v1_slot, v2_slot, is_second)
        self.face_quad = np.zeros(20, dtype=np.int64)
        self.face_apex = np.zeros(20, dtype=np.int64)
        self.face_v1 = np.zeros(20, dtype=np.int64)
        self.face_v2 = np.zeros(20, dtype=np.int64)
        self.face_second = np.zeros(20, dtype=bool)

        def slot(f, vid):
            return int(np.nonzero(fv[f] == vid)[0][0])

        for k in range(5):
            v1, v2 = 1 + k, 1 + (k + 1) % 5
            for f, second in ((k, False), (5 + k, True)):       # top cap + upper belt
                self.face_quad[f] = k
                self.face_v1[f] = slot(f, v1)
                self.face_v2[f] = slot(f, v2)
                self.face_apex[f] = 3 - self.face_v1[f] - self.face_v2[f]
                self.face_second[f] = second
            v1, v2 = 6 + k, 6 + (k + 1) % 5
            for f, second in ((15 + k, False), (10 + k, True)):  # bottom cap + lower belt
                self.face_quad[f] = 5 + k
                self.face_v1[f] = slot(f, v1)
                self.face_v2[f] = slot(f, v2)
                self.face_apex[f] = 3 - self.face_v1[f] - self.face_v2[f]
                self.face_second[f] = second

    def _face_weights(self, face, x, y):
        """Per-vertex-slot barycentric weights (slot order = face_vertices)."""
        l1, l2, l3 = self.tri._bary(x, y)
        # plane corner order is (vertex0, vertex2, vertex1) — see Icosahedron
        # frame construction (vertex1 sits at azimuth +120 = plane corner 2)
        w = np.stack([l1, l3, l2], axis=-1)
        return w

    def encode(self, lon, lat, res: int) -> np.ndarray:
        face, x, y = self.tri.proj.forward(np.asarray(lon, np.float64),
                                           np.asarray(lat, np.float64))
        w = self._face_weights(face, x, y)
        ar = np.arange(len(face))
        w1 = w[ar, self.face_v1[face]]
        w2 = w[ar, self.face_v2[face]]
        u = np.where(self.face_second[face], 1.0 - w2, w1)
        v = np.where(self.face_second[face], 1.0 - w1, w2)
        size = 1 << res
        i = np.clip((u * size).astype(np.int64), 0, size - 1)
        j = np.clip((v * size).astype(np.int64), 0, size - 1)
        return (self.face_quad[face] << 56) | (i << 28) | j

    def decode(self, ids: np.ndarray, res: int):
        ids = np.asarray(ids, dtype=np.int64)
        quad = ids >> 56
        i = (ids >> 28) & ((1 << 28) - 1)
        j = ids & ((1 << 28) - 1)
        size = 1 << res
        return self._uv_to_lonlat(quad, (i + 0.5) / size, (j + 0.5) / size)

    def _uv_to_lonlat(self, quad, u, v):
        """Rhombus-frame (u, v) in [0, 1]^2 -> (lon, lat) — the decode
        body, reusable for cell CORNERS."""
        second = (u + v) > 1.0
        # face of this half of the quad
        first_face = np.where(quad < 5, quad, 15 + (quad - 5))
        second_face = np.where(quad < 5, 5 + quad, 10 + (quad - 5))
        face = np.where(second, second_face, first_face)
        w1 = np.where(second, 1.0 - v, u)
        w2 = np.where(second, 1.0 - u, v)
        wa = 1.0 - w1 - w2
        # slot weights -> plane coords via canonical corners (slot order
        # (v0, v1, v2) maps to plane corners (0, 2, 1))
        ar = np.arange(len(quad))
        wslot = np.zeros((len(quad), 3))
        wslot[ar, self.face_apex[face]] = np.abs(wa)
        wslot[ar, self.face_v1[face]] += w1
        wslot[ar, self.face_v2[face]] += w2
        corners = self.tri.corners  # plane corner c maps to vertex slot [0,2,1]
        plane_w = np.stack([wslot[:, 0], wslot[:, 2], wslot[:, 1]], axis=-1)
        x = plane_w @ corners[:, 0]
        y = plane_w @ corners[:, 1]
        return self.tri.proj.inverse(face, x, y)

    def cell_corners(self, ids: np.ndarray, res: int):
        """Cell id -> (lon, lat) corner arrays of shape (n, 4): the
        rhombus-frame corners (i,j),(i+1,j),(i+1,j+1),(i,j+1) mapped
        through the quad chart — the exact diamond boundary."""
        ids = np.asarray(ids, dtype=np.int64)
        quad = ids >> 56
        i = (ids >> 28) & ((1 << 28) - 1)
        j = ids & ((1 << 28) - 1)
        size = 1 << res
        eps = 0.25 / size          # keep corners strictly inside a face
        cu = [(i + eps), (i + 1 - eps), (i + 1 - eps), (i + eps)]
        cv = [(j + eps), (j + eps), (j + 1 - eps), (j + 1 - eps)]
        lons = np.empty((len(ids), 4))
        lats = np.empty((len(ids), 4))
        for k in range(4):
            lon, lat = self._uv_to_lonlat(quad, cu[k] / size, cv[k] / size)
            lons[:, k] = lon
            lats[:, k] = lat
        return lons, lats

    @staticmethod
    def enumerate_cells(res: int) -> np.ndarray:
        """All cell ids at `res` (10 quads x 2^res x 2^res)."""
        size = 1 << res
        i, j = np.meshgrid(np.arange(size, dtype=np.int64),
                           np.arange(size, dtype=np.int64), indexing="ij")
        quads = np.arange(10, dtype=np.int64)
        flat = (i.ravel() << 28) | j.ravel()
        return ((quads[:, None] << 56) | flat[None, :]).ravel()

    @staticmethod
    def parent(ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        quad = ids >> 56
        i = (ids >> 28) & ((1 << 28) - 1)
        j = ids & ((1 << 28) - 1)
        return (quad << 56) | ((i >> 1) << 28) | (j >> 1)

    @staticmethod
    def num_cells(res: int) -> int:
        return 10 * 4**res
