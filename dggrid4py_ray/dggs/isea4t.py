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

from .snyder import SnyderProjection, R_VERTEX_PLANE
from .sphere import unit_to_lonlat

_CORN_ANGLES = np.array([np.pi / 2, np.pi / 2 + 2 * np.pi / 3, np.pi / 2 + 4 * np.pi / 3])


class ISEA4TGrid:
    """Vectorized encode/decode/children/parent for the triangle grid."""

    def __init__(self, pole_lon: float = 11.25, pole_lat: float = 58.28252559,
                 azimuth: float = 0.0):
        self.proj = SnyderProjection(pole_lon=pole_lon, pole_lat=pole_lat,
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
    """Diamond grid: each diamond = an (upper, lower) face pair subdivided
    4-way; implemented as paired ISEA4T cells (10 * 4^res diamonds)."""

    # face pairing (upper-belt face, lower-belt face) per quad 0..9
    def __init__(self, **orient):
        self.tri = ISEA4TGrid(**orient)

    def encode(self, lon, lat, res: int) -> np.ndarray:
        t = self.tri.encode(lon, lat, res)
        face = t >> 58
        # quads: faces (0..4 with 5..9) top pairs; (10..14 with 15..19) bottom
        quad = np.where(face < 10, face % 5, 5 + face % 5)
        return (quad.astype(np.int64) << 59) | (np.where(face < 10, face < 5, face < 15).astype(np.int64) << 58) | (t & ((np.int64(1) << 58) - 1))

    @staticmethod
    def num_cells(res: int) -> int:
        return 10 * 4**res
