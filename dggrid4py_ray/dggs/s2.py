"""S2-style spherical quadtree cell ids (vectorized numpy).

Implements the published S2 geometry algorithm (s2geometry.io docs: cube
face -> quadratic s/t transform -> Hilbert curve position packed into a
64-bit id with a trailing sentinel bit).  The `s2` library is not available
in this environment; this is a from-scratch implementation of the documented
scheme, self-consistency-tested (round-trips, hierarchy containment).  It is
the second encoder family named by the north star ("H3/S2 ... encoders"):
a quadtree contrast to the aperture-7 IGEO7 engine.
"""

from __future__ import annotations

import numpy as np

from .sphere import lonlat_to_unit, unit_to_lonlat

MAX_LEVEL = 30
_SWAP = 1
_INVERT = 2
# Hilbert tables (documented S2 state machine)
_POS_TO_IJ = np.array([[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]],
                      dtype=np.int64)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.int64)


def _xyz_to_face_uv(p: np.ndarray):
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    face = face + np.where(np.take_along_axis(
        np.stack([x, y, z], axis=-1), face[..., None], axis=-1)[..., 0] < 0, 3, 0)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate([
        (lambda: y / x, lambda: z / x, None),        # face 0: +x
        (lambda: -x / y, lambda: z / y, None),       # face 1: +y
        (lambda: -x / z, lambda: -y / z, None),      # face 2: +z
        (lambda: z / x, lambda: y / x, None),        # face 3: -x
        (lambda: z / y, lambda: -x / y, None),       # face 4: -y
        (lambda: -y / z, lambda: -x / z, None),      # face 5: -z
    ]):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ue(), u)
                v = np.where(m, ve(), v)
    return face, u, v


def _face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    out = np.empty(face.shape + (3,))
    specs = [
        lambda u, v: (np.ones_like(u), u, v),        # +x
        lambda u, v: (-u, np.ones_like(u), v),       # +y
        lambda u, v: (-u, -v, np.ones_like(u)),      # +z
        lambda u, v: (-np.ones_like(u), -v, -u),     # -x
        lambda u, v: (v, -np.ones_like(u), -u),      # -y
        lambda u, v: (v, u, -np.ones_like(u)),       # -z
    ]
    for f, fn in enumerate(specs):
        m = face == f
        if m.any():
            x, y, z = fn(u, v)
            out[..., 0] = np.where(m, x, out[..., 0])
            out[..., 1] = np.where(m, y, out[..., 1])
            out[..., 2] = np.where(m, z, out[..., 2])
    n = np.sqrt((out * out).sum(axis=-1, keepdims=True))
    return out / n


def _uv_to_st(u):
    return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u))


def _st_to_uv(s):
    return np.where(s >= 0.5, (1.0 / 3.0) * (4 * s * s - 1),
                    (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s)))


def encode(lon, lat, level: int = 16) -> np.ndarray:
    """(lon, lat) -> S2 cell id (int64) at `level`."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level 0..30")
    p = lonlat_to_unit(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    face, u, v = _xyz_to_face_uv(p)
    s = _uv_to_st(u)
    t = _uv_to_st(v)
    size = 1 << level
    i = np.clip((s * size).astype(np.int64), 0, size - 1)
    j = np.clip((t * size).astype(np.int64), 0, size - 1)
    orient = (face & _SWAP).astype(np.int64)
    pos = np.zeros(face.shape, dtype=np.int64)
    for k in range(level - 1, -1, -1):
        ib = (i >> k) & 1
        jb = (j >> k) & 1
        ij = (ib << 1) | jb
        ppos = _IJ_TO_POS[orient, ij]
        pos = (pos << 2) | ppos
        orient = orient ^ _POS_TO_ORIENT[ppos]
    # id: 3 face bits at top, then 2*level pos bits, then sentinel 1,
    # then zero padding
    shift = 61 - 2 * level
    cid = (face.astype(np.int64) << 61) | (pos << shift) | (np.int64(1) << (shift - 1))
    return cid


def level_of(cell_id: np.ndarray) -> np.ndarray:
    """Level from the sentinel (lowest set) bit."""
    c = np.asarray(cell_id, dtype=np.int64)
    lsb = c & (-c)
    return (61 - (np.log2(lsb.astype(np.float64)).astype(np.int64))) // 2


def decode_center(cell_id: np.ndarray):
    """Cell id -> (lon, lat) of the cell center."""
    c = np.asarray(cell_id, dtype=np.int64)
    lvl = level_of(c)
    face = (c >> 61) & 0x7
    maxlvl = int(lvl.max()) if lvl.size else 0
    i = np.zeros(c.shape, dtype=np.int64)
    j = np.zeros(c.shape, dtype=np.int64)
    orient = (face & _SWAP).astype(np.int64)
    for k in range(maxlvl):
        active = k < lvl
        shift = 61 - 2 * (k + 1)
        ppos = (c >> shift) & 0x3
        ij = _POS_TO_IJ[orient, ppos]
        ib = (ij >> 1) & 1
        jb = ij & 1
        i = np.where(active, (i << 1) | ib, i)
        j = np.where(active, (j << 1) | jb, j)
        orient = np.where(active, orient ^ _POS_TO_ORIENT[ppos], orient)
    size = (np.int64(1) << lvl).astype(np.float64)
    s = (i.astype(np.float64) + 0.5) / size
    t = (j.astype(np.float64) + 0.5) / size
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    p = _face_uv_to_xyz(face, u, v)
    return unit_to_lonlat(p)


def parent(cell_id: np.ndarray, level: int | None = None) -> np.ndarray:
    c = np.asarray(cell_id, dtype=np.int64)
    lvl = level_of(c)
    tgt = (lvl - 1) if level is None else np.full(c.shape, level, dtype=np.int64)
    shift = 61 - 2 * tgt
    newlsb = np.int64(1) << (shift - 1)
    return (c & ~(newlsb * 2 - 1)) | newlsb


def children(cell_id: np.ndarray) -> np.ndarray:
    """(n, 4) children ids."""
    c = np.asarray(cell_id, dtype=np.int64)
    lvl = level_of(c)
    shift = 61 - 2 * (lvl + 1)
    newlsb = np.int64(1) << (shift - 1)
    base = c - (c & (-c))  # strip sentinel
    out = np.empty(c.shape + (4,), dtype=np.int64)
    for q in range(4):
        out[..., q] = base | (np.int64(q) << shift) | newlsb
    return out


def token(cell_id: np.ndarray) -> np.ndarray:
    """Hex token (lowercase, trailing zeros stripped) — S2 token format."""
    c = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    out = np.empty(c.shape, dtype=object)
    fo = out.reshape(-1)
    for idx, v in enumerate(c.reshape(-1)):
        s = f"{int(v):016x}".rstrip("0")
        fo[idx] = s if s else "X"
    return out
