"""Snyder equal-area polyhedral projection (icosahedron), vectorized.

Public knowledge: J.P. Snyder, "An Equal-Area Map Projection For Polyhedral
Globes", Cartographica 29(1), 1992; constants as used for the icosahedron
(g = 37.37736814 deg, G = 36 deg, theta = 30 deg, R' = 0.9103832815095032).

This is the projection behind the reference's "ISEA" grids (the `dggs_proj
ISEA` metafile parameter, /root/reference/dggrid4py/dggrid_runner.py:239-240).
Used here for the ISEA4T/ISEA4D triangle/diamond grids and the PROJTRI
codec; the IGEO7 hex engine (igeo7.py) uses its own spherical construction.

Face plane frame: origin at the face center, +y toward vertex 0 of the face,
x to the right when looking at the face from outside the sphere.
Plane vertex distance (center->vertex) = R' * tan(g).
"""

from __future__ import annotations

import numpy as np

from .sphere import lonlat_to_unit, unit_to_lonlat, tangent_at_azimuth, geodesic_step, rotate_tangent

G_DEG = 37.37736814
g = np.deg2rad(G_DEG)          # spherical distance face center -> vertex
G_ANG = np.deg2rad(36.0)       # spherical angle
THETA = np.deg2rad(30.0)       # plane angle
RPRIME = 0.9103832815095032
TAN_G = np.tan(g)
COT_THETA = 1.0 / np.tan(THETA)
COS_G = np.cos(g)
SIN_G_ANG = np.sin(G_ANG)
COS_G_ANG = np.cos(G_ANG)
COT_G_ANG = 1.0 / np.tan(G_ANG)
DEG120 = np.deg2rad(120.0)
DEG60 = np.deg2rad(60.0)
R_VERTEX_PLANE = RPRIME * TAN_G  # planar distance center -> vertex


class Icosahedron:
    """Icosahedron face geometry for a given orientation pole/azimuth.

    Faces are indexed 0..19; for each face we store its center unit vector,
    its 3 vertex unit vectors (CCW from outside, vertex 0 = the reference
    vertex for the planar frame), and the tangent frame at the center.
    """

    def __init__(self, pole_lon: float = 11.25, pole_lat: float = 58.28252559,
                 azimuth: float = 0.0):
        v0 = lonlat_to_unit(pole_lon, pole_lat)
        t0 = tangent_at_azimuth(v0, azimuth)
        theta_v = np.arctan(2.0)
        verts = np.zeros((12, 3))
        verts[0] = v0
        for k in range(5):
            dirk = rotate_tangent(t0, v0, -np.deg2rad(72.0 * k))
            verts[1 + k], _ = geodesic_step(v0, dirk, theta_v)
        for k in range(5):
            dirk = rotate_tangent(t0, v0, -np.deg2rad(36.0 + 72.0 * k))
            verts[6 + k], _ = geodesic_step(v0, dirk, np.pi - theta_v)
        verts[11] = -v0
        self.vertices = verts

        # 20 faces as vertex index triples; top cap, upper belt, lower belt, bottom cap
        faces = []
        for k in range(5):
            faces.append((0, 1 + k, 1 + (k + 1) % 5))                      # top cap
        for k in range(5):
            faces.append((1 + k, 6 + k, 1 + (k + 1) % 5))                  # upper belt
        for k in range(5):
            faces.append((6 + k, 6 + (k + 1) % 5, 1 + (k + 1) % 5))        # lower belt
        for k in range(5):
            faces.append((11, 6 + (k + 1) % 5, 6 + k))                     # bottom cap
        self.face_vertices = np.array(faces, dtype=np.int64)

        centers = np.zeros((20, 3))
        for f in range(20):
            c = verts[self.face_vertices[f]].sum(axis=0)
            centers[f] = c / np.linalg.norm(c)
        self.face_centers = centers

        # ensure CCW orientation seen from outside (normal outward)
        for f in range(20):
            a, b, c = verts[self.face_vertices[f]]
            if np.dot(np.cross(b - a, c - a), centers[f]) < 0:
                self.face_vertices[f] = self.face_vertices[f][[0, 2, 1]]

        # per-face frame: y-axis tangent toward vertex0, x = y rotated -90deg (CW)
        t_y = np.zeros((20, 3))
        t_x = np.zeros((20, 3))
        for f in range(20):
            vv = verts[self.face_vertices[f, 0]]
            ty = vv - centers[f] * np.dot(vv, centers[f])
            ty /= np.linalg.norm(ty)
            t_y[f] = ty
            t_x[f] = np.cross(ty, centers[f])  # so that azimuth toward vertex1 is positive? fixed below
        # make +x such that vertex1 has positive planar azimuth (az measured CW from +y toward +x)
        for f in range(20):
            v1 = verts[self.face_vertices[f, 1]]
            az1 = np.arctan2(np.dot(v1, t_x[f]), np.dot(v1, t_y[f]))
            if az1 < 0:
                t_x[f] = -t_x[f]
        self.tangent_x = t_x
        self.tangent_y = t_y

        # face adjacency: face_neighbors[f, i] = the face sharing the edge
        # OPPOSITE vertex slot i of face f (i.e. the edge between the other
        # two vertex slots)
        edge_owner: dict = {}
        nbr = np.full((20, 3), -1, dtype=np.int64)
        for f in range(20):
            vs = self.face_vertices[f]
            for i in range(3):
                e = tuple(sorted((int(vs[(i + 1) % 3]), int(vs[(i + 2) % 3]))))
                if e in edge_owner:
                    g2, i2 = edge_owner[e]
                    nbr[f, i] = g2
                    nbr[g2, i2] = f
                else:
                    edge_owner[e] = (f, i)
        self.face_neighbors = nbr

    def find_face(self, p: np.ndarray) -> np.ndarray:
        """Containing face = nearest face center (Voronoi of face centers
        on an icosahedron is exactly the face triangles)."""
        return np.argmax(p @ self.face_centers.T, axis=-1)


class FullerProjection:
    """Per-face gnomonic (central) projection onto the flat icosahedron
    faces — the base chart of the Fuller/Dymaxion family (reference
    `dggs_proj FULLER`, dggrid_runner.py:239-240; FULLER* presets :67-84).

    Same interface as SnyderProjection (forward_unit / inverse_unit /
    icosa), with chart coordinates scaled so face vertices land at
    R_VERTEX_PLANE — every face-lattice engine works unchanged with this
    chart swapped in.  NOTE: this is the exact gnomonic Dymaxion chart, not
    Gray's arc-equalized refinement of Fuller's 1975 map (no golden FULLER
    output exists in the reference to calibrate that against); it is exact,
    invertible, and face-edge-consistent.
    """

    def __init__(self, icosa: Icosahedron | None = None, **orient):
        self.icosa = icosa or Icosahedron(**orient)
        ic = self.icosa
        # face plane: q . n = d through the three unit vertices
        self._d = np.einsum("fj,fj->f", ic.vertices[ic.face_vertices[:, 0]],
                            ic.face_centers)
        origin = ic.face_centers * self._d[:, None]
        v0 = ic.vertices[ic.face_vertices[:, 0]]
        self._scale = R_VERTEX_PLANE / np.linalg.norm(v0 - origin, axis=1)
        self._origin = origin

    def forward(self, lon, lat):
        p = lonlat_to_unit(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
        return self.forward_unit(p)

    def forward_unit(self, p: np.ndarray):
        face = self.icosa.find_face(p)
        f, x, y = self._forward_on(p, face)
        return face, x, y

    def _forward_on(self, p, face):
        ic = self.icosa
        n = ic.face_centers[face]
        t = self._d[face] / np.maximum(np.sum(p * n, axis=-1), 1e-12)
        q = p * t[..., None] - self._origin[face]
        s = self._scale[face]
        return face, np.sum(q * ic.tangent_x[face], axis=-1) * s, \
            np.sum(q * ic.tangent_y[face], axis=-1) * s

    def inverse(self, face, x, y):
        return unit_to_lonlat(self.inverse_unit(face, x, y))

    def inverse_unit(self, face, x, y):
        face = np.asarray(face, dtype=np.int64)
        ic = self.icosa
        s = self._scale[face]
        q = (self._origin[face]
             + (np.asarray(x, np.float64) / s)[..., None] * ic.tangent_x[face]
             + (np.asarray(y, np.float64) / s)[..., None] * ic.tangent_y[face])
        return q / np.linalg.norm(q, axis=-1, keepdims=True)


class GrayFullerProjection(FullerProjection):
    """Arc-length-equalized Fuller chart — Fuller's parallel-grid
    construction in the exact-transformation setting of Gray 1995
    ("Exact Transformation Equations for Fuller's World Map",
    Cartographica 32(3); reference `dggs_proj FULLER`,
    dggrid_runner.py:239-240).

    Fuller's stated construction: within each icosahedron face, the family
    of great-circle arcs "parallel" to an edge — the arc through X(t) on
    one adjacent edge and Y(t) on the other, both at the SAME arc fraction
    t from the shared vertex — maps to planar lines parallel to that edge
    at fraction t.  Forward therefore solves, per opposite-edge family i,
    for the t_i whose parallel arc contains the point — and because the
    scalar triple product P . (X(t) x Y(t)) is bilinear in the two slerps,
    that root is CLOSED FORM: h(t) = s2 (s1 A + s2 B) with per-point
    scalars A = P.(Vi x Vk + Vj x Vi), B = P.(Vj x Vk), so
    t = atan2(A sin(theta), A cos(theta) - B) / theta (branch shifted into
    the geometric range).  This gives barycentric alpha_i = 1 - t_i.  The three
    parallels are NOT exactly concurrent (Fuller's construction
    over-determines the point — the discrepancy triangle is what Gray's
    paper quantifies); the chart takes its centroid, i.e. adds the equal
    correction (1 - sum alpha)/3 to each coordinate.  Along the face
    edges the construction is exactly arc-proportional (the property the
    gnomonic chart lacks), and area distortion at the face corners drops
    accordingly (tested).

    Inverse is a damped 2x2 Newton in the gnomonic parameter chart with
    finite-difference Jacobian (the warp Gray-vs-gnomonic is small and
    smooth, so it converges in a handful of steps to float precision).

    NO golden FULLER output exists in the offline reference to calibrate
    against (COVERAGE.md); cell counts / codec roundtrips are exact under
    any exact chart, cell boundary coordinates may deviate from DGGRID's
    Fuller output by the (unpublished) tie-break DGGRID uses for the same
    non-concurrency.  The plain gnomonic chart remains available as
    FullerProjection."""

    def __init__(self, icosa: Icosahedron | None = None, **orient):
        super().__init__(icosa, **orient)
        ic = self.icosa
        self._fv = ic.vertices[ic.face_vertices]          # (20, 3, 3)
        corners = np.zeros((20, 3, 2))
        f_all = np.arange(20, dtype=np.int64)
        for j in range(3):
            _, x, y = FullerProjection._forward_on(self, self._fv[:, j, :], f_all)
            corners[:, j, 0] = x
            corners[:, j, 1] = y
        self._corners = corners
        # arc angle between adjacent vertices per (face, from-vertex, to-vertex)
        d01 = np.einsum("fj,fj->f", self._fv[:, 0], self._fv[:, 1])
        self._theta = np.arccos(np.clip(d01, -1, 1))      # uniform on icosa

    # -- forward ------------------------------------------------------------

    def _parallel_t(self, p: np.ndarray, vi: np.ndarray, vj: np.ndarray,
                    vk: np.ndarray, theta: np.ndarray) -> np.ndarray:
        """Root of P . (X(t) x Y(t)) with X = slerp(vi, vj, t),
        Y = slerp(vi, vk, t): the arc-fraction t of the parallel-to-(vj,vk)
        great circle through each point.  Cross-product bilinearity reduces
        h(t) to s2 (s1 A + s2 B), a pure sinusoid in t*theta, so the root
        is a single atan2 (validated to 3e-14 against a 55-step bisection
        of the raw triple product).  The sinusoid's period pi/theta
        (~2.84 for the icosahedron) aliases the root; we shift into
        [0, 2) preferring the geometric (positive-overshoot) branch, else
        the just-behind-the-vertex negative branch."""
        a = np.einsum("...j,...j->...", p, np.cross(vi, vk) + np.cross(vj, vi))
        b = np.einsum("...j,...j->...", p, np.cross(vj, vk))
        t = np.arctan2(a * np.sin(theta), a * np.cos(theta) - b) / theta
        period = np.pi / theta
        t = np.mod(t, period)
        return np.where(t > 2.0, t - period, t)

    def _bary(self, p: np.ndarray, face: np.ndarray) -> np.ndarray:
        """(..., 3) centroid-corrected barycentric coordinates."""
        v = self._fv[face]                                # (..., 3, 3)
        theta = self._theta[face]
        alpha = np.empty(p.shape[:-1] + (3,))
        for i in range(3):
            t = self._parallel_t(p, v[..., i, :], v[..., (i + 1) % 3, :],
                                 v[..., (i + 2) % 3, :], theta)
            alpha[..., i] = 1.0 - t
        s = alpha.sum(axis=-1)
        alpha += ((1.0 - s) / 3.0)[..., None]
        return alpha

    def _forward_on(self, p, face):
        alpha = self._bary(p, face)
        corners = self._corners[face]                     # (..., 3, 2)
        xy = np.einsum("...i,...ij->...j", alpha, corners)
        return face, xy[..., 0], xy[..., 1]

    # -- inverse ------------------------------------------------------------

    def inverse_unit(self, face, x, y):
        face = np.asarray(face, dtype=np.int64)
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        # Newton in the gnomonic chart (u, v); init = target (charts agree
        # at corners/center and differ by a small smooth warp)
        u = x.astype(np.float64).copy()
        v = y.astype(np.float64).copy()
        step = 1e-6 * R_VERTEX_PLANE

        def fwd(uu, vv):
            p = FullerProjection.inverse_unit(self, face, uu, vv)
            _, fx, fy = self._forward_on(p, face)
            return fx, fy

        for _ in range(12):
            fx, fy = fwd(u, v)
            rx = fx - x
            ry = fy - y
            if max(np.max(np.abs(rx)), np.max(np.abs(ry))) < 1e-12 * R_VERTEX_PLANE:
                break
            fxu, fyu = fwd(u + step, v)
            fxv, fyv = fwd(u, v + step)
            j11 = (fxu - fx) / step
            j21 = (fyu - fy) / step
            j12 = (fxv - fx) / step
            j22 = (fyv - fy) / step
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-12, 1.0, det)
            u -= (j22 * rx - j12 * ry) / det
            v -= (-j21 * rx + j11 * ry) / det
        return FullerProjection.inverse_unit(self, face, u, v)


def chart_for(projection: str, **orient):
    """Per-face chart for a `dggs_proj` name.  ISEA -> Snyder equal-area;
    FULLER -> Gray's arc-equalized Fuller chart (what DGGRID's Fuller
    projection implements, per Gray 1995 — reference dggrid_runner.py:239);
    FULLER_GNOMONIC -> the plain gnomonic Dymaxion chart (engine extension,
    kept for speed and as the pre-round-4 behavior)."""
    n = projection.upper()
    if n == "FULLER":
        return GrayFullerProjection(**orient)
    if n == "FULLER_GNOMONIC":
        return FullerProjection(**orient)
    return SnyderProjection(**orient)


class SnyderProjection:
    """Vectorized forward (sphere->face plane) and inverse projections."""

    def __init__(self, icosa: Icosahedron | None = None, **orient):
        self.icosa = icosa or Icosahedron(**orient)

    def forward(self, lon, lat):
        """(lon, lat) degrees -> (face, x, y) in the face-plane frame
        (unit sphere radius; plane center->vertex distance = R'*tan g)."""
        p = lonlat_to_unit(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
        return self.forward_unit(p)

    def forward_unit(self, p: np.ndarray):
        ic = self.icosa
        face = ic.find_face(p)
        c = ic.face_centers[face]
        tx = ic.tangent_x[face]
        ty = ic.tangent_y[face]
        px = np.sum(p * tx, axis=-1)
        py = np.sum(p * ty, axis=-1)
        pz = np.clip(np.sum(p * c, axis=-1), -1.0, 1.0)
        z = np.arccos(pz)                       # spherical distance center->point
        az = np.arctan2(px, py)                 # azimuth from +y (vertex0), positive toward vertex1
        az = np.where(az < 0, az + 2 * np.pi, az)
        sector = np.floor(az / DEG120)
        az1 = az - sector * DEG120
        flip = az1 > DEG60
        az1 = np.where(flip, DEG120 - az1, az1)
        # Snyder 1992 eqs (triangle case)
        q = np.arctan2(TAN_G, np.cos(az1) + np.sin(az1) * COT_THETA)
        H = np.arccos(np.clip(np.sin(az1) * SIN_G_ANG * COS_G - np.cos(az1) * COS_G_ANG, -1, 1))
        AG = az1 + G_ANG + H - np.pi
        azp = np.arctan2(2.0 * AG, RPRIME**2 * TAN_G**2 - 2.0 * AG * COT_THETA)
        dp = RPRIME * TAN_G / (np.cos(azp) + np.sin(azp) * COT_THETA)
        f = dp / (2.0 * RPRIME * np.sin(q / 2.0))
        rho = 2.0 * RPRIME * f * np.sin(np.clip(z, 0, q) / 2.0)
        azp_full = np.where(flip, DEG120 - azp, azp) + sector * DEG120
        x = rho * np.sin(azp_full)
        y = rho * np.cos(azp_full)
        return face, x, y

    def inverse(self, face, x, y):
        """(face, x, y) -> (lon, lat) degrees."""
        p = self.inverse_unit(face, x, y)
        return unit_to_lonlat(p)

    def inverse_unit(self, face, x, y):
        face = np.asarray(face, dtype=np.int64)
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        rho = np.sqrt(x * x + y * y)
        azp = np.arctan2(x, y)
        azp = np.where(azp < 0, azp + 2 * np.pi, azp)
        sector = np.floor(azp / DEG120)
        azp1 = azp - sector * DEG120
        flip = azp1 > DEG60
        azp1 = np.where(flip, DEG120 - azp1, azp1)
        # AG from planar azimuth (invert azp = atan2(2AG, R'^2 tan^2 g - 2 AG cot theta))
        t = np.tan(azp1)
        AG = RPRIME**2 * TAN_G**2 * t / (2.0 * (1.0 + t * COT_THETA))
        AG = np.where(np.abs(azp1 - np.pi / 2) < 1e-12, RPRIME**2 * TAN_G**2 / (2.0 * COT_THETA), AG)
        # Newton solve az1: az1 + G + H(az1) - pi - AG = 0
        az1 = azp1.copy()
        for _ in range(6):
            sin_a = np.sin(az1)
            cos_a = np.cos(az1)
            carg = np.clip(sin_a * SIN_G_ANG * COS_G - cos_a * COS_G_ANG, -1.0, 1.0)
            H = np.arccos(carg)
            fval = az1 + G_ANG + H - np.pi - AG
            denom = np.sqrt(np.maximum(1.0 - carg**2, 1e-18))
            dH = -(cos_a * SIN_G_ANG * COS_G + sin_a * COS_G_ANG) / denom
            az1 = az1 - fval / (1.0 + dH)
        az1 = np.clip(az1, 0.0, DEG60)
        q = np.arctan2(TAN_G, np.cos(az1) + np.sin(az1) * COT_THETA)
        dp = RPRIME * TAN_G / (np.cos(azp1) + np.sin(azp1) * COT_THETA)
        f = dp / (2.0 * RPRIME * np.sin(q / 2.0))
        with np.errstate(invalid="ignore"):
            z = 2.0 * np.arcsin(np.clip(rho / (2.0 * RPRIME * f), -1.0, 1.0))
        az_full = np.where(flip, DEG120 - az1, az1) + sector * DEG120
        ic = self.icosa
        c = ic.face_centers[face]
        tx = ic.tangent_x[face]
        ty = ic.tangent_y[face]
        dirv = np.cos(az_full)[..., None] * ty + np.sin(az_full)[..., None] * tx
        p, _ = geodesic_step(c, dirv, z)
        return p
