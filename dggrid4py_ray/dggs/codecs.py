"""Cell-address codec registry: any-to-any address transforms.

Replaces TRANSFORM_POINTS / `address_transform` (reference
dggrid_runner.py:953-1022, :1962-2025) with vectorized in-process codecs.
The canonical in-engine address is always the Z7 int64 column; every other
representation is derived.

Supported: GEO, SEQNUM, Z7 (int64 bit pattern), Z7_STRING, Z7_HEX, ZORDER,
Q2DI (struct q/i/j), Q2DD (struct q/x/y), PROJTRI (struct tri/x/y), and the
output-only PLANE (struct x/y in the unfolded icosahedron net, reference
dggrid_runner.py:126-129) and VERTEX2DD (list<struct<lon,lat>> boundary
vertices).  Z3/Z3_STRING for aperture-3 grids live in Z3Codec below.

Q2DI/Q2DD use the base cell as the quad and axial lattice coordinates in the
base cell's tangent-plane frame — a documented deviation from DGGRID's
10-quad layout (the binary's quad conventions are not reproducible without
it); round-trips through our codecs are exact, which is the property the
reference's own tests rely on (set-equality of ids,
tests/test_legacy_driver_name.py:34-36).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import igeo7 as ig
from .igeo7 import IGeo7Grid
from .sphere import lonlat_to_unit, unit_to_lonlat
from .snyder import SnyderProjection

INT_TYPES = {"Z7", "SEQNUM", "ZORDER"}


class AddressCodec:
    """Vectorized any-to-any address converter for one grid + resolution.

    ``seqnum_order`` picks the SEQNUM numbering: ``"dggrid"`` (default) is
    the golden-calibrated quad-ij order the reference binary emits — but its
    southern-hemisphere quads (6-10) are a symmetric extension with NO
    golden DGGRID data to calibrate against (dggs/dggrid_seqnum.py), so
    southern parity is unverified; ``"native"`` opts out to the engine's own
    deterministic base/ring order (stable across versions, no parity claim)."""

    def __init__(self, grid: IGeo7Grid | None = None, res: int = 9,
                 seqnum_order: str = "dggrid"):
        self.grid = grid or IGeo7Grid()
        self.res = int(res)
        self._snyder = None
        if seqnum_order not in ("dggrid", "native"):
            raise ValueError(f"seqnum_order must be 'dggrid' or 'native', got {seqnum_order!r}")
        self.seqnum_order = seqnum_order

    # -- parse: representation -> canonical z7 int64 ------------------------

    def parse(self, values, address_type: str) -> np.ndarray:
        t = address_type.upper()
        if t == "Z7":
            return np.asarray(values, dtype=np.int64)
        if t == "Z7_STRING":
            return ig.z7_from_string(values)
        if t == "Z7_HEX":
            return ig.z7_from_hex(values)
        if t == "SEQNUM":
            vals = np.asarray(values, dtype=np.int64)
            if self.seqnum_order == "dggrid" and hasattr(self.grid, "from_seqnum_dggrid"):
                # DGGRID's quad-ij SEQNUM order (golden-calibrated; see
                # dggs/dggrid_seqnum.py) — what the reference binary emits
                return self.grid.from_seqnum_dggrid(vals, self.res)
            pd = getattr(self.grid, "pent_digits", None)
            return ig.seqnum_to_z7(vals, self.res, pent_digits=pd)
        if t == "ZORDER":
            return self._zorder_to_z7(np.asarray(values, dtype=np.int64))
        if t == "GEO":
            lon, lat = values
            return self.grid.encode(np.asarray(lon, np.float64), np.asarray(lat, np.float64), self.res)
        if t == "Q2DI":
            q, i, j = values
            return self._q2di_to_z7(np.asarray(q, np.int64), np.asarray(i, np.int64),
                                    np.asarray(j, np.int64))
        if t == "Q2DD":
            q, x, y = values
            return self._q2dd_to_z7(np.asarray(q, np.int64), np.asarray(x, np.float64),
                                    np.asarray(y, np.float64))
        if t == "PROJTRI":
            tri, x, y = values
            lon, lat = self._sny().inverse(np.asarray(tri, np.int64),
                                           np.asarray(x, np.float64), np.asarray(y, np.float64))
            return self.grid.encode(lon, lat, self.res)
        raise ValueError(f"unsupported input address type {address_type!r}")

    # -- emit: canonical z7 -> representation --------------------------------

    def emit(self, z7: np.ndarray, address_type: str):
        t = address_type.upper()
        z7 = np.asarray(z7, dtype=np.int64)
        if t == "Z7":
            return z7
        if t == "Z7_STRING":
            return ig.z7_to_string(z7)
        if t == "Z7_HEX":
            return ig.z7_to_hex(z7)
        if t == "SEQNUM":
            if self.seqnum_order == "dggrid" and hasattr(self.grid, "to_seqnum_dggrid"):
                return self.grid.to_seqnum_dggrid(z7, self.res)
            return ig.z7_to_seqnum(z7, pent_digits=getattr(self.grid,
                                                           "pent_digits", None))
        if t == "ZORDER":
            return self._z7_to_zorder(z7)
        if t == "GEO":
            return self.grid.decode(z7)
        if t == "Q2DI":
            return self._z7_to_q2di(z7)
        if t == "Q2DD":
            return self._z7_to_q2dd(z7)
        if t == "PROJTRI":
            lon, lat = self.grid.decode(z7)
            face, x, y = self._sny().forward(lon, lat)
            return face, x, y
        if t == "PLANE":
            # unfolded-net plane coordinates of the cell center (output-only,
            # like the reference)
            from .isea7h_flat import unpack as _unpack
            flat = self.grid._flat_ids(z7)
            f, a, b = _unpack(flat)
            res = ig.z7_resolution(z7)
            x = np.empty(len(z7)); y = np.empty(len(z7))
            for r in np.unique(res):
                m = res == r
                xr, yr = self.grid.flat._plane_of(a[m].astype(np.float64),
                                                  b[m].astype(np.float64), int(r))
                x[m], y[m] = xr, yr
            net = self.grid.bridge.net_transforms()
            z = x + 1j * y
            for ff in np.unique(f):
                alpha, beta = net[int(ff)]
                mm = f == ff
                z[mm] = alpha * z[mm] + beta
            return np.real(z), np.imag(z)
        if t == "VERTEX2DD":
            verts = self.grid.boundary(z7)
            return verts
        raise ValueError(f"unsupported output address type {address_type!r}")

    def transform(self, values, input_type: str, output_type: str):
        return self.emit(self.parse(values, input_type), output_type)

    def transform_table(self, values, input_type: str, output_type: str) -> pa.Table:
        """DataFrame-shaped result like the reference address_transform
        (input column + output column, dggrid_runner.py:1990-2016)."""
        z = self.parse(values, input_type)
        cols = {}
        cols[input_type.lower()] = self._as_arrow(values, input_type)
        out = self.emit(z, output_type)
        cols[output_type.lower()] = self._as_arrow(out, output_type)
        return pa.table(cols)

    # -- helpers -------------------------------------------------------------

    def _sny(self):
        if self._snyder is None:
            self._snyder = SnyderProjection(pole_lon=self.grid.pole_lon,
                                            pole_lat=self.grid.pole_lat,
                                            azimuth=self.grid.azimuth)
        return self._snyder

    @staticmethod
    def _as_arrow(values, t: str):
        t = t.upper()
        if t in INT_TYPES:
            return pa.array(np.asarray(values, dtype=np.int64))
        if t in ("Z7_STRING", "Z7_HEX"):
            return pa.array([str(v) for v in np.asarray(values, dtype=object)], type=pa.string())
        if t == "GEO":
            lon, lat = values
            return pa.StructArray.from_arrays(
                [pa.array(np.asarray(lon, np.float64)), pa.array(np.asarray(lat, np.float64))],
                names=["lon", "lat"])
        if t == "Q2DI":
            q, i, j = values
            return pa.StructArray.from_arrays(
                [pa.array(np.asarray(q, np.int32)), pa.array(np.asarray(i, np.int64)),
                 pa.array(np.asarray(j, np.int64))], names=["quad", "i", "j"])
        if t == "Q2DD":
            q, x, y = values
            return pa.StructArray.from_arrays(
                [pa.array(np.asarray(q, np.int32)), pa.array(np.asarray(x, np.float64)),
                 pa.array(np.asarray(y, np.float64))], names=["quad", "x", "y"])
        if t == "PROJTRI":
            tri, x, y = values
            return pa.StructArray.from_arrays(
                [pa.array(np.asarray(tri, np.int32)), pa.array(np.asarray(x, np.float64)),
                 pa.array(np.asarray(y, np.float64))], names=["tri", "x", "y"])
        if t == "PLANE":
            x, y = values
            return pa.StructArray.from_arrays(
                [pa.array(np.asarray(x, np.float64)),
                 pa.array(np.asarray(y, np.float64))], names=["x", "y"])
        if t == "VERTEX2DD":
            verts = values          # (n, M+1, 2) NaN-padded closed rings
            rows = []
            for i in range(verts.shape[0]):
                ring = verts[i][~np.isnan(verts[i, :, 0])]
                rows.append([{"lon": float(lo), "lat": float(la)}
                             for lo, la in ring])
            return pa.array(rows, type=pa.list_(pa.struct(
                [("lon", pa.float64()), ("lat", pa.float64())])))
        raise ValueError(t)

    def _z7_to_zorder(self, z7: np.ndarray) -> np.ndarray:
        """Alternative packing: digits little-endian from bit 0 (own layout)."""
        res = self.res
        base = ig.z7_base_cell(z7).astype(np.uint64)
        digs = ig.z7_digits(z7, res)
        out = base << np.uint64(60)
        for k in range(res):
            out = out | (digs[:, k].astype(np.uint64) << np.uint64(3 * k))
        return out.view(np.int64)

    def _zorder_to_z7(self, zo: np.ndarray) -> np.ndarray:
        res = self.res
        z = zo.view(np.uint64)
        base = z >> np.uint64(60)
        out = base << np.uint64(60)
        for k in range(res):
            dig = (z >> np.uint64(3 * k)) & np.uint64(7)
            out = out | (dig << np.uint64(57 - 3 * k))
        return (out | ig._PAD[res]).view(np.int64)

    def _centers_in_base_frame(self, z7: np.ndarray):
        g = self.grid
        pos, _, _ = g.decode_state(z7)
        base = ig.z7_base_cell(z7)
        c = g.base_centers[base]
        e1 = g.base_refs[base]
        e2 = np.cross(c, e1)
        dotc = np.einsum("nj,nj->n", c, pos)
        tx = np.einsum("nj,nj->n", e1, pos)
        ty = np.einsum("nj,nj->n", e2, pos)
        tn = np.sqrt(tx * tx + ty * ty)
        ang = np.arctan2(tn, dotc)
        s = np.where(tn > 1e-15, ang / np.where(tn > 1e-15, tn, 1.0), 0.0)
        return base, tx * s, ty * s

    # Q2DI: exact integer codec. A digit path maps to axial Eisenstein
    # coordinates via acc -> M(acc) + e(digit) per level, where
    # M = multiplication by conj(2 + omega) (norm 7, the aperture-7
    # substitution): M(i, j) = (3i + j, -i + 2j).  Formal bijection between
    # digit strings and lattice points -> exactly invertible for every cell
    # (including pentagon-path cells, where it is a labeling rather than a
    # geometric position).
    _EIS_I = np.array([0, 1, 0, -1, -1, 0, 1], dtype=np.int64)  # digit -> unit (i)
    _EIS_J = np.array([0, 0, 1, 1, 0, -1, -1], dtype=np.int64)  # digit -> unit (j)

    def _z7_to_q2di(self, z7: np.ndarray):
        base = ig.z7_base_cell(z7)
        digs = ig.z7_digits(z7, self.res)
        i = np.zeros(z7.shape, dtype=np.int64)
        j = np.zeros(z7.shape, dtype=np.int64)
        for k in range(self.res):
            d = digs[:, k]
            i, j = 3 * i + j + self._EIS_I[d], -i + 2 * j + self._EIS_J[d]
        return base.astype(np.int64), i, j

    def _q2di_to_z7(self, q, i, j):
        q = np.asarray(q, np.int64)
        i = np.asarray(i, np.int64).copy()
        j = np.asarray(j, np.int64).copy()
        res = self.res
        digits = np.zeros((len(q), res), dtype=np.int64)
        for k in range(res - 1, -1, -1):
            found = np.zeros(len(q), dtype=bool)
            for d in range(7):
                x = i - self._EIS_I[d]
                y = j - self._EIS_J[d]
                # M^-1 (x, y) = ((2x - y)/7, (x + 3y)/7)
                nx = 2 * x - y
                ny = x + 3 * y
                ok = (~found) & (nx % 7 == 0) & (ny % 7 == 0)
                digits[ok, k] = d
                i = np.where(ok, nx // 7, i)
                j = np.where(ok, ny // 7, j)
                found |= ok
            if not found.all():
                raise ValueError("invalid Q2DI coordinates for this resolution")
        z = q.astype(np.uint64) << np.uint64(60)
        for k in range(res):
            z = z | (digits[:, k].astype(np.uint64) << np.uint64(57 - 3 * k))
        return (z | ig._PAD[res]).view(np.int64)

    def _z7_to_q2dd(self, z7: np.ndarray):
        base, x, y = self._centers_in_base_frame(z7)
        return base.astype(np.int64), x, y

    def _q2dd_to_z7(self, q, x, y):
        g = self.grid
        c = g.base_centers[np.asarray(q, np.int64)]
        e1 = g.base_refs[np.asarray(q, np.int64)]
        e2 = np.cross(c, e1)
        r = np.sqrt(x * x + y * y)
        safe = np.where(r > 1e-15, r, 1.0)
        dirv = (x / safe)[..., None] * e1 + (y / safe)[..., None] * e2
        p = np.cos(r)[..., None] * c + np.sin(r)[..., None] * dirv
        p = np.where((r <= 1e-15)[..., None], c, p)
        lon, lat = unit_to_lonlat(p)
        return self.grid.encode(lon, lat, self.res)


class Z3Codec:
    """Z3 / Z3_STRING codec for aperture-3 grids (reference address types
    dggrid_runner.py:131-132; own bit layout — see dggs/isea4h.py)."""

    def __init__(self, grid, res: int):
        # grid: ISEA3HGrid or a _ResBoundGrid wrapping one (pure aperture 3:
        # the digit decomposition is radix-3; mixed-aperture ISEA43H ids
        # need a different radix schedule and are rejected here)
        self.grid = getattr(grid, "inner", grid)
        if getattr(self.grid, "ap4", 0):
            raise NotImplementedError(
                "Z3 codec covers pure aperture-3 grids (ISEA3H/FULLER3H); "
                "mixed-aperture ISEA43H ids are not radix-3")
        self.res = int(res)

    def parse(self, values, address_type: str) -> np.ndarray:
        from .isea4h import z3_unpack, z3_from_string
        t = address_type.upper()
        if t == "CELL":
            return np.asarray(values, dtype=np.int64)
        if t == "Z3":
            return z3_unpack(np.asarray(values, dtype=np.int64), self.res)
        if t == "Z3_STRING":
            return z3_unpack(z3_from_string(values, self.res), self.res)
        if t == "GEO":
            lon, lat = values
            return self.grid.encode(np.asarray(lon, np.float64),
                                    np.asarray(lat, np.float64), self.res)
        raise ValueError(f"unsupported Z3 input type {address_type!r}")

    def emit(self, ids: np.ndarray, address_type: str):
        from .isea4h import z3_pack, z3_to_string
        t = address_type.upper()
        ids = np.asarray(ids, dtype=np.int64)
        if t == "CELL":
            return ids
        if t == "Z3":
            return z3_pack(ids, self.res)
        if t == "Z3_STRING":
            return z3_to_string(z3_pack(ids, self.res), self.res)
        if t == "GEO":
            return self.grid.decode(ids, self.res)
        raise ValueError(f"unsupported Z3 output type {address_type!r}")
