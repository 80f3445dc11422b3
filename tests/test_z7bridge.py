"""Flat<->Z7 bridge: the position-model swap's correctness core.

The bridge defines the hierarchy geometrically (parent = nearest coarse
center, digit = angular rank in the parent ring) and must be (a) a perfect
bijection, (b) identical between the Eisenstein-residue fast path and the
geometric slow path, (c) exactly invertible at every resolution.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bridge():
    from dggrid4py_ray.dggs.isea7h_z7bridge import Z7Bridge
    br = Z7Bridge()
    br.ensure_tables()
    return br


def test_tables_bijection(bridge):
    from dggrid4py_ray.dggs import igeo7 as ig
    for res in range(0, 5):
        t = bridge._tables[res]
        n = 10 * 7**res + 2
        assert len(t["flat"]) == n
        assert len(np.unique(t["z7"])) == n
        seq = ig.z7_to_seqnum(t["z7"], pent_digits=bridge.pentagon_ring_digits)
        assert seq.min() == 1 and seq.max() == n and len(np.unique(seq)) == n
        back = ig.seqnum_to_z7(seq, res, pent_digits=bridge.pentagon_ring_digits)
        assert np.array_equal(back, t["z7"])


def test_fast_path_equals_geometric(bridge):
    rng = np.random.default_rng(11)
    n = 4000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    for res in [6, 8]:
        uniq = np.unique(bridge.g.encode(lon, lat, res))
        pf, qf = bridge.level_parent_q(uniq, res)
        # geometric reference: exact parent + parent-chart ring position
        ps = bridge.parent_of(uniq, res)
        qs = bridge._q_in_parent_chart(uniq, ps, res)
        qs = np.where(qs < 0, -1, qs)
        assert np.array_equal(pf, ps)
        assert np.array_equal(qf, qs)
        # top-down inverse of bottom-up
        back = bridge.level_child_at_q(pf, qf, res)
        assert np.array_equal(back, uniq)


def test_conversion_roundtrip_high_res(bridge):
    rng = np.random.default_rng(12)
    n = 8000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    for res in [5, 7, 10]:
        flat = bridge.g.encode(lon, lat, res)
        z7 = bridge.z7_of_flat(flat, res)
        assert len(np.unique(z7)) == len(np.unique(flat))
        assert np.array_equal(bridge.flat_of_z7(z7, res), flat)


def test_children_complete(bridge):
    """Every parent's algebraic children exist as cells: expanding all res-2
    cells by (digit-set) reproduces exactly the res-3 cell universe."""
    from dggrid4py_ray.dggs import igeo7 as ig
    t2 = bridge._tables[2]
    z = t2["z7"]
    ch = ig.z7_children(z, pent_digits=bridge.pentagon_ring_digits)
    ch = ch[ch != ig.INVALID_ID]
    t3 = bridge._tables[3]
    assert np.array_equal(np.sort(ch), np.sort(t3["z7"]))


def test_dggrid_golden_gpkg(bridge):
    """All 551 real DGGRID IGEO7 res-9 ids from the reference's example
    GeoPackage (examples/igeo7_res_9.gpkg) must match bit-for-bit."""
    import sqlite3
    import struct
    con = sqlite3.connect("/root/reference/examples/igeo7_res_9.gpkg")
    rows = con.execute("SELECT name, geom FROM alutag_igeo7_res_9").fetchall()
    con.close()

    def centroid(blob):
        flags = blob[3]
        env = (flags >> 1) & 7
        envlen = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env]
        wkb = blob[8 + envlen:]
        npts = struct.unpack("<I", wkb[9:13])[0]
        pts = np.frombuffer(wkb[13:13 + 16 * npts], dtype="<f8").reshape(-1, 2)
        return pts[:-1].mean(axis=0)

    def ring(blob):
        flags = blob[3]
        env = (flags >> 1) & 7
        envlen = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env]
        wkb = blob[8 + envlen:]
        npts = struct.unpack("<I", wkb[9:13])[0]
        return np.frombuffer(wkb[13:13 + 16 * npts], dtype="<f8").reshape(-1, 2)[:-1]

    from dggrid4py_ray.dggs import igeo7 as ig
    from dggrid4py_ray.dggs.igeo7 import IGeo7Grid
    names = [r[0] for r in rows]
    cent = np.array([centroid(b) for _, b in rows])
    flat = bridge.g.encode(cent[:, 0], cent[:, 1], 9)
    z7 = bridge.z7_of_flat(flat, 9)
    ours = ig.z7_to_hex(z7)
    mism = [i for i, (a, b) in enumerate(zip(ours, names)) if a != b]
    assert not mism, f"{len(mism)}/551 DGGRID ids mismatch (first {mism[:5]})"
    # and the cell GEOMETRY: our planar-dual rings must reproduce every
    # DGGRID vertex coordinate
    g = IGeo7Grid()
    g.bridge = bridge
    g.flat = bridge.g
    verts = g.boundary(z7)
    worst = 0.0
    for i, (_, blob) in enumerate(rows):
        want = ring(blob)
        have = verts[i][~np.isnan(verts[i, :, 0])][:-1]
        assert len(have) == len(want) == 6
        for v in want:
            d = np.hypot(have[:, 0] - v[0], have[:, 1] - v[1]).min()
            worst = max(worst, d)
    assert worst < 1e-6, f"max vertex deviation {worst:.2e} deg"
