"""Round-2 de-risk experiment: can the Z7 digit hierarchy be defined on the
projection-exact ISEA7H flat lattice?

Rule under test (see ROUND1_NOTES.md):
  parent(cell) = flat-encode of the cell center at res-1 (exact nearest
  coarse center, cross-face canonical);
  digit(cell)  = Eisenstein-unit rounding of (child - parent) in the
  parent's face-plane res-r axial coordinates (0 for the coincident center
  child).

Success criteria per resolution:
  * every cell gets a digit in 0..6;
  * (parent, digit) pairs are globally unique (bijection);
  * non-corner parents have exactly 7 children, corners (pentagons) 6;
  * pentagon children skip exactly one ring digit (the Z7 digit-2 analog).
"""

import collections
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from dggrid4py_ray.dggs.isea7h_flat import ISEA7HFlatGrid, pack, unpack, _OMEGA, _M7  # noqa: E402

UNIT_DIGIT = {(1, 0): 1, (0, 1): 2, (-1, 1): 3, (-1, 0): 4, (0, -1): 5, (1, -1): 6,
              (0, 0): 0}


def eis_pow(r):
    """Integer product of the per-level substitutions (alternating parity,
    matching isea7h_flat's DGGRID Class I/II lattice)."""
    from dggrid4py_ray.dggs.isea7h_z7bridge import _child_axial
    a, b = 1, 0
    for k in range(1, r + 1):
        a, b = _child_axial(a, b, k)
    return a, b


def enumerate_cells(g, res):
    """All canonical flat cells at `res` (faces x axial triangle, corner dedup)."""
    ea, eb = eis_pow(res)
    # triangle corners in axial: (0,0), E, E*(1-omega)
    # ((c2-c0) = (c1-c0)*conj(omega), and conj(omega) = 1-omega)
    c1 = (ea, eb)
    c2 = (ea + eb, -ea)
    ids = []
    amin = min(0, c1[0], c2[0]) - 1
    amax = max(0, c1[0], c2[0]) + 1
    bmin = min(0, c1[1], c2[1]) - 1
    bmax = max(0, c1[1], c2[1]) + 1
    aa, bb = np.meshgrid(np.arange(amin, amax + 1), np.arange(bmin, bmax + 1),
                         indexing="ij")
    aa = aa.ravel()
    bb = bb.ravel()
    # plane coords and bary (face-local; same for every face)
    x, y = g._plane_of(aa.astype(float), bb.astype(float), res)
    l0, l1, l2 = g._bary(x, y)
    eps = 1e-9
    inside = (l0 >= -eps) & (l1 >= -eps) & (l2 >= -eps)
    aa, bb = aa[inside], bb[inside]
    l0, l1, l2 = l0[inside], l1[inside], l2[inside]
    corner = (np.abs(l0 - 1) < 1e-9) | (np.abs(l1 - 1) < 1e-9) | (np.abs(l2 - 1) < 1e-9)
    all_ids = []
    for f in range(20):
        face = np.full(len(aa), f, dtype=np.int64)
        cf, ca, cb = g._canonical(face, aa.copy(), bb.copy(), l0, l1, l2, res)
        all_ids.append(pack(cf, ca, cb))
    ids = np.unique(np.concatenate(all_ids))
    return ids


def main():
    g = ISEA7HFlatGrid()
    for res in [1, 2, 3, 4]:
        ids = enumerate_cells(g, res)
        expect = ISEA7HFlatGrid.num_cells(res)
        lo, la = g.decode(ids, res)
        parents = g.encode(lo, la, res - 1)
        # digit: project child into parent's face plane
        pf, pa, pb = unpack(parents)
        from dggrid4py_ray.dggs.sphere import lonlat_to_unit
        cpos = lonlat_to_unit(lo, la)
        _, cx, cy = g._forward_on_face(cpos, pf)
        ca, cb = g._axial_of_plane(cx, cy, res)
        # parent's res-r axial = parent_axial * (2 + omega)
        pra = 2 * pa - pb
        prb = pa + 3 * pb
        offa = ca - pra
        offb = cb - prb
        # per-parent angular-rank digit labeling (robust to cross-face
        # projection distortion): center child (offset ~ 0) -> 0; ring
        # children sorted by offset angle, digits assigned in rank order
        # rotated so the child nearest angle 0 gets digit 1; pentagons use
        # digits [1,3,4,5,6] (the Z7 digit-2 skip).
        theta = np.arctan2(offb * np.sqrt(3) / 2.0, offa + offb / 2.0)
        rmag = np.hypot(offa + offb / 2.0, offb * np.sqrt(3) / 2.0)
        digits = np.full(len(ids), -1, dtype=np.int64)
        order = np.argsort(parents, kind="stable")
        sp = parents[order]
        bounds = np.nonzero(np.diff(sp))[0] + 1
        groups = np.split(order, bounds)
        for grp in groups:
            om = rmag[grp]
            center = grp[np.argmin(om)]
            digits[center] = 0
            ring = [g_ for g_ in grp if g_ != center]
            if not ring:
                continue
            th = np.array([theta[g_] for g_ in ring])
            rank = np.argsort(th)
            ring = [ring[r] for r in rank]
            th = th[rank]
            # rotate so the ring child closest to angle 0 is first
            start = int(np.argmin(np.abs(np.angle(np.exp(1j * th)))))
            ring = ring[start:] + ring[:start]
            labels = [1, 2, 3, 4, 5, 6] if len(ring) == 6 else [1, 3, 4, 5, 6]
            for lab, g_ in zip(labels, ring):
                digits[g_] = lab
        bad_digit = (digits < 0).sum()
        pairs = collections.Counter(zip(parents.tolist(), digits.tolist()))
        dup_pairs = sum(1 for v in pairs.values() if v > 1)
        kids = collections.Counter(parents.tolist())
        kid_hist = collections.Counter(kids.values())
        err = np.hypot(offa - np.rint(offa), offb - np.rint(offb))
        print(f"res {res}: cells {len(ids)}/{expect}  bad_digit {bad_digit}  "
              f"dup (parent,digit) {dup_pairs}  child-count hist {dict(kid_hist)}  "
              f"offset-round err p99={np.percentile(err, 99):.3f} max={err.max():.3f}")
        # pentagon digit sets
        pent_digits = collections.Counter()
        corner_parents = set()
        pfu, pau, pbu = unpack(np.unique(parents))
        px, py = g._plane_of(pau.astype(float), pbu.astype(float), res - 1)
        m0, m1, m2 = g._bary(px, py)
        for i, pid in enumerate(np.unique(parents)):
            if (abs(m0[i] - 1) < 1e-9) or (abs(m1[i] - 1) < 1e-9) or (abs(m2[i] - 1) < 1e-9):
                corner_parents.add(int(pid))
        for p, d in zip(parents.tolist(), digits.tolist()):
            if p in corner_parents:
                pent_digits[d] += 1
        print(f"   pentagon parents: {len(corner_parents)} (expect 12), "
              f"their children digits: {dict(sorted(pent_digits.items()))}")


if __name__ == "__main__":
    main()
