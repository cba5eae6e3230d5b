"""Bundle axes (gmx bundle), FRET dye coupling (gmx dyecoupl), and
side-chain chi dihedrals + rotamers (gmx chi) — surpass features absent
from the reference.

Pinned by exact geometric constructions (vertical / radially-tilted /
laterally-tilted bundles, canonical kappa^2 dipole geometries, cis/trans
chi placements), PBC-wrap invariance, and the float64 dihedral oracle.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError, ParallelError
from groan_rs_tpu.ops import geometry
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

BOX = np.array([10.0, 10.0, 10.0], np.float32)


def _system(pos, names=None, resnums=None, resnames=None, masses=None,
            box=None):
    n = pos.shape[0]
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = (np.asarray(resnums, np.int64) if resnums is not None
                   else np.arange(1, n + 1, dtype=np.int64))
    if names is not None:
        topo.atomname = StrColumn(values=np.asarray(names))
    if resnames is not None:
        topo.resname = StrColumn(values=np.asarray(resnames))
    topo.mass = (np.asarray(masses, np.float32) if masses is not None
                 else np.ones(n, np.float32))
    topo.has_mass = np.ones(n, bool)
    b = BOX if box is None else box
    return System("t", topo, simbox=SimBox.from_lengths(*map(float, b)),
                  positions=np.asarray(pos, np.float32))


def _write_xtc(path, frames, box=None):
    from groan_rs_tpu.io import native

    b = BOX if box is None else box
    b9 = np.diag(b).astype(np.float32).reshape(9)
    for i in range(frames.shape[0]):
        native.xtc_write_frame(path, frames.shape[1], i, float(i), b9,
                               frames[i].astype(np.float32), 100000.0)


# ---------------------------------------------------------------- bundle

def _ring_bundle(radius=1.0, z_bot=2.0, z_top=5.0, tilt_out=0.0,
                 tilt_tan=0.0, center=(5.0, 5.0)):
    """4 two-atom axes on a ring; axes tilted radially (tilt_out) or
    tangentially (tilt_tan) with the MIDPOINT kept on the ring (bottom
    displaced by -d/2, top by +d/2), so 'distance' and the radial frame
    stay exact.  Returns [8, 3] axis-interleaved (b0, t0, b1, t1, ...)."""
    pos = []
    for k in range(4):
        ang = np.pi / 2 * k
        r_hat = np.array([np.cos(ang), np.sin(ang), 0.0])
        t_hat = np.array([-np.sin(ang), np.cos(ang), 0.0])
        base = np.array([center[0], center[1], 0.0]) + radius * r_hat
        half = 0.5 * (tilt_out * r_hat + tilt_tan * t_hat)
        bot = base + [0, 0, z_bot] - half
        top = base + [0, 0, z_top] + half
        pos.extend([bot, top])
    return np.asarray(pos)


def _bundle_system(pos):
    n = pos.shape[0]
    return _system(pos, names=["B", "T"] * (n // 2))


def test_bundle_vertical_exact(tmp_path):
    pos = _ring_bundle()
    s = _bundle_system(pos)
    path = str(tmp_path / "b.xtc")
    _write_xtc(path, pos[None])
    bots = [f"serial {2 * k + 1}" for k in range(4)]
    tops = [f"serial {2 * k + 2}" for k in range(4)]
    out = models.bundle(s, path, tops, bots)
    np.testing.assert_allclose(out["length"], 3.0, atol=1e-5)
    np.testing.assert_allclose(out["tilt"], 0.0, atol=1e-3)
    np.testing.assert_allclose(out["distance"], 1.0, atol=1e-5)
    np.testing.assert_allclose(out["zshift"], 0.0, atol=1e-5)
    np.testing.assert_allclose(out["tiltr"], 0.0, atol=1e-3)
    np.testing.assert_allclose(out["tiltl"], 0.0, atol=1e-3)
    np.testing.assert_allclose(out["center"][0], [5.0, 5.0, 3.5], atol=1e-5)
    np.testing.assert_allclose(out["axes"][0, :, 2], 1.0, atol=1e-6)


@pytest.mark.parametrize("mode", ["radial", "lateral"])
def test_bundle_tilt_decomposition(tmp_path, mode):
    d, h = 0.5, 3.0
    kw = {"tilt_out": d} if mode == "radial" else {"tilt_tan": d}
    pos = _ring_bundle(**kw)
    s = _bundle_system(pos)
    path = str(tmp_path / "b.xtc")
    _write_xtc(path, pos[None])
    bots = [f"serial {2 * k + 1}" for k in range(4)]
    tops = [f"serial {2 * k + 2}" for k in range(4)]
    out = models.bundle(s, path, tops, bots)
    length = np.hypot(d, h)
    expect = np.degrees(np.arcsin(d / length))
    np.testing.assert_allclose(out["length"], length, atol=1e-5)
    np.testing.assert_allclose(out["tilt"], expect, atol=1e-3)
    if mode == "radial":
        np.testing.assert_allclose(out["tiltr"], expect, atol=1e-3)
        np.testing.assert_allclose(out["tiltl"], 0.0, atol=1e-3)
    else:
        np.testing.assert_allclose(out["tiltl"], expect, atol=1e-3)
        np.testing.assert_allclose(out["tiltr"], 0.0, atol=1e-3)


def test_bundle_pbc_wrap_invariance(tmp_path):
    pos = _ring_bundle(center=(9.5, 5.0), tilt_out=0.3)
    wrapped = pos.copy()
    wrapped[:, 0] %= BOX[0]
    assert (pos[:, 0] > BOX[0]).any()          # the construction wraps
    outs = []
    for i, p in enumerate((pos, wrapped)):
        s = _bundle_system(p)
        path = str(tmp_path / f"b{i}.xtc")
        _write_xtc(path, p[None])
        bots = [f"serial {2 * k + 1}" for k in range(4)]
        tops = [f"serial {2 * k + 2}" for k in range(4)]
        outs.append(models.bundle(s, path, tops, bots))
    for key in ("length", "distance", "zshift", "tilt", "tiltr", "tiltl"):
        np.testing.assert_allclose(outs[0][key], outs[1][key], atol=1e-4)


def test_bundle_mass_weighted_centers(tmp_path):
    # one axis, two-atom bottom part with masses 1 and 3:
    # COM sits 3/4 of the way to the heavy atom
    pos = np.array([
        [5.0, 5.0, 2.0],    # bottom a (m=1)
        [5.0, 5.0, 2.4],    # bottom b (m=3)  -> COM z = 2.3
        [5.0, 5.0, 5.0],    # top (m=1)
    ])
    s = _system(pos, masses=[1.0, 3.0, 1.0])
    path = str(tmp_path / "b.xtc")
    _write_xtc(path, pos[None])
    out = models.bundle(s, path, ["serial 3"], ["serial 1 2"])
    np.testing.assert_allclose(out["length"][0, 0], 5.0 - 2.3, atol=1e-5)
    cog = models.bundle(s, path, ["serial 3"], ["serial 1 2"],
                        mass_weighted=False)
    np.testing.assert_allclose(cog["length"][0, 0], 5.0 - 2.2, atol=1e-5)


def test_bundle_split_equals_explicit(tmp_path):
    pos = _ring_bundle(tilt_out=0.4)
    # reorder: all bottoms first, then all tops (split order = axis order)
    perm = np.concatenate([np.arange(0, 8, 2), np.arange(1, 8, 2)])
    pos2 = pos[perm]
    s = _bundle_system(pos)
    s2 = _system(pos2, names=["B"] * 4 + ["T"] * 4)
    path = str(tmp_path / "b.xtc")
    path2 = str(tmp_path / "b2.xtc")
    _write_xtc(path, pos[None])
    _write_xtc(path2, pos2[None])
    explicit = models.bundle(
        s, path, [f"serial {2 * k + 2}" for k in range(4)],
        [f"serial {2 * k + 1}" for k in range(4)])
    split = models.bundle(s2, path2, "name T", "name B", n_axes=4)
    for key in ("length", "distance", "tilt", "tiltr", "tiltl"):
        np.testing.assert_allclose(split[key], explicit[key], atol=1e-5)


def test_bundle_errors(tmp_path):
    pos = _ring_bundle()
    s = _bundle_system(pos)
    path = str(tmp_path / "b.xtc")
    _write_xtc(path, pos[None])
    with pytest.raises(ParallelError):
        models.bundle(s, path, "name T", "name B")       # n_axes missing
    with pytest.raises(GroupError):
        models.bundle(s, path, "name T", "name B", n_axes=3)  # 4 % 3
    with pytest.raises(ParallelError):
        models.bundle(s, path, ["name T"], ["serial 1", "serial 3"])


# -------------------------------------------------------------- dyecoupl

def _dye_system(pos):
    return _system(pos, names=["D1", "D2", "A1", "A2"])


@pytest.mark.parametrize("geom,expect_k2", [
    # parallel dipoles, both perpendicular to R  -> kappa = 1
    ("parallel_perp", 1.0),
    # collinear: dipoles along R                 -> kappa = 1 - 3 = -2
    ("collinear", 4.0),
    # crossed perpendicular, both perp to R      -> kappa = 0
    ("crossed", 0.0),
])
def test_dyecoupl_canonical_kappa(tmp_path, geom, expect_k2):
    d = np.array([[5.0, 5.0, 5.0], [5.0, 5.0, 5.4]])       # along z
    if geom == "parallel_perp":
        a = d + [2.0, 0.0, 0.0]
    elif geom == "collinear":
        d = np.array([[4.0, 5.0, 5.0], [4.4, 5.0, 5.0]])   # along x
        a = d + [2.0, 0.0, 0.0]
    else:
        a = np.array([[7.0, 4.8, 5.2], [7.0, 5.2, 5.2]])   # along y
    pos = np.concatenate([d, a])
    s = _dye_system(pos)
    path = str(tmp_path / "d.xtc")
    _write_xtc(path, pos[None])
    out = models.dyecoupl(s, path, "name D1 D2", "name A1 A2")
    np.testing.assert_allclose(out["kappa2"], expect_k2, atol=1e-5)
    np.testing.assert_allclose(out["r"], 2.0, atol=1e-5)


def test_dyecoupl_efficiency_formula(tmp_path):
    d = np.array([[5.0, 5.0, 5.0], [5.0, 5.0, 5.4]])
    a = d + [2.0, 0.0, 0.0]                                # kappa^2 = 1
    pos = np.concatenate([d, a])
    s = _dye_system(pos)
    path = str(tmp_path / "d.xtc")
    _write_xtc(path, pos[None])
    out = models.dyecoupl(s, path, "name D1 D2", "name A1 A2", r0=2.0)
    # R = R0, kappa^2 = 1: E = 1 / (1 + 2/3) = 0.6
    np.testing.assert_allclose(out["efficiency"], 0.6, atol=1e-5)
    far = models.dyecoupl(s, path, "name D1 D2", "name A1 A2", r0=0.2)
    assert far["efficiency"][0] < 1e-4


def test_dyecoupl_pbc_midpoint_distance(tmp_path):
    # donor midpoint near x=9.8, acceptor near x=0.4: R = 0.6 via PBC
    d = np.array([[9.8, 5.0, 4.8], [9.8, 5.0, 5.2]])
    a = np.array([[0.4, 5.0, 4.8], [0.4, 5.0, 5.2]])
    pos = np.concatenate([d, a])
    s = _dye_system(pos)
    path = str(tmp_path / "d.xtc")
    _write_xtc(path, pos[None])
    out = models.dyecoupl(s, path, "name D1 D2", "name A1 A2")
    np.testing.assert_allclose(out["r"], 0.6, atol=1e-5)
    np.testing.assert_allclose(out["kappa2"], 1.0, atol=1e-5)


def test_dyecoupl_errors(tmp_path):
    pos = np.array([[5.0, 5.0, 5.0], [5.0, 5.0, 5.4],
                    [7.0, 5.0, 5.0], [7.0, 5.0, 5.4]])
    s = _dye_system(pos)
    path = str(tmp_path / "d.xtc")
    _write_xtc(path, pos[None])
    with pytest.raises(GroupError):
        models.dyecoupl(s, path, "all", "name A1 A2")
    with pytest.raises(ParallelError):
        models.dyecoupl(s, path, "name D1 D2", "name A1 A2", r0=-1.0)


# ------------------------------------------------------------------- chi

def _residue(chi1_pos, names, resnum, resname="XXX"):
    return chi1_pos, names, [resnum] * len(names), [resname] * len(names)


def _chi_system(frames_d_xy):
    """One residue N/CA/CB/CG; CG's xy position varies per frame to set
    chi1.  Returns (system, frames [F, 4, 3])."""
    base = np.array([
        [6.0, 5.0, 5.0],    # N
        [5.0, 5.0, 5.0],    # CA
        [5.0, 5.0, 6.0],    # CB
        [0.0, 0.0, 6.0],    # CG (xy filled per frame)
    ])
    frames = np.repeat(base[None], len(frames_d_xy), axis=0)
    for i, (dx, dy) in enumerate(frames_d_xy):
        frames[i, 3, 0] = 5.0 + dx
        frames[i, 3, 1] = 5.0 + dy
    s = _system(frames[0], names=["N", "CA", "CB", "CG"],
                resnums=[7, 7, 7, 7], resnames=["LEU"] * 4)
    return s, frames


def test_chi1_cis_trans_exact(tmp_path):
    # CG on the same xy side as N -> chi1 = 0 (cis); opposite -> 180
    s, frames = _chi_system([(1.0, 0.0), (-1.0, 0.0)])
    path = str(tmp_path / "c.xtc")
    _write_xtc(path, frames)
    out = models.chi(s, path, "all", max_chi=1)
    assert out["chi1"].shape == (2, 1)
    np.testing.assert_allclose(out["chi1"][0, 0], 0.0, atol=1e-3)
    np.testing.assert_allclose(np.abs(out["chi1"][1, 0]), 180.0, atol=1e-3)
    assert list(out["chi1_resids"]) == [7]
    assert list(out["chi1_resnames"]) == ["LEU"]


def test_chi1_matches_f64_oracle_and_rotamers(tmp_path):
    rng = np.random.default_rng(3)
    angles = rng.uniform(-np.pi, np.pi, 24)
    s, frames = _chi_system([(np.cos(a), np.sin(a)) for a in angles])
    path = str(tmp_path / "c.xtc")
    _write_xtc(path, frames)
    out = models.chi(s, path, "all", max_chi=1)
    boxes = np.repeat(BOX[None].astype(np.float64), len(angles), axis=0)
    deg = geometry.dihedrals_host_f64(
        frames[:, 0:1].astype(np.float64), frames[:, 1:2].astype(np.float64),
        frames[:, 2:3].astype(np.float64), frames[:, 3:4].astype(np.float64),
        boxes)[:, 0]
    np.testing.assert_allclose(out["chi1"][:, 0], deg, atol=1e-2)
    np.testing.assert_allclose(
        out["rotamers"]["g+"][0], np.mean((deg > 0) & (deg < 120)),
        atol=1e-6)
    np.testing.assert_allclose(
        out["rotamers"]["t"][0], np.mean(np.abs(deg) >= 120), atol=1e-6)
    np.testing.assert_allclose(
        out["rotamers"]["g-"][0], np.mean((deg > -120) & (deg < 0)),
        atol=1e-6)
    total = (out["rotamers"]["g+"] + out["rotamers"]["t"]
             + out["rotamers"]["g-"])
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_chi_alternative_names_and_chi2(tmp_path):
    # SER-style OG for chi1; a second residue with CG+CD gives chi2
    pos = np.array([
        [6.0, 5.0, 5.0], [5.0, 5.0, 5.0], [5.0, 5.0, 6.0],
        [4.0, 5.0, 6.0],                                     # OG (res 1)
        [6.0, 2.0, 5.0], [5.0, 2.0, 5.0], [5.0, 2.0, 6.0],
        [4.0, 2.0, 6.0], [4.0, 2.0, 7.0],                    # CG, CD (res 2)
    ])
    names = ["N", "CA", "CB", "OG", "N", "CA", "CB", "CG", "CD"]
    s = _system(pos, names=names, resnums=[1] * 4 + [2] * 5,
                resnames=["SER"] * 4 + ["LYS"] * 5)
    path = str(tmp_path / "c.xtc")
    _write_xtc(path, pos[None])
    out = models.chi(s, path, "all", max_chi=2)
    assert out["chi1"].shape == (1, 2)        # both residues have chi1
    assert list(out["chi1_resids"]) == [1, 2]
    assert out["chi2"].shape == (1, 1)        # only LYS has chi2
    assert list(out["chi2_resids"]) == [2]
    assert list(out["chi2_resnames"]) == ["LYS"]


def test_chi_errors(tmp_path):
    pos = np.array([[5.0, 5.0, 5.0], [6.0, 5.0, 5.0]])
    s = _system(pos, names=["N", "CA"], resnums=[1, 1])
    path = str(tmp_path / "c.xtc")
    _write_xtc(path, pos[None])
    with pytest.raises(ParallelError):
        models.chi(s, path, "all", max_chi=5)
    with pytest.raises(GroupError):
        models.chi(s, path, "all")            # no chi-capable residue
