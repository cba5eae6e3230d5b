"""Salt bridges (`models.saltbr`, gmx saltbr) and solvent polarization
(`models.spol`, gmx spol) — surpass features absent from the reference.

Pinned against exactly-constructed charged residues / oriented waters
(including minimum-image cases) and float64 oracles on the charged TPR
fixture.
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.core.simbox import SimBox
from groan_rs_tpu.core.topology import StrColumn, Topology
from groan_rs_tpu.errors import GroupError
from groan_rs_tpu.io import native
from groan_rs_tpu.system import System

pytestmark = pytest.mark.device_parity

TF = "/root/reference/test_files"
BOX = np.array([4.0, 4.0, 4.0], np.float32)


def _write_xtc(tmp_path, frames, box=BOX, name="t.xtc"):
    path = str(tmp_path / name)
    b9 = np.diag(np.asarray(box, np.float32)).reshape(9)
    for fidx, pos in enumerate(frames):
        native.xtc_write_frame(path, pos.shape[0], fidx, float(fidx), b9,
                               np.asarray(pos, np.float32), 100000.0)
    return path


# --------------------------------------------------------------- saltbr

def _charged_system(charges, resnames, box=BOX):
    """One single-atom residue per charge."""
    n = len(charges)
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.arange(n, dtype=np.int64) + 1
    topo.resname = StrColumn(values=np.asarray(resnames))
    topo.atomname = StrColumn(values=np.asarray(["X"] * n))
    topo.charge = np.asarray(charges, np.float64)
    topo.has_charge = np.ones(n, bool)
    topo.mass = np.ones(n, np.float32)
    topo.has_mass = np.ones(n, bool)
    s = System("sb", topo, simbox=SimBox.from_lengths(*map(float, box)),
               positions=np.zeros((n, 3), np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    return s


def test_saltbr_exact_pairs_and_kinds(tmp_path):
    """+1, -1, +1 and a sub-threshold 0.3 residue: three pairs with
    known min-image distances and sign classes; 0.3 never appears."""
    s = _charged_system([1.0, -1.0, 1.0, 0.3],
                        ["ARG", "GLU", "LYS", "SER"])
    frames = np.array([
        [[0.2, 0.2, 0.2], [0.5, 0.2, 0.2], [0.2, 1.2, 0.2],
         [3.0, 3.0, 3.0]],
        # frame 1: GLU crosses the boundary; min-image dist to ARG = 0.2
        [[0.1, 0.2, 0.2], [3.9, 0.2, 0.2], [0.1, 1.7, 0.2],
         [3.0, 3.0, 3.0]],
    ], np.float32)
    path = _write_xtc(tmp_path, frames)
    out = models.saltbr(s, path, "All")

    assert list(out["labels"]) == ["ARG-1", "GLU-2", "LYS-3"]
    assert out["pairs"].tolist() == [[0, 1], [0, 2], [1, 2]]
    assert list(out["kinds"]) == ["+-", "++", "+-"]
    np.testing.assert_allclose(out["charges"], [1.0, -1.0, 1.0])
    want0 = [0.3, 1.0, np.hypot(0.3, 1.0)]
    want1 = [0.2, 1.5, np.hypot(0.2, 1.5)]
    np.testing.assert_allclose(out["dist"][0], want0, atol=2e-4)
    np.testing.assert_allclose(out["dist"][1], want1, atol=2e-4)


def test_saltbr_trunc_filters_pairs(tmp_path):
    s = _charged_system([1.0, -1.0, 1.0], ["ARG", "GLU", "LYS"])
    frames = np.array([[[0.2, 0.2, 0.2], [0.5, 0.2, 0.2],
                        [0.2, 2.0, 0.2]]], np.float32)
    path = _write_xtc(tmp_path, frames)
    out = models.saltbr(s, path, "All", trunc=0.5)
    assert out["pairs"].tolist() == [[0, 1]]
    assert list(out["kinds"]) == ["+-"]
    np.testing.assert_allclose(out["dist"][0], [0.3], atol=2e-4)


def test_saltbr_multiatom_residue_com(tmp_path):
    """A two-atom charged residue: distance is to its mass-weighted COM."""
    n = 3
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.asarray([1, 1, 2], np.int64)
    topo.resname = StrColumn(values=np.asarray(["GLU", "GLU", "NA"]))
    topo.atomname = StrColumn(values=np.asarray(["C1", "C2", "NA"]))
    topo.charge = np.asarray([-0.6, -0.4, 1.0], np.float64)
    topo.has_charge = np.ones(n, bool)
    topo.mass = np.asarray([1.0, 3.0, 1.0], np.float32)
    topo.has_mass = np.ones(n, bool)
    s = System("sb", topo, simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.zeros((n, 3), np.float32))
    s.group_create_from_ranges("All", [(0, n - 1)])
    frames = np.array([[[0.4, 0.4, 0.4], [0.8, 0.4, 0.4],
                        [0.7, 1.4, 0.4]]], np.float32)
    path = _write_xtc(tmp_path, frames)
    out = models.saltbr(s, path, "All")
    # COM of GLU = 0.4 + 0.75 * 0.4 = 0.7 in x -> dy = 1.0 exactly
    np.testing.assert_allclose(out["charges"], [-1.0, 1.0])
    np.testing.assert_allclose(out["dist"][0], [1.0], atol=2e-4)


def test_saltbr_needs_two_charged(tmp_path):
    s = _charged_system([1.0, 0.1, 0.0], ["ARG", "SER", "GLY"])
    with pytest.raises(GroupError):
        models.saltbr(s, "unused.xtc", "All")


def test_saltbr_fixture_oracle():
    """Charged TPR fixture: every pair series matches a float64 COM
    recomputation from reader positions."""
    s = System.from_file(os.path.join(TF, "example.tpr"))
    xtc = os.path.join(TF, "short_trajectory.xtc")
    sel = "resname ION or resname LYS ARG GLU ASP"
    out = models.saltbr(s, xtc, sel, min_charge=0.5)
    assert out["dist"].shape[1] == out["pairs"].shape[0] > 3

    idx = np.flatnonzero(
        __import__("groan_rs_tpu.select.compile", fromlist=["x"])
        .select_to_mask(sel, s))
    topo = s.topology
    resnum = np.asarray(topo.resnum)
    blocks, order = {}, []
    for a in idx:
        key = int(resnum[a])
        if key not in blocks:
            blocks[key] = []
            order.append(key)
        blocks[key].append(int(a))
    qres = np.asarray([topo.charge[blocks[k]].sum() for k in order])
    keep = [k for k, q in zip(order, qres) if abs(q) >= 0.5]
    assert len(keep) == len(out["labels"])

    f = 0
    for _ in s.traj_iter(xtc):
        box = s.simbox.to_lengths_vec().astype(np.float64)
        coms = []
        for k in keep:
            b = np.asarray(blocks[k])
            x = s.positions[b].astype(np.float64)
            rel = x - x[:1]
            rel -= np.round(rel / box) * box
            m = topo.mass[b].astype(np.float64)
            coms.append(x[0] + (m[:, None] * rel).sum(0) / m.sum())
        coms = np.asarray(coms)
        for p, (i, j) in enumerate(out["pairs"]):
            d = coms[i] - coms[j]
            d -= np.round(d / box) * box
            np.testing.assert_allclose(out["dist"][f, p],
                                       np.linalg.norm(d), atol=5e-4)
        f += 1
        if f == 3:
            break


# ----------------------------------------------------------------- spol

_D = 0.09572 * np.cos(np.deg2rad(104.52 / 2.0))
_S = 0.09572 * np.sin(np.deg2rad(104.52 / 2.0))


def _water(o, bisector):
    b = np.asarray(bisector, np.float64)
    b = b / np.linalg.norm(b)
    p = np.cross(b, [1.0, 0.0, 0.0])
    if np.linalg.norm(p) < 1e-6:
        p = np.cross(b, [0.0, 1.0, 0.0])
    p /= np.linalg.norm(p)
    return np.stack([o, o + _D * b + _S * p, o + _D * b - _S * p])


def _spol_system(n_waters, ref_extra=1):
    n = ref_extra + 3 * n_waters
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    resnums = list(range(1, ref_extra + 1))
    names = ["REF"] * ref_extra
    charges = [0.0] * ref_extra
    for w in range(n_waters):
        resnums.extend([ref_extra + w + 1] * 3)
        names.extend(["OW", "HW1", "HW2"])
        charges.extend([-0.834, 0.417, 0.417])
    topo.resnum = np.asarray(resnums, np.int64)
    topo.atomname = StrColumn(values=np.asarray(names))
    topo.resname = StrColumn(
        values=np.asarray(["REF"] * ref_extra
                          + ["SOL"] * (3 * n_waters)))
    topo.charge = np.asarray(charges, np.float64)
    topo.has_charge = np.ones(n, bool)
    topo.mass = np.asarray([1.0] * ref_extra
                           + [15.999, 1.008, 1.008] * n_waters, np.float32)
    topo.has_mass = np.ones(n, bool)
    s = System("spol", topo,
               simbox=SimBox.from_lengths(*map(float, BOX)),
               positions=np.zeros((n, 3), np.float32))
    s.group_create_from_ranges("Ref", [(0, ref_extra - 1)])
    s.group_create_from_ranges("Sol", [(ref_extra, n - 1)])
    return s


def test_spol_exact_orientations(tmp_path):
    """Dipole outward -> cos=+1 bin; inward -> -1; perpendicular -> 0;
    one water beyond rmax is excluded."""
    ref = np.array([2.0, 2.0, 2.0])
    waters = [
        (ref + [0.45, 0, 0], [1.0, 0, 0]),    # outward, r=0.45ish
        (ref + [0, 0.25, 0], [0, -1.0, 0]),   # inward, r=0.25ish
        (ref + [0, 0, 0.85], [0, 0, 1.0]),    # beyond rmax
    ]
    s = _spol_system(3)
    coords = np.concatenate([[ref]] + [_water(o, b) for o, b in waters])
    path = _write_xtc(tmp_path, coords[None])
    out = models.spol(s, path, "Ref", "Sol", rmax=0.6, bins=6)
    assert out["n_selected"] == 2.0
    # COM shifts slightly off the O toward the dipole; bins are 0.1 wide
    counts = out["counts"]
    assert counts[4] == 1.0 and counts[2] == 1.0 and counts.sum() == 2.0
    assert out["mean_cos_r"][4] == pytest.approx(1.0, abs=1e-5)
    assert out["mean_cos_r"][2] == pytest.approx(-1.0, abs=1e-5)
    assert out["mean_cos"] == pytest.approx(0.0, abs=1e-5)


def test_spol_minimum_image(tmp_path):
    """Water across the box boundary: distance and outward direction
    must both be minimum-image."""
    ref = np.array([0.2, 2.0, 2.0])
    # water at x = 3.9: min-image displacement is -0.3 (outward = -x)
    waters = [(np.array([3.9, 2.0, 2.0]), [-1.0, 0, 0])]
    s = _spol_system(1)
    coords = np.concatenate([[ref]] + [_water(o, b) for o, b in waters])
    path = _write_xtc(tmp_path, coords[None])
    out = models.spol(s, path, "Ref", "Sol", rmax=0.6, bins=6)
    assert out["n_selected"] == 1.0
    assert out["counts"][3] == 1.0          # r ~ 0.3 -> bin 3 of 0.1
    assert out["mean_cos"] == pytest.approx(1.0, abs=1e-5)


def test_spol_float64_oracle(tmp_path):
    """Random waters, two frames: mean cos per bin matches a float64
    recomputation."""
    rng = np.random.default_rng(7)
    nw, f = 24, 2
    s = _spol_system(nw)
    frames = []
    for _ in range(f):
        ref = rng.uniform(0.5, 3.5, 3)
        coords = [ref[None]]
        for _ in range(nw):
            o = np.mod(ref + rng.normal(0, 0.4, 3), BOX)
            b = rng.normal(size=3)
            coords.append(_water(o, b / np.linalg.norm(b)))
        frames.append(np.concatenate(coords))
    frames = np.asarray(frames, np.float32)
    path = _write_xtc(tmp_path, frames)
    rmax, bins = 0.8, 8
    out = models.spol(s, path, "Ref", "Sol", rmax=rmax, bins=bins)

    box = BOX.astype(np.float64)
    q = np.array([-0.834, 0.417, 0.417])
    m = np.array([15.999, 1.008, 1.008])
    cs = np.zeros(bins)
    cn = np.zeros(bins)
    for fr in frames.astype(np.float64):
        ref = fr[0]
        for w in range(nw):
            x = fr[1 + 3 * w: 4 + 3 * w]
            rel = x - x[:1]
            rel -= np.round(rel / box) * box
            com_rel = (m[:, None] * rel).sum(0) / m.sum()
            com = x[0] + com_rel
            dip = (q[:, None] * (rel - com_rel)).sum(0)
            rv = com - ref
            rv -= np.round(rv / box) * box
            r = np.linalg.norm(rv)
            if 0 < r <= rmax:
                i = min(int(r / rmax * bins), bins - 1)
                cs[i] += rv @ dip / (r * np.linalg.norm(dip))
                cn[i] += 1
    np.testing.assert_allclose(out["counts"], cn)
    ok = cn > 0
    np.testing.assert_allclose(out["mean_cos_r"][ok], cs[ok] / cn[ok],
                               atol=1e-4)


def test_spol_requires_charges(tmp_path):
    s = _spol_system(1)
    s.topology.has_charge[:] = False
    with pytest.raises(GroupError):
        models.spol(s, "unused.xtc", "Ref", "Sol")
